package graft.tsdb

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One observation of one named series. */
final case class Point(series: String, ts: Long, v: Double)

/** One sealed gorilla chunk of one series window. `sum_cents` is the
  * fixed-point value sum (Σ round(v * [[Ts.FixedScale]])) and
  * `sumsq_cents` its exact second moment (Σ round(v·scale)²). */
final case class Chunk(series: String, window_start: Long, n: Long,
                       min_ts: Long, max_ts: Long, min_v: Double, max_v: Double,
                       sum_cents: Long, sumsq_cents: Long, chunk: Array[Byte])

/**
 * Typed facade over [[Ts]] for the common single-string-key case:
 * case-class `Encoder`s give compile-time schemas while the engine
 * underneath stays the same Catalyst plan.
 */
object TsTyped {

  def chunkify(points: Dataset[Point], windowSec: Long = Ts.WindowSec,
               leadTrail: Boolean = false): Dataset[Chunk] = {
    val spark = points.sparkSession
    import spark.implicits._
    Ts.chunkify(
        points.toDF().withColumn("ts", to_timestamp(col("ts"))),
        Seq("series"), "ts", "v", windowSec, leadTrail)
      .as[Chunk]
  }

  def unpack(chunks: Dataset[Chunk]): Dataset[Point] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    Ts.unpack(chunks.toDF(), Seq("series")).as[Point]
  }

  def rangeQuery(chunks: Dataset[Chunk], fromSec: Long, toSec: Long): Dataset[Point] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    Ts.rangeQuery(chunks.toDF(), Seq("series"), fromSec, toSec).as[Point]
  }

  def latest(chunks: Dataset[Chunk]): Dataset[Point] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    Ts.latest(chunks.toDF(), Seq("series")).as[Point]
  }
}
