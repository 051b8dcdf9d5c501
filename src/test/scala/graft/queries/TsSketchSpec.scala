package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy properties of the mergeable sketch quantiles (rows-only in
  * the oracle gate: sketch internals are engine-specific). */
class TsSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("sketch quantiles are ordered and sit at the right ranks") {
    val sk = TsQueries.queries("ts_quantiles_sketch")(spark, dir)
      .select("user_id", "event_type", "p50", "p90", "p99")
    assert(sk.filter(col("p50") > col("p90") || col("p90") > col("p99")).count() == 0)

    // rank check against the raw points: the fraction of a series'
    // points at or below the sketch's p50 must average ~0.5
    val pts = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val ranked = pts.join(sk, Seq("user_id", "event_type"))
      .groupBy("user_id", "event_type")
      .agg((sum(when(col("cents") <= col("p50"), 1).otherwise(0)) /
        count(lit(1)).cast("double")).as("frac50"),
        (sum(when(col("cents") <= col("p99"), 1).otherwise(0)) /
          count(lit(1)).cast("double")).as("frac99"))
    val row = ranked.agg(avg(abs(col("frac50") - 0.5)).as("err50"),
      min("frac99").as("min99")).first()
    assert(row.getDouble(0) <= 0.15, s"mean p50 rank error ${row.getDouble(0)}")
    assert(row.getDouble(1) >= 0.9, s"p99 below rank 0.9: ${row.getDouble(1)}")
  }
}
