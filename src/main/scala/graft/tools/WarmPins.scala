package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The BASELINE.md warm-adjudication protocol as a tool: 5-rep warm
 * medians for the self-normalizing control keys, the native-histogram
 * family under adjudication, and the WRITE-heavy control op
 * (chunkify + store write of a fixed 10% events slice — write-path
 * drift is not predicted by the read-path keys). Prints one JSON
 * line; run at sf0.1:
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *     sbt "runMain graft.tools.WarmPins"
 */
object WarmPins {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the control keys always run (normalization frame); the keys
    // under adjudication come from args when given (r18: the three
    // r17-flagged sub-second movers), else the r16→r17 defaults
    val controlKeys = Seq(
      "ts_store_anomaly", "ts_store_latest", "ts_store_downsample")
    val adjudicated =
      if (args.nonEmpty) args.toSeq
      else Seq("promql_native_hist_sum", "promql_native_hist_avg",
        "promql_native_hist_count", "promql_hist_count")
    val keys = controlKeys ++ adjudicated
    // warm-up: tables, the persisted stores the keys read, one cold
    // run of each key (Bench's pre-pass discipline)
    try spark.read.parquet(s"$sfDir/events.parquet").count()
    catch { case _: Throwable => () }
    try graft.queries.TsQueries.storeChunks(spark, sfDir).count()
    catch { case _: Throwable => () }
    keys.foreach { k =>
      try graft.SparkEntry.queries(k)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    try graft.Bench.controlWrite(spark, sfDir)
    catch { case _: Throwable => () }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def reps(body: => Unit): Option[Double] = {
      val ts = (1 to 5).flatMap { _ =>
        System.gc()
        val t0 = System.nanoTime()
        try { body; Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      if (ts.size == 5) Some(median(ts)) else None
    }
    def fmt(v: Double): String = (math.round(v * 10000) / 10000.0).toString
    val meds = keys.flatMap { k =>
      reps(graft.SparkEntry.queries(k)(spark, sfDir).count()).map(k -> _)
    } :+ ("store_write" -> reps(graft.Bench.controlWrite(spark, sfDir)).getOrElse(-1.0))
    println(meds.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
