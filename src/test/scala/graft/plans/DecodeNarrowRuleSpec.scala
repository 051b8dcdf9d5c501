package graft.plans

import graft.SparkTestSession
import graft.tsdb.Ts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecodeNarrowRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private lazy val chunks = Ts.chunkify(
    spark.read.parquet(s"$dir/events.parquet"),
    Seq("user_id", "event_type"), "ts", "value")

  private def pts = Ts.unpack(chunks, Seq("user_id", "event_type"))

  test("values-only consumption narrows to gorilla_decode_values") {
    // the cents sum is consumed whole by ChunkAggRule now (no explode
    // at all), so the narrowing path is exercised with the
    // order-dependent float sum that rule must NOT touch
    val q = pts.groupBy("user_id").agg(sum("v").as("s"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_decode_values"), s"not narrowed:\n$opt")
    assert(!opt.contains("gorilla_decode("), s"full decode survived:\n$opt")
    // numbers identical to the full-decode path (rule disabled by shape:
    // selecting both sides keeps the struct decode)
    val full = pts.select(col("user_id"), col("ts"), col("v"))
      .groupBy("user_id").agg(sum("v").as("s"))
    assert(q.orderBy("user_id").collect().toSeq ==
      full.orderBy("user_id").collect().toSeq)
  }

  test("cents sum alone is consumed whole by ChunkAggRule (no decode at all)") {
    val q = pts.groupBy("user_id").agg(sum(round(col("v") * 100).cast("long")).as("s"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"), s"expected chunk-agg pushdown:\n$opt")
    assert(!opt.contains("gorilla_decode"), s"decode survived the pushdown:\n$opt")
  }

  test("ts-only consumption narrows to gorilla_decode_ts") {
    // a pure count/min/max aggregate would be consumed whole by
    // ChunkAggRule now; a per-point projection still exercises the
    // narrowing path
    val q = pts.select(col("event_type"), col("ts")).filter(col("ts") % 7 === 0)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_decode_ts"), s"not narrowed:\n$opt")
  }

  test("point filter + single-side projection narrows and stays exact") {
    val q = pts.filter(col("v") >= 100.0).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(round(col("v") * 100).cast("long")).as("s"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_decode_values"), s"not narrowed:\n$opt")
    // ChunkPruneRule still composes: value-stat guards injected below
    assert(opt.contains("max_v"), s"stat guards missing:\n$opt")
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("value").as("v"))
      .filter(col("v") >= 100.0).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(round(col("v") * 100).cast("long")).as("s"))
    assert(q.orderBy("user_id").collect().toSeq ==
      raw.orderBy("user_id").collect().toSeq)
  }

  test("queries touching both sides keep the full struct decode") {
    // max(ts)/max(v) alone would rewrite to chunk partials via
    // ChunkAggRule; the float-sum blocker keeps per-point rows, and
    // with both sides consumed the struct decode must survive
    val q = pts.groupBy("user_id").agg(max("ts").as("m"), sum("v").as("sv"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_decode("), s"full decode should survive:\n$opt")
    assert(!opt.contains("gorilla_decode_values"))
  }
}
