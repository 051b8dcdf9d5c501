package graft.plans

import graft.SparkTestSession
import graft.tsdb.Ts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkAggRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private lazy val chunks = Ts.chunkify(
    spark.read.parquet(s"$dir/events.parquet"),
    Seq("user_id", "event_type"), "ts", "value")

  private def pts = Ts.unpack(chunks, Seq("user_id", "event_type"))

  test("count/min/max over decoded points rewrites to per-chunk partials") {
    val q = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("ts").as("max_ts"),
        min("v").as("min_v"), max("v").as("max_v"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"), s"rule did not fire:\n$opt")
    assert(!opt.contains("Generate"), s"explode survived the rewrite:\n$opt")
    // values identical to the forced explode path (sum(cents) in the
    // aggregate list blocks the rewrite, keeping per-point rows)
    val blocked = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("ts").as("max_ts"),
        min("v").as("min_v"), max("v").as("max_v"),
        sum(round(col("v") * 100).cast("long")).as("__cents"))
      .drop("__cents")
    assert(q.orderBy("user_id").collect().toSeq ==
      blocked.orderBy("user_id").collect().toSeq)
  }

  test("narrowed single-side decode shapes rewrite too") {
    val q = pts.groupBy("event_type").agg(min("v").as("lo"), max("v").as("hi"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"), s"rule did not fire on narrowed shape:\n$opt")
    assert(!opt.contains("Generate"), s"explode survived:\n$opt")
  }

  test("float sum blocks the rewrite (order-dependent aggregate)") {
    val q = pts.groupBy("user_id").agg(sum("v").as("s"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("gorilla_chunk_agg"), s"unsound rewrite of float sum:\n$opt")
  }

  test("grouping by a decoded field blocks the rewrite") {
    val q = pts.groupBy(col("user_id"), (col("ts") % 86400).as("tod"))
      .agg(count(lit(1)).as("n"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("gorilla_chunk_agg"),
      s"per-point grouping cannot come from chunk headers:\n$opt")
  }

  test("per-point filters block the rewrite (header stats cover whole chunks)") {
    val q = pts.filter(col("v") > 50.0).groupBy("user_id").agg(count(lit(1)).as("n"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("gorilla_chunk_agg") ||
      opt.contains("Generate"), s"filtered aggregate must keep point rows:\n$opt")
  }
}
