package graft.plans

import graft.SparkTestSession
import graft.tsdb.Ts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkPruneRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  val from = 1704844800L
  val to = 1705017600L

  // the realistic shape: chunks read back from a parquet store (the
  // in-memory chunkify lineage prunes stats before the rule can see them)
  private lazy val storePath = {
    val path = java.nio.file.Files.createTempDirectory("graft-prune").toString
    Ts.writeStore(Ts.chunkify(
      spark.read.parquet(s"$dir/events.parquet"),
      Seq("user_id", "event_type"), "ts", "value"), path)
    path
  }
  private def chunks = Ts.readStore(spark, storePath)

  test("ad-hoc ts filter gets chunk-stat pruning injected automatically") {
    // a user writing the naive query — no manual stats filter
    val naive = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .filter(col("ts") >= from && col("ts") <= to)
    val optimized = naive.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_ts") && optimized.contains("min_ts"),
      s"stat guards missing:\n$optimized")
    // results identical to the hand-pruned rangeQuery
    val expected = Ts.rangeQuery(chunks, Seq("user_id", "event_type"), from, to)
      .orderBy("user_id", "event_type", "ts", "v").collect().toSeq
    val got = naive.orderBy("user_id", "event_type", "ts", "v").collect().toSeq
    assert(got == expected)
  }

  test("decoded-value filters prune on (min_v, max_v) stats") {
    val q = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .filter(col("v") > 50.0)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.linesIterator.exists(l =>
      l.trim.matches(".*Filter .*max_v.*50\\.0.*")), optimized)
    val direct = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .collect().count(_.getDouble(3) > 50.0)
    assert(q.count() == direct && direct > 0)
  }

  test("filters without any decoded-field bounds are left untouched") {
    val q = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .filter(col("user_id") < 5)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.linesIterator.exists(l =>
      l.trim.matches(".*Filter .*(max_ts|max_v).*")), optimized)
    assert(q.count() > 0)
  }

  test("one-sided and strict bounds prune correctly") {
    val q = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .filter(col("ts") > to)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_ts"), optimized)
    val direct = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .collect().count(_.getLong(2) > to)
    assert(q.count() == direct)
  }

  test("between on decoded ts prunes (desugared to >= AND <= conjuncts)") {
    val q = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .filter(col("ts").between(from, to))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_ts") && optimized.contains("min_ts"), optimized)
    val expected = Ts.rangeQuery(chunks, Seq("user_id", "event_type"), from, to)
      .orderBy("user_id", "event_type", "ts", "v").collect().toSeq
    assert(q.orderBy("user_id", "event_type", "ts", "v").collect().toSeq == expected)
  }

  test("bare gorilla_decode_ts explode shape prunes on ts stats") {
    val q = chunks
      .select(col("user_id"),
        explode(graft.functions.gorilla_decode_ts(col("chunk"))).as("ts"))
      .filter(col("ts") >= from && col("ts") <= to)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.linesIterator.exists(l =>
      l.trim.matches(".*Filter .*max_ts.*")), optimized)
    val direct = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .collect().count(r => r.getLong(2) >= from && r.getLong(2) <= to)
    assert(q.count() == direct)
  }

  test("bare gorilla_decode_values explode shape prunes on value stats") {
    val q = chunks
      .select(col("user_id"),
        explode(graft.functions.gorilla_decode_values(col("chunk"))).as("v"))
      .filter(col("v") >= 90.0)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.linesIterator.exists(l =>
      l.trim.matches(".*Filter .*max_v.*")), optimized)
    val direct = Ts.unpack(chunks, Seq("user_id", "event_type"))
      .collect().count(_.getDouble(3) >= 90.0)
    assert(q.count() == direct)
  }
}
