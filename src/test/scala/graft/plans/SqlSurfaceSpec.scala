package graft.plans

import graft.SparkTestSession
import graft.tsdb.Ts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The pure-SQL route into the TSDB query paths (r8 verdict "Next
 * round" #5): a SQL-only client registers the chunk store as a view
 * (`Ts.registerStoreView`) and writes naive SQL over the registered
 * `gorilla_*` functions — and the injected optimizer rules rebuild
 * the pruned Scala plans for it:
 *
 *   - ChunkPruneRule turns a decoded-ts WHERE into chunk-stat guards
 *     that reach the parquet scan as pushed filters (ts_range_query's
 *     plan, from a SQL string);
 *   - ChunkAggRule turns a naive decode-explode-aggregate into one
 *     fused `gorilla_chunk_agg` partial per chunk (ts_points_agg's
 *     plan, from a SQL string).
 *
 * Each test pins BOTH the plan shape and row parity with the Scala
 * API path.
 */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  val series = Seq("user_id", "event_type")
  val from = 1704844800L
  val to = 1705017600L

  private lazy val chunks = {
    val c = graft.queries.TsQueries.storeChunks(spark, dir)
    c.createOrReplaceTempView("gorilla_chunks")
    c
  }

  test("SQL range scan gets ChunkPruneRule guards + pushed stat filters") {
    chunks // force view registration
    val df = spark.sql(
      s"""SELECT user_id, event_type, p.ts AS ts, p.v AS v
         |FROM gorilla_chunks
         |LATERAL VIEW explode(gorilla_decode(chunk)) g AS p
         |WHERE p.ts >= $from AND p.ts <= $to""".stripMargin)
    // the rule injected chunk-stat guards below the decode...
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("max_ts") && opt.contains("min_ts"), opt.take(3000))
    // ...and they reached the parquet scan as pushed filters
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("GreaterThanOrEqual(max_ts,"), phys.take(3000))
    // (PushedFilters renders truncated, so pin the min_ts pushdown via
    // the untruncated DataFilters list on the same scan)
    assert(phys.contains(s"(min_ts#") && phys.contains(s"<= $to)"), phys.take(3000))
    // row parity with the Scala path
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = Ts.rangeQuery(chunks, series, from, to).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("naive SQL decode-explode-aggregate rewrites to chunk-agg partials") {
    chunks
    val df = spark.sql(
      """SELECT user_id, event_type, count(*) AS n,
        |  min(p.ts) AS min_ts, max(p.ts) AS max_ts,
        |  min(p.v) AS min_v, max(p.v) AS max_v
        |FROM gorilla_chunks
        |LATERAL VIEW explode(gorilla_decode(chunk)) g AS p
        |GROUP BY user_id, event_type""".stripMargin)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"),
      s"expected the fused per-chunk aggregate in the SQL plan:\n${opt.take(3000)}")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    val want = Ts.unpack(chunks.drop("window_date"), series)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("ts").as("max_ts"),
        min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(got == want)
  }

  test("naive SQL time-bucket GROUP BY rewrites to chunk bucket partials") {
    chunks
    // ts_store_downsample written the way a SQL client would: decode,
    // explode, floor-bucket, aggregate — ChunkBucketAggRule must fold
    // it to per-chunk bucket partials (≤ 8 rows per 2-h chunk, no
    // point rows)
    val df = spark.sql(
      """SELECT user_id, event_type, floor(p.ts / 900) * 900 AS bucket,
        |  count(*) AS n, min(p.v) AS min_v, max(p.v) AS max_v,
        |  CAST(sum(CAST(round(p.v * 100.0D) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM gorilla_chunks
        |LATERAL VIEW explode(gorilla_decode(chunk)) g AS p
        |GROUP BY user_id, event_type, floor(p.ts / 900) * 900""".stripMargin)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_bucket_agg"),
      s"expected the bucket-partial rewrite in the SQL plan:\n${opt.take(3000)}")
    assert(!opt.contains("gorilla_decode"),
      s"no point decode should remain:\n${opt.take(3000)}")
    // row parity with the Scala compressed-domain path
    val got = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
      r.getLong(6))).toSet
    val want = Ts.downsampleCompressed(chunks, series, 900)
      .select(col("user_id"), col("event_type"), col("bucket"), col("n"),
        col("min_v"), col("max_v"), col("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("label-selector SQL: matchers push to the scan, aggregate folds to chunk partials") {
    // a SQL-only client's PromQL-ish query over the LABELED store:
    // WHERE carries the selector, the aggregate is the naive
    // decode-explode — label equality/prefix predicates must reach
    // the parquet scan and the aggregate must fold per-chunk
    val lbl = graft.queries.TsQueries.labeledStoreChunks(spark, dir)
    lbl.createOrReplaceTempView("lbl_chunks")
    val df = spark.sql(
      """SELECT type, host, region, count(*) AS n,
        |  min(p.v) AS min_v, max(p.v) AS max_v
        |FROM lbl_chunks
        |LATERAL VIEW explode(gorilla_decode(chunk)) g AS p
        |WHERE type = 'click' AND host LIKE 'h1%' AND region != 'r3'
        |GROUP BY type, host, region""".stripMargin)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("EqualTo(type,click)"), phys.take(3000))
    assert(phys.contains("StringStartsWith(host") ||
      phys.contains("StartsWith(host"), phys.take(3000))
    assert(df.queryExecution.optimizedPlan.toString.contains("gorilla_chunk_agg"),
      df.queryExecution.optimizedPlan.toString.take(3000))
    // parity with the Scala label path over the same store
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    val want = Ts.unpack(
        graft.tsdb.Labels.select(lbl, graft.queries.TsQueries.labelCols,
          """{type="click", host=~"h1.*", region!="r3"}""")
          .drop("window_date"),
        graft.queries.TsQueries.labelCols)
      .groupBy("type", "host", "region")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("registerStoreView: a path string is all a SQL client needs") {
    chunks // store exists now
    // re-register through the public helper and query it
    val path = graft.queries.TsQueries.storePathFor(dir)
    Ts.registerStoreView(spark, path, "g2", from, to)
    val n = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT explode(gorilla_decode(chunk)) AS p FROM g2
         |) WHERE p.ts >= $from AND p.ts <= $to""".stripMargin)
      .collect()(0).getLong(0)
    val want = Ts.rangeQuery(chunks, series, from, to).count()
    assert(n == want)
  }
}
