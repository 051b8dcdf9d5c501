package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: these encode the 100-TB story — dims broadcast,
  * filters reach the parquet scan, aggregates keep partial (map-side)
  * phases. Data correctness is covered by the DuckDB oracle gate. */
class RelQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = RelQueries.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q6 filters are pushed to the parquet scan") {
    val p = planOf("q6_filter")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
    assert(p.contains("l_quantity"), "quantity filter should appear in scan")
  }

  test("q3/q5 join small dimensions via broadcast") {
    assert(planOf("q3_topk").contains("BroadcastHashJoin"))
    assert(planOf("q5_join").contains("BroadcastHashJoin"))
  }

  test("q1 keeps partial aggregation (map-side combine)") {
    val p = planOf("q1_agg")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(2000))
  }

  test("scan prunes columns: q6 reads only needed lineitem columns") {
    val p = planOf("q6_filter")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_extendedprice"), readSchema)
  }

  test("range join buckets to an equi-join: no cartesian, no nested loop") {
    val p = planOf("q_range_join")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // pair set equals the naive theta join (the shape we refuse to plan)
    import org.apache.spark.sql.functions._
    val l = graft.queries.Tables(spark, dir, "lineitem")
      .select(col("l_quantity"), col("l_shipdate").cast("timestamp").cast("long").as("ship_sec"))
    val iv = graft.queries.Tables(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(997)) === 0)
      .select(col("o_orderkey").as("audit_key"),
        col("o_orderdate").cast("timestamp").cast("long").as("lo"),
        (col("o_orderdate").cast("timestamp").cast("long") + lit(7L * 86400)).as("hi"))
    val naive = l.join(iv, col("ship_sec") >= col("lo") && col("ship_sec") <= col("hi"))
      .groupBy("audit_key").agg(count(lit(1)).as("n_ship"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bucketed = RelQueries.queries("q_range_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bucketed == naive)
    assert(bucketed.nonEmpty, "audit windows should catch shipments")
    // intervals spanning a bucket boundary must still match exactly
    // once (a point lives in ONE bucket — no dedup stage to hide it)
    import spark.implicits._
    val pts = Seq((5L, "a"), (13L, "b"), (21L, "c")).toDF("p", "tag")
    val ivs = Seq((4L, 14L, "w1"), (10L, 30L, "w2")).toDF("lo", "hi", "name")
    val got = graft.ops.RangeJoin.bucketed(pts, "p", ivs, "lo", "hi", 10L)
      .select("tag", "name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "w1"), ("b", "w1"), ("b", "w2"), ("c", "w2")))
  }

  test("hll distinct estimates stay within 5% of exact") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = RelQueries.queries("q_hll_distinct")(spark, dir).collect()
    approx.foreach { r =>
      val e = exact(r.getString(0)).toDouble
      assert(math.abs(r.getLong(2) - e) / e <= 0.05, s"approx_count_distinct off for $r")
      assert(math.abs(r.getLong(3) - e) / e <= 0.05, s"hll_sketch off for $r")
    }
  }

  test("bucketed tables merge-join with no shuffle and no sort, at two widths") {
    // the invariant must hold at any agreed bucket count, not just the
    // former hardcoded 8 — exercise the size-derived default AND an
    // explicit width in the same session (the catalog name carries the
    // count, so both coexist)
    for (nb <- Seq(0, 16)) {
      val o = Tables.bucketed(spark, dir, "orders", "o_orderkey", nb)
      val l = Tables.bucketed(spark, dir, "lineitem", "l_orderkey", nb)
      // force the merge join (tiny test data would otherwise broadcast)
      // and read the pre-AQE plan: bucketed+sorted scans must satisfy
      // the join's distribution AND ordering requirements directly
      val j = l.hint("merge")
        .join(o, org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("o_orderstatus").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val plan = j.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("hashpartitioning(l_orderkey") &&
        !plan.contains("hashpartitioning(o_orderkey"),
        s"join key shuffle present at nb=$nb:\n${plan.take(1500)}")
      assert(!plan.contains("- Sort "), s"sort crept back at nb=$nb:\n${plan.take(1500)}")
    }
    // one data file per bucket: the invariant that lets the scan honor
    // sortBy (multi-file buckets force a sort back into the plan)
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val files = new java.io.File(s"/tmp/graft_bucketed/$dirTag/orders_16")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 16, s"expected 16 bucket files, got ${files.length}")
  }

  test("skew join shuffles on (key, salt) — not broadcast, salt in the join keys") {
    val df = RelQueries.queries("q_skew_join")(spark, dir)
    // sparkPlan (pre-exchange-insertion) carries the join node; the
    // salt must be IN the join keys for the shuffle to scatter on it
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast would make the salt a no-op:\n${plan.take(1200)}")
    val joinLine = plan.linesIterator
      .find(_.contains("ShuffledHashJoin")).getOrElse("")
    assert(joinLine.contains("l_orderkey") && joinLine.contains("salt"),
      s"join must key on (l_orderkey, salt): $joinLine")
  }

  test("salted skew join equals the unsalted join exactly") {
    import org.apache.spark.sql.functions._
    val salted = RelQueries.queries("q_skew_join")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val plain = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long"))).as("revenue_e4"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(salted == plain)
  }

  test("q_exists_agg decorrelates EXISTS to one semi join, no row amplification") {
    val p = planOf("q_exists_agg")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("q_min_per_group broadcasts every dimension of the Q2-shape join tree") {
    val p = planOf("q_min_per_group")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the min-join-back must agree with an independent per-group min
    import org.apache.spark.sql.functions._
    val got = RelQueries.queries("q_min_per_group")(spark, dir)
    val byPart = got.groupBy("p_partkey")
      .agg(countDistinct("min_price_c").as("nprices")).collect()
    assert(byPart.forall(_.getLong(1) == 1L),
      "every part must surface exactly one (minimum) price")
  }

  test("relational queries return rows on sf0.001") {
    for ((name, q) <- RelQueries.queries) {
      assert(q(spark, dir).count() > 0, s"$name returned no rows")
    }
  }
}
