package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational/analytical layer over the TPC-H-ish tables — the query
 * language of the engine (scan → filter → join → aggregate → window →
 * pivot), all declarative so Catalyst pushes filters/prunes columns and
 * AQE picks join strategies; dimension tables broadcast automatically.
 *
 * Money math is done on exact integer grids (cents, discount/tax in
 * whole percent) so results hash-match DuckDB bit-for-bit; averages are
 * derived from the exact integers by a single deterministic division.
 */
object RelQueries {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1: pricing summary report (map-side partial aggregation)
    "q1_agg" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02 00:00:00")))
        .withColumn("price_c", cents(col("l_extendedprice")))
        .withColumn("disc_p", cents(col("l_discount")))
        .withColumn("tax_p", cents(col("l_tax")))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(col("price_c")).as("sum_base_c"),
          sum(col("price_c") * (lit(100) - col("disc_p"))).as("sum_disc_e4"),
          sum(col("price_c") * (lit(100) - col("disc_p")) * (lit(100) + col("tax_p")))
            .as("sum_charge_e6"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty", col("sum_qty") / col("n"))
        .withColumn("avg_price", col("sum_base_c") / (col("n") * 100.0))
        .withColumn("avg_disc", col("sum_disc_e4") / col("sum_base_c") / 100.0)
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // TPC-H Q3: top-10 unshipped-revenue orders for one segment
    "q3_topk" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1997-06-01 00:00:00")))
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1997-06-01 00:00:00")))
      // group on the raw timestamp and format AFTER the top-10:
      // l_orderkey determines o_orderdate, so the grouping is 1:1 with
      // the formatted-string key, but the per-row date_format (a
      // timezone-aware string render on every joined row) collapses to
      // 10 calls, and the aggregate hashes a long instead of a string
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"), col("revenue_e4"))
    }),
    // TPC-H Q5: revenue by nation for one region, local suppliers only
    "q5_join" -> ((s, dir) => {
      val r = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("n_name"))
    }),
    // explicit GROUPING SETS (beyond rollup/cube): two independent
    // one-dimension totals + grand total in ONE pass over orders;
    // grouping_id disambiguates aggregation level (bit-compatible
    // with DuckDB's GROUPING()), and sort keys coalesce nulls so both
    // engines order identically
    "q_grouping_sets" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .select("gid", "o_orderstatus", "o_orderpriority", "n", "total_cents")
        .orderBy(col("gid"), coalesce(col("o_orderstatus"), lit("")),
          coalesce(col("o_orderpriority"), lit("")))),
    // salted skew join: scatter each fact key across S (key, salt)
    // shuffle cells and replicate the dimension S ways, so no single
    // reducer owns a hot key's whole row set — the join shape that
    // survives power-law keys at 100 TB (AQE skew-split handles
    // moderate skew; salting is the explicit fix for extreme keys).
    // Two-stage aggregation (partial per salt, then final) reassembles
    // exact totals; the result equals the unsalted join (the oracle).
    "q_skew_join" -> ((s, dir) => {
      val S = 8
      // PIN the join partitioning: a shuffle-hash build map cannot
      // spill, and AQE's size-based coalescing would merge the
      // (compresses-small) replicated build side into a handful of
      // partitions — each map growing ×8-coalesced until it throws
      // "not enough memory to build hash map" (measured at 2M-order
      // scale). An explicit repartition on the join keys is exempt
      // from AQE coalescing and scales with the session's shuffle
      // parallelism, keeping every build map at |orders|·2/parts rows
      // — bounded and small at any corpus size (2× the configured
      // parallelism: enough headroom for the ×S replication without
      // drowning small runs in task-scheduling overhead)
      val parts = 2 * s.sessionState.conf.numShufflePartitions
      val l = Tables(s, dir, "lineitem")
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S)).cast("int"))
        .repartition(parts, col("l_orderkey"), col("salt"))
      // shuffle_hash hint: at test SF the replicated dimension would
      // broadcast, which has no shuffle to de-skew and would make the
      // salt a no-op — force the shuffle join this operator exists for
      // (at 100 TB a replicated big dimension never broadcasts anyway)
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(sequence(lit(0), lit(S - 1))).as("salt"))
        .repartition(parts, col("o_orderkey"), col("salt"))
        .hint("shuffle_hash")
      l.join(o, l("l_orderkey") === o("o_orderkey") && l("salt") === o("salt"))
        .groupBy(col("o_orderpriority"), l("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            .as("prev"))
        .groupBy("o_orderpriority")
        .agg(sum("pn").as("n"), sum("prev").as("revenue_e4"))
        .orderBy("o_orderpriority")
    }),
    // TPC-H Q6: forecast revenue change (tight filter, pushdown-friendly)
    "q6_filter" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .as("revenue_e4"), count(lit(1)).as("n"))),
    // window rank: top-2 orders per customer by value
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_c"))
        .orderBy("o_custkey", "rk")
    }),
    // RANGE-frame window: each order's count/total of the same
    // customer's orders within ±5 days by VALUE distance (peers at the
    // same day all included — the frame the ROWS form can't express)
    "q_window_range" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        // floor, not truncate-toward-zero: the DuckDB oracle's `//` floors,
        // and the two only agree for non-negative epochs — a pre-1970
        // orderdate would silently land in the wrong day bucket otherwise
        .withColumn("day", floor(col("o_orderdate").cast("timestamp").cast("long") / 86400).cast("long"))
        .withColumn("price_c", cents(col("o_totalprice")))
      val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-5, 5)
      o.withColumn("win_n", count(lit(1)).over(w))
        .withColumn("win_sum_c", sum("price_c").over(w))
        .select("o_custkey", "o_orderkey", "day", "price_c", "win_n", "win_sum_c")
        .orderBy("o_custkey", "o_orderkey")
    }),
    // hierarchical totals: ROLLUP over (returnflag, linestatus)
    "q_rollup" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .withColumn("price_c", cents(col("l_extendedprice")))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("price_c").as("sum_base_c"),
          grouping_id().as("lvl"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),
    // multidimensional totals: CUBE over (status, priority) — all four
    // grouping-set combinations in one pass with partial aggregation
    "q_cube" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .withColumn("price_c", cents(col("o_totalprice")))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("price_c").as("sum_c"),
          grouping_id().as("lvl"))
        .orderBy(col("lvl"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),
    // co-located join: orders and lineitem pre-bucketed (+ sorted) on
    // the order key join WITHOUT a shuffle or sort — at 100 TB this
    // removes the biggest exchange in the layer (shuffle-free-ness is
    // plan-asserted in RelQueriesSpec; this gate entry proves the
    // bucketed layout returns the same answers)
    "q_bucket_join" -> ((s, dir) => {
      // ONE bucket count for both sides, derived from the larger table
      // (lineitem): independently size-derived counts would diverge
      // once the tables land on different ~64MB multiples, and the
      // shuffle-free co-located join would silently regain an exchange
      val nb = math.max(Tables.defaultBuckets(dir, "lineitem"),
        Tables.defaultBuckets(dir, "orders"))
      val o = Tables.bucketed(s, dir, "orders", "o_orderkey", nb)
      val l = Tables.bucketed(s, dir, "lineitem", "l_orderkey", nb)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"))
        .orderBy("o_orderstatus")
    }),
    // correlated-subquery shape, decorrelated: orders above their own
    // customer's average order value. The per-customer moments come
    // from ONE whole-partition window pass (the groupBy + join-back
    // this replaces scanned the fact table twice); the comparison
    // price > avg runs as price*cnt > sum on exact integers
    "q_correlated" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
      Tables(s, dir, "orders")
        .withColumn("price_c", cents(col("o_totalprice")))
        .withColumn("s", sum("price_c").over(w))
        .withColumn("cn", count(lit(1)).over(w))
        .filter(col("price_c") * col("cn") > col("s"))
        .select(col("o_custkey"), col("o_orderkey"), col("price_c"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    // correlated EXISTS with aggregate (TPC-H Q4 shape): orders in one
    // quarter that had a late line (shipped > 30 days after order),
    // counted by priority. The EXISTS decorrelates to a LEFT SEMI hash
    // join on the order key with the non-equi lateness predicate as a
    // residual condition — the probe side never duplicates orders
    // however many late lines match, and the aggregate runs over
    // order-grain rows (map-side partials over 5 priorities)
    "q_exists_agg" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1998-07-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1998-10-01 00:00:00")))
      val l = Tables(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late"))
        .orderBy("o_orderpriority")
    }),
    // min-per-group join-tree selection (TPC-H Q2 shape): for each
    // small part, the ASIA supplier offers achieving the minimum unit
    // price. The min comes from ONE key-grained aggregate over the
    // region-filtered offer set, joined back on (part, exact-cents
    // price) equality — the classic decorrelated scalar-subquery plan;
    // dimension joins (supplier→nation→region, part) all broadcast,
    // and restricting offers to the filtered parts up front is
    // min-preserving (per-part min doesn't change when other parts
    // drop), so the aggregate is output-sized, not lineitem-sized
    "q_min_per_group" -> ((s, dir) => {
      val smallParts = Tables(s, dir, "part").filter(col("p_size") <= 5)
        .select("p_partkey", "p_name")
      val supAsia = Tables(s, dir, "supplier")
        .join(Tables(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(Tables(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
      val off = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice")).as("price_c"))
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .join(supAsia, col("l_suppkey") === col("s_suppkey"))
      val m = off.groupBy(col("l_partkey").as("m_partkey"))
        .agg(min("price_c").as("min_price_c"))
      off.join(m, col("l_partkey") === col("m_partkey") &&
          col("price_c") === col("min_price_c"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("min_price_c"))
        .distinct()
        .orderBy("p_partkey", "s_name")
    }),
    // semi join: customers WITH at least one recent order (dual of the
    // anti join; no order columns materialize past the join)
    "q_semijoin" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-06-01 00:00:00")))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),
    // anti join: customers with no order since 2000-06-01
    "q_antijoin" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-06-01 00:00:00")))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),
    // latest-row-per-key (the QUALIFY pattern): each customer's most
    // recent order — rank window partitioned by the key, so partials
    // stay per-customer-sized (no whole-table window)
    "q_latest_per_key" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderstatus"))
        .orderBy("o_custkey")
    }),
    // wide->long reshape: the unpivot dual of q_events_pivot (metric
    // name becomes a column, codegen'd Expand — 3 rows out per agg row,
    // no join/shuffle beyond the agg itself); integer metrics so the
    // reshaped value column stays hash-exact
    "q_unpivot" -> ((s, dir) => {
      val agg = Tables(s, dir, "lineitem")
        .withColumn("price_c", cents(col("l_extendedprice")))
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(col("price_c")).as("sum_base_c"),
          count(lit(1)).as("n"))
      agg.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_c"), col("n")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    }),
    // set operators: INTERSECT/EXCEPT are first-class Catalyst plans
    // (hash-aggregate + join under AQE, never row-loop comparison);
    // buyers active in both 1998 and 2000, and 1998-only churners
    "q_intersect" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      yr(1998).intersect(yr(2000)).orderBy("o_custkey")
    }),
    "q_except" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      yr(1998).except(yr(2000)).orderBy("o_custkey")
    }),
    // interval join with NO equi-key: lineitems shipped inside sampled
    // 7-day audit windows. Naive Spark plans this BETWEEN-only join as
    // a nested loop / cartesian; RangeJoin buckets both sides on a
    // 7-day grid and equi-joins (plan-asserted no cartesian, no BNLJ
    // in RelQueriesSpec) — O(points + intervals) shuffle at any scale
    "q_range_join" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .select(col("l_quantity"),
          col("l_shipdate").cast("timestamp").cast("long").as("ship_sec"))
      val iv = Tables(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(997)) === 0)
        .select(col("o_orderkey").as("audit_key"),
          col("o_orderdate").cast("timestamp").cast("long").as("lo"),
          (col("o_orderdate").cast("timestamp").cast("long") + lit(7L * 86400)).as("hi"))
      graft.ops.RangeJoin.bucketed(l, "ship_sec", iv, "lo", "hi", 7L * 86400)
        .groupBy("audit_key")
        .agg(count(lit(1)).as("n_ship"), sum("l_quantity").as("sum_qty"))
        .orderBy("audit_key")
    }),
    // sketch aggregates: HLL distinct users per event type (approx,
    // mergeable across partitions — the 100TB distinct-count path);
    // rows-only, accuracy pinned vs exact counts in RelQueriesSpec
    "q_hll_distinct" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          approx_count_distinct(col("user_id")).as("approx_users"),
          expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("hll_users"))
        .orderBy("event_type")),
    // semi-structured columns: JSON property extraction + aggregation
    "q_json" -> ((s, dir) =>
      Tables(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
          sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),
    // dynamic-column pivot: events per user by type
    "q_events_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_range_join" ->
      """WITH iv AS (SELECT o_orderkey AS audit_key,
        |  CAST(epoch_ns(o_orderdate) // 1000000000 AS BIGINT) AS lo,
        |  CAST(epoch_ns(o_orderdate) // 1000000000 AS BIGINT) + 7*86400 AS hi
        |FROM orders WHERE o_orderkey % 997 = 0)
        |SELECT audit_key, count(*) AS n_ship,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN iv
        |  ON CAST(epoch_ns(l.l_shipdate) // 1000000000 AS BIGINT)
        |     BETWEEN iv.lo AND iv.hi
        |GROUP BY audit_key ORDER BY audit_key""".stripMargin,
    "q1_agg" ->
      """WITH l AS (
        |  SELECT *, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc_p,
        |    CAST(round(l_tax * 100) AS BIGINT) AS tax_p
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(price_c) AS BIGINT) AS sum_base_c,
        |  CAST(sum(price_c * (100 - disc_p)) AS BIGINT) AS sum_disc_e4,
        |  CAST(sum(price_c * (100 - disc_p) * (100 + tax_p)) AS BIGINT) AS sum_charge_e6,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(price_c) AS BIGINT) / (count(*) * 100.0) AS avg_price,
        |  CAST(sum(price_c * (100 - disc_p)) AS BIGINT) / CAST(CAST(sum(price_c) AS BIGINT) AS DOUBLE) / 100.0 AS avg_disc
        |FROM l GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_date, o_orderpriority
        |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue_e4 DESC, n_name""".stripMargin,
    "q_grouping_sets" ->
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, coalesce(o_orderstatus, ''), coalesce(o_orderpriority, '')""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_filter" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, rk, o_orderkey, total_c FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_range" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  CAST(epoch_ns(o_orderdate) // 1000000000 AS BIGINT) // 86400 AS day,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders)
        |SELECT o_custkey, o_orderkey, day, price_c,
        |  count(*) OVER w AS win_n,
        |  CAST(sum(price_c) OVER w AS BIGINT) AS win_sum_c
        |FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS lvl
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c,
        |  grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS lvl
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY lvl, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_bucket_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_correlated" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders),
        |st AS (SELECT o_custkey, CAST(sum(price_c) AS BIGINT) AS s,
        |  count(*) AS cn FROM o GROUP BY 1)
        |SELECT o.o_custkey, o.o_orderkey, o.price_c
        |FROM o JOIN st USING (o_custkey)
        |WHERE o.price_c * st.cn > st.s
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_semijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_exists_agg" ->
      """SELECT o_orderpriority, count(*) AS n_late
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1998-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_min_per_group" ->
      """WITH off AS (
        |  SELECT l_partkey, p_partkey, p_name, s_name, n_name,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_size <= 5
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
        |m AS (SELECT l_partkey AS m_partkey, min(price_c) AS min_price_c
        |      FROM off GROUP BY 1)
        |SELECT DISTINCT p_partkey, p_name, s_name, n_name, min_price_c
        |FROM off JOIN m ON l_partkey = m_partkey AND price_c = min_price_c
        |ORDER BY p_partkey, s_name""".stripMargin,
    "q_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_latest_per_key" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderstatus
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_base_c,
        |  count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value
        |FROM (UNPIVOT a ON sum_qty, sum_base_c, n INTO NAME metric VALUE value)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        |ORDER BY o_custkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        |ORDER BY o_custkey""".stripMargin,
    "q_json" ->
      """SELECT event_type, count(*) AS n,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
