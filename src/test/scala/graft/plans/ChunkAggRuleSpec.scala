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
    // values identical to the forced explode path (the raw float sum
    // in the aggregate list blocks the rewrite, keeping per-point rows)
    val blocked = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("ts").as("max_ts"),
        min("v").as("min_v"), max("v").as("max_v"), sum("v").as("__s"))
      .drop("__s")
    assert(q.orderBy("user_id").collect().toSeq ==
      blocked.orderBy("user_id").collect().toSeq)
  }

  test("fixed-point sum(cast(round(v*100) as long)) rewrites to sum_fixed partials") {
    val cents = sum(round(col("v") * 100).cast("long")).as("sum_cents")
    val q = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"), cents)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"), s"rule did not fire on cents sum:\n$opt")
    assert(!opt.contains("Generate"), s"explode survived the rewrite:\n$opt")
    val blocked = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"), cents, sum("v").as("__s"))
      .drop("__s")
    assert(q.orderBy("user_id").collect().toSeq ==
      blocked.orderBy("user_id").collect().toSeq)
  }

  test("sum of squared cents rewrites to sumsq_fixed partials (variance pushdown)") {
    val c = round(col("v") * 100).cast("long")
    val q = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(c).as("s"), sum(c * c).as("q"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"), s"rule did not fire on cents² sum:\n$opt")
    assert(!opt.contains("Generate"), s"explode survived the rewrite:\n$opt")
    val blocked = pts.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(c).as("s"), sum(c * c).as("q"),
        sum("v").as("__s"))
      .drop("__s")
    assert(q.orderBy("user_id").collect().toSeq ==
      blocked.orderBy("user_id").collect().toSeq)
    // 3-sigma moments derived from the pushed-down q must equal the
    // stored chunk-header stats — the two independent computations of
    // the same second moment (kernel streaming vs chunkify stat loop)
    val header = chunks.groupBy("user_id")
      .agg(sum("n").as("n"), sum("sum_cents").as("s"), sum("sumsq_cents").as("q"))
    assert(q.orderBy("user_id").collect().toSeq ==
      header.orderBy("user_id").collect().toSeq)
  }

  test("withColumn-derived group key does not crash the rule and stays named") {
    // regression: a bare output attribute resolving to a Project alias
    // used to be substituted by a non-named expression -> CCE at
    // optimization time (and a rename alias silently swapped exprIds)
    val q = pts.withColumn("k", concat(col("user_id"), lit("_"), col("event_type")))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("v").as("max_v"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("gorilla_chunk_agg"), s"rule did not fire on derived key:\n$opt")
    val blocked = pts
      .withColumn("k", concat(col("user_id"), lit("_"), col("event_type")))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("v").as("max_v"),
        sum("v").as("__s"))
      .drop("__s")
    assert(q.orderBy("k").collect().toSeq == blocked.orderBy("k").collect().toSeq)
    // parent operators referencing the aggregate output must still work
    assert(q.filter(col("k").isNotNull).select("k", "n").count() > 0)
  }

  /** Ground-truth explode aggregate: the float sum stays VISIBLE in
    * the output (a dropped column gets pruned away and the rewrite
    * fires after all — which made an earlier version of these tests
    * compare the rewrite against itself); callers strip the last
    * column from the collected rows. */
  private def blockedRows(df: org.apache.spark.sql.DataFrame,
                          aggs: Seq[org.apache.spark.sql.Column]): Seq[Seq[Any]] = {
    val g = df.groupBy("k").agg(aggs.head, aggs.tail :+ sum("v").as("__s"): _*)
    val opt = g.queryExecution.optimizedPlan.toString
    assert(!opt.contains("gorilla_chunk_agg"), s"blocker was pruned:\n$opt")
    g.orderBy("k").collect().toSeq.map(_.toSeq.dropRight(1))
  }

  test("negative-tie cents sums agree with the REAL explode path exactly") {
    import spark.implicits._
    // -0.025*100 lands on an exact -2.5 tie: HALF_UP (Spark round)
    // gives -3; Math.round's floor(x+0.5) would give -2
    val raw = Seq(
      ("a", 7200L, -0.025), ("a", 7260L, 0.025), ("a", 7320L, 3.5),
      ("c", 7200L, -0.005), ("c", 7260L, 0.005), ("c", 7320L, -7.5e-3))
      .toDF("k", "ts", "value")
    val p = Ts.unpack(Ts.chunkify(raw, Seq("k"), "ts", "value"), Seq("k"))
    val aggs = Seq(count(lit(1)).as("n"), min("v").as("min_v"),
      max("v").as("max_v"), sum(round(col("v") * 100).cast("long")).as("sum_cents"))
    val q = p.groupBy("k").agg(aggs.head, aggs.tail: _*)
    assert(q.queryExecution.optimizedPlan.toString.contains("gorilla_chunk_agg"))
    assert(q.orderBy("k").collect().toSeq.map(_.toSeq) == blockedRows(p, aggs))
  }

  test("NaN/Inf chunks: min/max agree with explode; ANSI cents cast throws on BOTH paths") {
    import spark.implicits._
    val raw = Seq(
      ("a", 7200L, -0.025), ("a", 7260L, Double.NaN), ("a", 7320L, 3.5),
      ("b", 7200L, Double.NaN), ("b", 7260L, Double.NaN),
      // +Inf/-Inf mix WITHOUT NaN: sum is NaN but min/max are IEEE —
      // exercises the aggregate's NaN-sum fallback on its no-NaN branch
      ("d", 7200L, Double.PositiveInfinity), ("d", 7260L, Double.NegativeInfinity),
      ("d", 7320L, 1.0))
      .toDF("k", "ts", "value")
    val p = Ts.unpack(Ts.chunkify(raw, Seq("k"), "ts", "value"), Seq("k"))
    val aggs = Seq(count(lit(1)).as("n"), min("v").as("min_v"), max("v").as("max_v"))
    val q = p.groupBy("k").agg(aggs.head, aggs.tail: _*)
    assert(q.queryExecution.optimizedPlan.toString.contains("gorilla_chunk_agg"))
    assert(q.orderBy("k").collect().toSeq.map(_.toSeq).toString ==
      blockedRows(p, aggs).toString)
    // the cents sum under ANSI (this session's default): cast of a
    // NaN/Inf double to long throws — and the rewrite must throw too,
    // not silently return a number the un-rewritten query never would
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val cents = sum(round(col("v") * 100).cast("long")).as("s")
    val qc = p.groupBy("k").agg(cents)
    assert(qc.queryExecution.optimizedPlan.toString.contains("gorilla_chunk_agg"))
    intercept[Exception] { qc.collect() }
    val gc = p.groupBy("k").agg(cents, sum("v").as("__s"))
    assert(!gc.queryExecution.optimizedPlan.toString.contains("gorilla_chunk_agg"))
    intercept[Exception] { gc.collect() }
  }

  test("fuzz: rewrite equals explode on random values across many chunks") {
    import spark.implicits._
    // seeded adversarial mix: ordinary values, exact cent ties of both
    // signs, tiny magnitudes (finite only: NaN/Inf cents casts throw
    // under ANSI and are covered by the dedicated test above) — any
    // divergence between the chunk kernel and Spark's per-point
    // round/cast/min/max semantics shows up as a row mismatch
    val rnd = new scala.util.Random(20260813)
    val special = Array(-0.025, 0.025, 0.005, -0.005, 1e-9, -1e-9, 0.0, -2.5, 2.5)
    val rows = (0 until 4000).map { i =>
      val v = if (rnd.nextInt(20) == 0) special(rnd.nextInt(special.length))
      else math.rint(rnd.nextDouble() * 2e7 - 1e7) / 100 + rnd.nextDouble() * 1e-4
      (s"s${i % 7}", 7200L + i * 13L, v)
    }
    val ch = Ts.chunkify(rows.toDF("k", "ts", "value"), Seq("k"), "ts", "value")
    val p = Ts.unpack(ch, Seq("k"))
    val aggs = Seq(
      count(lit(1)).as("n"), min("ts").as("min_ts"), max("ts").as("max_ts"),
      min("v").as("min_v"), max("v").as("max_v"),
      sum(round(col("v") * 100).cast("long")).as("sum_cents"))
    val q = p.groupBy("k").agg(aggs.head, aggs.tail: _*)
    assert(q.queryExecution.optimizedPlan.toString.contains("gorilla_chunk_agg"))
    assert(q.orderBy("k").collect().toSeq.map(_.toSeq) == blockedRows(p, aggs))
  }

  test("mixed-scale fixed sums block the rewrite") {
    val q = pts.groupBy("user_id").agg(
      sum(round(col("v") * 100).cast("long")).as("cents"),
      sum(round(col("v") * 1000).cast("long")).as("mills"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("gorilla_chunk_agg"),
      s"one chunk kernel cannot carry two fixed scales:\n$opt")
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
