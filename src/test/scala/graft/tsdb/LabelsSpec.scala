package graft.tsdb

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Label-selector model: parser, matcher semantics (incl. PromQL's
  * absent-label rules through the map fallback), and the scale pin —
  * selector predicates PUSH to the labeled chunk store's parquet scan
  * (equality + regex literal prefix), with window_date partition
  * pruning composing on top. */
class LabelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("parser: all four matcher ops, braces, escapes, whitespace") {
    assert(Labels.parse("""{a="x", b!="y",c=~"re.*" , d!~"r\"e"}""") == Seq(
      Labels.Eq("a", "x"), Labels.Ne("b", "y"),
      Labels.Re("c", "re.*"), Labels.NotRe("d", "r\"e")))
    assert(Labels.parse("  ") == Seq.empty)
    assert(Labels.parse("""host_1=~"h\\d+"""") ==
      Seq(Labels.Re("host_1", "h\\d+")))
    intercept[IllegalArgumentException](Labels.parse("""a=x"""))
    intercept[IllegalArgumentException](Labels.parse("""a=="x""""))
    intercept[IllegalArgumentException](Labels.parse("""a="x" b="y""""))
  }

  test("parser round-trips rendered matcher lists (seeded fuzz incl. escapes)") {
    val rnd = new scala.util.Random(4242)
    def render(m: Labels.Matcher): String = {
      def q(v: String) = "\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
      } + "\""
      m match {
        case Labels.Eq(l, v) => s"$l=${q(v)}"
        case Labels.Ne(l, v) => s"$l!=${q(v)}"
        case Labels.Re(l, p) => s"$l=~${q(p)}"
        case Labels.NotRe(l, p) => s"$l!~${q(p)}"
      }
    }
    val valueChars = "abcXYZ019_.*[]()\\\"{}|,=~! "
    for (_ <- 1 to 200) {
      val ms = Seq.fill(1 + rnd.nextInt(4)) {
        val label = "l" + rnd.nextInt(10) + (if (rnd.nextBoolean()) "_x" else "")
        val value = Seq.fill(rnd.nextInt(8))(
          valueChars(rnd.nextInt(valueChars.length))).mkString
        rnd.nextInt(4) match {
          case 0 => Labels.Eq(label, value)
          case 1 => Labels.Ne(label, value)
          case 2 => Labels.Re(label, value)
          case _ => Labels.NotRe(label, value)
        }
      }
      val sel = (if (rnd.nextBoolean()) "{%s}" else "%s")
        .format(ms.map(render).mkString(if (rnd.nextBoolean()) ", " else ","))
      assert(Labels.parse(sel) == ms, s"round-trip failed for <$sel>")
    }
  }

  test("literal-prefix extraction: prefix+.* only, metacharacters refuse") {
    assert(Labels.literalPrefix("h1.*").contains("h1"))
    assert(Labels.literalPrefix("api.*").contains("api"))
    assert(Labels.literalPrefix("h[01].*").isEmpty)
    assert(Labels.literalPrefix("h1.+").isEmpty)
    assert(Labels.literalPrefix("h.1.*").isEmpty)
  }

  test("matcher semantics on map-only labels follow PromQL absent-label rules") {
    import spark.implicits._
    val df = Seq(
      (1L, Map("job" -> "api", "env" -> "prod")),
      (2L, Map("job" -> "web")), // env absent
      (3L, Map("job" -> "apiserver", "env" -> "dev"))
    ).toDF("id", "labels")
    def ids(sel: String): Set[Long] =
      Labels.select(df, sel).select("id").collect().map(_.getLong(0)).toSet
    assert(ids("""env="prod"""") == Set(1L))
    // absent label: != and !~ MATCH (PromQL), = and =~ don't
    assert(ids("""env!="prod"""") == Set(2L, 3L))
    assert(ids("""env=~"p.*"""") == Set(1L))
    assert(ids("""env!~"p.*"""") == Set(2L, 3L))
    // PromQL absent ≡ "": {env!=""} means "env present and non-empty"
    // — it must NOT match the series lacking env
    assert(ids("""env!=""""") == Set(1L, 3L))
    assert(ids("""env=""""") == Set(2L))
    assert(ids("""env=~".*"""") == Set(1L, 2L, 3L))
    assert(ids("""env!~".*"""") == Set.empty)
    // regex is fully anchored: "api" must not match "apiserver"
    assert(ids("""job=~"api"""") == Set(1L))
    assert(ids("""job=~"api.*"""") == Set(1L, 3L))
    // conjunction
    assert(ids("""job=~"api.*", env!="dev"""") == Set(1L))
  }

  test("selector predicates push to the labeled store scan; dates prune") {
    val from = 1704844800L; val to = 1705017600L
    val chunks = graft.queries.TsQueries.labeledStoreChunks(spark, dir, from, to)
    val sel = Labels.select(chunks, """{type="click", host=~"h1.*", region!="r3"}""")
    val plan = sel.queryExecution.executedPlan.toString
    // equality matcher reaches the parquet scan as a pushed filter
    assert(plan.contains("EqualTo(type,click)"), plan.take(3000))
    // the regex literal prefix becomes a StartsWith (pushed as
    // StringStartsWith — that token renders truncated, so pin the
    // untruncated data-filter spelling)
    assert(plan.contains("StringStartsWith(host") ||
      plan.contains("StartsWith(host"), plan.take(3000))
    // the time range prunes window_date partitions at plan time
    assert(plan.contains("PartitionFilters: [isnotnull(window_date"), plan.take(3000))
  }

  test("ts_label_rate / ts_label_downsample: label pruning reaches the scan before any decode") {
    // rate: pushed equality + prefix filters sit in the parquet scan,
    // UNDER the decode — only selector-surviving chunks ever unpack
    val rate = graft.queries.TsQueries.queries("ts_label_rate")(spark, dir)
    val rPlan = rate.queryExecution.executedPlan.toString
    assert(rPlan.contains("EqualTo(type,click)"), rPlan.take(3000))
    assert(rPlan.contains("StringStartsWith(host") ||
      rPlan.contains("StartsWith(host"), rPlan.take(3000))
    assert(rPlan.contains("PartitionFilters: [isnotnull(window_date"), rPlan.take(3000))
    assert(rate.count() > 0)
    // downsample: both matchers pushed, and the plan is COMPRESSED-
    // DOMAIN — bucket partials straight off chunks, no point decode
    val ds = graft.queries.TsQueries.queries("ts_label_downsample")(spark, dir)
    val dPlan = ds.queryExecution.executedPlan.toString
    assert(dPlan.contains("EqualTo(type,view)"), dPlan.take(3000))
    assert(dPlan.contains("EqualTo(region,r2)"), dPlan.take(3000))
    assert(dPlan.contains("gorilla_chunk_bucket_agg"), dPlan.take(3000))
    assert(!dPlan.contains("gorilla_decode"),
      "selector-scoped downsample must never materialize points:\n" + dPlan.take(3000))
    assert(ds.count() > 0)
  }

  test("ts_label_ratio / ts_label_offset: selector-first, broadcast-joined, compressed-domain") {
    val from = 1704844800L; val to = 1705017600L
    // vector matching: both sides' selectors push to their scans, the
    // on(host, region) match joins series-grain partials via BROADCAST
    val ratio = graft.queries.TsQueries.queries("ts_label_ratio")(spark, dir)
    val rPlan = ratio.queryExecution.executedPlan.toString
    assert(rPlan.contains("EqualTo(type,click)"), rPlan.take(3000))
    assert(rPlan.contains("EqualTo(type,view)"), rPlan.take(3000))
    assert(rPlan.contains("BroadcastHashJoin"), rPlan.take(3000))
    assert(!rPlan.contains("gorilla_decode"),
      "binary op must stay compressed-domain:\n" + rPlan.take(3000))
    // semantics vs raw events: cents ratio per (host, region)
    val evRaw = graft.queries.Tables(spark, dir, "events")
    val sec = Ts.epochSec(evRaw, "ts")
    val ev = evRaw
      .filter(sec >= from && sec <= to)
      .groupBy(concat(lit("h"), pmod(col("user_id"), lit(100L))).as("host"),
        concat(lit("r"), pmod(col("user_id"), lit(4L))).as("region"),
        col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val want = ev.filter(col("event_type") === "click")
      .withColumnRenamed("cents", "click_cents")
      .join(ev.filter(col("event_type") === "view")
        .withColumnRenamed("cents", "view_cents"), Seq("host", "region"))
      .select(col("host"), col("region"), col("click_cents"), col("view_cents"))
      .orderBy("host", "region").collect().map(_.toSeq).toSeq
    val got = ratio.select("host", "region", "click_cents", "view_cents")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)

    // offset: the same selector at two windows; both windows' label
    // predicates pushed, one store lineage, broadcast inner join
    val off = graft.queries.TsQueries.queries("ts_label_offset")(spark, dir)
    val oPlan = off.queryExecution.executedPlan.toString
    assert(oPlan.contains("EqualTo(type,click)"), oPlan.take(3000))
    // the scan's PushedFilters render truncates at 100 chars, so pin
    // the second matcher by its Catalyst filter spelling
    assert(oPlan.contains(" = r1)"), oPlan.take(3000))
    assert(oPlan.contains("BroadcastHashJoin"), oPlan.take(3000))
    val rows = off.collect()
    assert(rows.nonEmpty)
    // delta is exactly cur - prev on every row
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("delta_cents")) ==
        r.getLong(r.fieldIndex("cur_cents")) - r.getLong(r.fieldIndex("prev_cents")))
    }
  }

  test("r11 label keys: topk/group_left/quantile/unless stay compressed-domain; count_values decodes behind the selector") {
    val q = graft.queries.TsQueries.queries
    // topk: selector pushed, aggregation over series-grain partials,
    // k-selection is a TakeOrdered (never a full sort), zero decode
    val topk = q("ts_label_topk")(spark, dir)
    val tPlan = topk.queryExecution.executedPlan.toString
    assert(tPlan.contains("EqualTo(type,click)"), tPlan.take(3000))
    assert(tPlan.contains("TakeOrderedAndProject"), tPlan.take(3000))
    assert(!tPlan.contains("gorilla_decode"), tPlan.take(3000))
    assert(topk.count() == 3)
    // group_left: the one side joins back via BROADCAST, no decode
    val gl = q("ts_label_group_left")(spark, dir)
    val gPlan = gl.queryExecution.executedPlan.toString
    assert(gPlan.contains("BroadcastHashJoin"), gPlan.take(3000))
    assert(!gPlan.contains("gorilla_decode"), gPlan.take(3000))
    // every region's shares sum to ~1 (the many side partitions the one)
    val shares = gl.groupBy("region").agg(sum("share").as("s")).collect()
    shares.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    // quantile: series-grain rows only, zero decode
    val quant = q("ts_label_quantile")(spark, dir)
    assert(!quant.queryExecution.executedPlan.toString.contains("gorilla_decode"))
    assert(quant.count() > 0)
    // unless: LEFT ANTI via broadcast, right side never decodes
    val unl = q("ts_label_unless")(spark, dir)
    val uPlan = unl.queryExecution.executedPlan.toString
    assert(uPlan.contains("LeftAnti"), uPlan.take(3000))
    assert(uPlan.contains("Broadcast"), uPlan.take(3000))
    assert(!uPlan.contains("gorilla_decode"), uPlan.take(3000))
    // count_values genuinely needs samples: the decode IS in the plan,
    // but only after the pushed selector pruned the chunk scan
    val cv = q("ts_count_values")(spark, dir)
    val cPlan = cv.queryExecution.executedPlan.toString
    assert(cPlan.contains("EqualTo(type,purchase)"), cPlan.take(3000))
    assert(cPlan.contains("StringStartsWith(host") ||
      cPlan.contains("StartsWith(host"), cPlan.take(3000))
    assert(cPlan.contains("gorilla_decode"), cPlan.take(3000))
    assert(cv.count() > 0)
  }

  test("selectRangeAgg equals the unlabeled compute with manual filters") {
    val from = 1704844800L; val to = 1705017600L
    val got = graft.queries.TsQueries.queries("ts_label_select")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val ev = graft.queries.Tables(spark, dir, "events")
      .select(col("event_type").as("type"),
        concat(lit("h"), pmod(col("user_id"), lit(100L))).as("host"),
        concat(lit("r"), pmod(col("user_id"), lit(4L))).as("region"),
        col("ts"), col("value"))
      .filter(col("type") === "click" && col("host").startsWith("h1") &&
        col("region") =!= "r3")
    val want = Ts.rangeAgg(
        Ts.chunkify(ev, Seq("type", "host", "region"), "ts", "value"),
        Seq("type", "host", "region"), from, to)
      .orderBy("type", "host", "region").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty, "selector should match some series")
  }

  test("ts_label_values is metadata-only: the chunk column never reaches the scan") {
    val df = graft.queries.TsQueries.queries("ts_label_values")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach(rs => assert(!rs.contains("chunk"),
      s"label_values must answer from chunk metadata, not bytes: $rs"))
    assert(df.count() > 0)
  }

  test("ts_label_agg merges series partials exactly across the label subset") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.TsQueries.queries("ts_label_agg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    // cross-check: re-aggregate the per-series selector partials
    val from = 1704844800L; val to = 1705017600L
    val base = Labels.selectRangeAgg(
        graft.queries.TsQueries.labeledStoreChunks(spark, dir, from, to),
        graft.queries.TsQueries.labelCols, """{type="click"}""", from, to)
      .groupBy("region")
      .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)).sortBy(_._1) == base.sortBy(_._1))
  }

  test("withLabels map view agrees with the indexed columns") {
    val chunks = graft.queries.TsQueries.labeledStoreChunks(spark, dir)
    val withMap = Labels.withLabels(chunks, graft.queries.TsQueries.labelCols)
    val bad = withMap.filter(
      element_at(col("labels"), "host") =!= col("host") ||
      element_at(col("labels"), "type") =!= col("type")).count()
    assert(bad == 0L)
  }
}
