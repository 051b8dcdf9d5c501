package graft.tsdb

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recording/alerting rules ([[Rules]]): the derived store round-trips
  * the stepped evaluation exactly, stays a first-class compressed-
  * domain substrate (rule-name pushdown, header-stat answers), and the
  * `for` clause's continuity window matches a hand fold. */
class RulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  val labelCols = Seq("type", "host", "region")
  val EvalTs = 1705017600L
  val RangeStart = 1704844800L
  def chunks = graft.queries.TsQueries.labeledStoreChunks(spark, dir)

  test("recording rule round-trips: derived store decode == stepped eval") {
    val rule = Rules.Recording("region:click:sum6h",
      "sum by (region) (sum_over_time(click[6h]))", RangeStart, EvalTs, 7200L)
    val want = Promql.evalRange(chunks, labelCols, rule.expr,
      RangeStart, EvalTs, 7200L)
      .select("region", "ts", "value").orderBy("region", "ts").collect().toSeq
    val store = Rules.materialize(chunks, labelCols, Seq(rule))
    // decode the derived chunks back to points: exact (ts, value) parity
    val got = Labels.selectRange(store, labelCols,
        """{type="region:click:sum6h"}""", Long.MinValue + 1, Long.MaxValue - 1)
      .select(col("region"), col("ts"), col("v").as("value"))
      .orderBy("region", "ts").collect().toSeq
    assert(got == want)
    // labels: metric name on the first label col, grouped-away cols ""
    val lbls = store.select("type", "host").distinct().collect()
    assert(lbls.forall(r => r.getString(0) == "region:click:sum6h" &&
      r.getString(1) == ""))
  }

  test("derived store is compressed-domain: pushdown + zero decode") {
    val rule = Rules.Recording("region:click:sum6h",
      "sum by (region) (sum_over_time(click[6h]))", RangeStart, EvalTs, 7200L)
    val path = java.nio.file.Files.createTempDirectory("rules_spec").toString
    Ts.writeStore(Rules.materialize(chunks, labelCols, Seq(rule)), path)
    val rec = Ts.readStore(spark, path, Long.MinValue, Long.MaxValue)
    val df = Promql.eval(rec, labelCols,
      "max_over_time(region:click:sum6h[2d])", EvalTs)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(type,region:click:sum6h)"), plan.take(3000))
    assert(!plan.contains("gorilla_decode"),
      "derived-store _over_time must answer from header stats:\n" + plan.take(3000))
    assert(df.count() > 0)
  }

  test("alert `for` continuity == hand fold over the condition steps") {
    val forSec = 14400L // 3 consecutive 2-h evaluations
    val a = Rules.Alert("HighClickVolume",
      "sum by (region) (sum_over_time(click[6h])) > 10", forSec,
      RangeStart, EvalTs, 7200L)
    val got = Rules.alert(chunks, labelCols, a)
      .select("region", "ts", "state").orderBy("region", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    val cond = Promql.evalRange(chunks, labelCols, a.expr,
        RangeStart, EvalTs, 7200L)
      .select("region", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.keySet == cond)
    got.foreach { case ((region, ts), state) =>
      val continuous = (0L to 2L).forall(i => cond((region, ts - i * 7200L)))
      assert(state == (if (continuous) "firing" else "pending"),
        s"$region@$ts: $state but continuous=$continuous")
    }
    // both states must be exercised by the fixture
    assert(got.values.toSet == Set("pending", "firing"))
    // misaligned `for` fails loudly
    intercept[IllegalArgumentException](
      Rules.alert(chunks, labelCols, a.copy(forSec = 5000L)))
  }
}
