package graft.tsdb

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Back-compat pin on the COMMITTED store fixture (written once by
 * graft.tools.FixtureGen, r8 round): the wire format is the contract —
 * every future revision must read these exact bytes into the exact
 * point multiset, and must re-encode that multiset to the same bytes.
 * A deliberate format change has to bump the chunk version byte and
 * regenerate the fixture in the same commit; an accidental one fails
 * here first.
 */
class StoreFormatCompatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val fixture = "src/test/resources/fixtures/store_v1"
  val series = Seq("user_id", "event_type")

  private lazy val chunks = Ts.readStore(spark, s"$fixture/store")

  test("every fixture chunk carries the v1 header (magic 'G', known variant)") {
    val hdr = chunks.select(col("chunk")).collect().map(_.getAs[Array[Byte]](0))
    assert(hdr.nonEmpty)
    hdr.foreach { b =>
      assert(b(0) == 'G'.toByte, "magic byte")
      assert(b(1) == 1.toByte || b(1) == 2.toByte,
        s"unknown chunk variant ${b(1)} — format change without a fixture bump?")
    }
  }

  test("chunk bytes match the committed manifest md5-for-md5") {
    val got = chunks
      .select(col("user_id"), col("event_type"), col("window_start"),
        col("n"), md5(col("chunk")).as("sig"))
      .collect()
      .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)},${r.getLong(3)},${r.getString(4)}")
      .toSet
    val want = scala.io.Source.fromFile(s"$fixture/manifest.csv").getLines()
      .filter(_.nonEmpty).toSet
    assert(got == want)
  }

  test("fixture bytes decode to the pinned point multiset") {
    val expected = scala.io.Source.fromFile(s"$fixture/expected.json").mkString
    def pin(key: String): Long =
      s""""$key":\\s*(-?\\d+)""".r.findFirstMatchIn(expected)
        .getOrElse(fail(s"no $key pin")).group(1).toLong
    val pts = Ts.unpack(chunks.drop("window_date"), series)
    val agg = pts.agg(
      count(lit(1)).as("n"),
      sum(round(col("v") * 100).cast("long")).as("sum_cents"),
      min("ts").as("min_ts"), max("ts").as("max_ts")).collect()(0)
    assert(agg.getLong(0) == pin("n_points"))
    assert(agg.getLong(1) == pin("sum_cents"))
    assert(agg.getLong(2) == pin("min_ts"))
    assert(agg.getLong(3) == pin("max_ts"))
    val digest = pts
      .select(md5(concat_ws("|", col("user_id"), col("event_type"), col("ts"),
        format_number(col("v"), 2))).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 12), 16, 10).cast("long")).as("s"))
      .collect()(0)
    assert(digest.getLong(0) == pin("point_digest_sum"),
      "decoded point multiset digest drifted from the committed fixture")
  }

  test("the current encoder still produces the fixture bytes") {
    val pts = Ts.unpack(chunks.drop("window_date"), series)
      .withColumn("ts", to_timestamp(col("ts")))
    val re = Ts.chunkify(pts, series, "ts", "v")
      .select(col("user_id"), col("event_type"), col("window_start"),
        md5(col("chunk")).as("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    val stored = chunks
      .select(col("user_id"), col("event_type"), col("window_start"),
        md5(col("chunk")).as("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(re == stored,
      "re-encoding the decoded fixture no longer reproduces the stored bytes")
  }
}
