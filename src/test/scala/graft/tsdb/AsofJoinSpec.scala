package graft.tsdb

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("backward as-of join carries the matched right row's payload exactly") {
    val quotes = Seq( // key, ts, bid
      ("A", 100L, 1.25), ("A", 105L, 1.5), ("A", 105L, 1.75), ("B", 90L, 9.0)
    ).toDF("sym", "qts", "bid")
    val trades = Seq( // key, ts, qty
      ("A", 99L, 10L),  // before any quote -> null match
      ("A", 105L, 20L), // equal ts -> matched ('<=')
      ("A", 200L, 30L), // after both -> latest quote
      ("B", 95L, 40L),
      ("C", 50L, 50L)   // key with no quotes at all
    ).toDF("sym", "tts", "qty")

    val out = Ts.asofJoin(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("sym", "tts")
      .select("sym", "tts", "qty", "right_qts", "right_bid")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq

    assert(out == Seq(
      ("A", 99L, 10L, None, None),
      // two quotes at ts=105: struct max tie-breaks to the larger bid
      ("A", 105L, 20L, Some(105L), Some(1.75)),
      ("A", 200L, 30L, Some(105L), Some(1.75)),
      ("B", 95L, 40L, Some(90L), Some(9.0)),
      ("C", 50L, 50L, None, None)))
  }
}
