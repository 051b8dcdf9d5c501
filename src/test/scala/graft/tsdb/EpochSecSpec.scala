package graft.tsdb

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Ts.epochSec is the single seam between the engine and whatever
 * physical type the driver's parquet writer chooses for timestamps —
 * round 7's writer switch from TIMESTAMP(NANOS)-as-long to
 * TIMESTAMP(MICROS) silently broke every ts_* query through this one
 * function. Pin every input shape to the same epoch-second floor so
 * the next layout change fails HERE, loudly, not in 44 queries.
 */
class EpochSecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 2024-01-10T01:02:03.789Z — the fraction must floor away
  private val sec = 1704848523L

  private def secOf(df: org.apache.spark.sql.DataFrame): Long =
    df.select(Ts.epochSec(df, "ts").as("s")).first().getLong(0)

  test("epoch-nano longs floor to seconds by integer division") {
    import spark.implicits._
    val df = Seq(sec * 1000000000L + 789000000L).toDF("ts")
    assert(secOf(df) == sec)
    // nano epochs exceed 2^53: double math would drift, integers must not
    val big = Seq(4102444800L * 1000000000L + 999999999L).toDF("ts")
    assert(secOf(big) == 4102444800L)
  }

  test("TIMESTAMP (session-tz, pinned UTC) floors to seconds") {
    import spark.implicits._
    val df = Seq(java.sql.Timestamp.from(
      java.time.Instant.ofEpochMilli(sec * 1000L + 789L))).toDF("ts")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(secOf(df) == sec)
  }

  test("TIMESTAMP_NTZ binds naive values to UTC, matching the oracle") {
    import spark.implicits._
    val df = Seq(java.time.LocalDateTime.ofEpochSecond(
      sec, 789000000, java.time.ZoneOffset.UTC)).toDF("ts")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(secOf(df) == sec)
  }

  test("numeric epoch seconds pass through") {
    import spark.implicits._
    val df = Seq(sec.toInt).toDF("ts")
    assert(secOf(df) == sec)
  }

  test("the events table itself floors consistently with DuckDB's epoch_ns // 1e9") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val viaEngine = ev.select(Ts.epochSec(ev, "ts").as("s"))
      .agg(min("s"), max("s"), sum("s")).first()
    // independent path: truncate to the second FIRST, then convert —
    // no division involved, so it cannot share a rounding bug
    val direct = ev.select(unix_seconds(
        date_trunc("SECOND", col("ts").cast("timestamp"))).as("s"))
      .agg(min("s"), max("s"), sum("s")).first()
    assert(viaEngine == direct)
  }
}
