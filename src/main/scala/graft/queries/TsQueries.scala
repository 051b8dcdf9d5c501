package graft.queries

import graft.tsdb.Ts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Gorilla roundtrip + TSDB queries over the `events` table.
 *
 * Series = (user_id, event_type); values = `value`; timestamps at
 * second resolution (the reference's tuning). Every aggregate output
 * is exact-match safe against DuckDB: counts, IEEE min/max, and sums
 * as integer cents.
 */
object TsQueries {
  val series: Seq[String] = Seq("user_id", "event_type")

  def chunks(s: SparkSession, dir: String, leadTrail: Boolean = false): DataFrame =
    Ts.chunkify(Tables(s, dir, "events"), series, "ts", "value", leadTrail = leadTrail)

  private def aggExact(points: DataFrame): DataFrame =
    points.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        min("ts").as("min_ts"), max("ts").as("max_ts"),
        min("v").as("min_v"), max("v").as("max_v"),
        sum(round(col("v") * 100).cast("long")).as("sum_cents"))
      .orderBy("user_id")

  private val aggExactSql =
    """SELECT user_id, count(*) AS n,
      |  min(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS min_ts,
      |  max(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS max_ts,
      |  min(value) AS min_v, max(value) AS max_v,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // encode -> decode -> aggregate: proves bit-exact roundtrip at scale
    "ts_roundtrip_agg" -> ((s, dir) => aggExact(Ts.unpack(chunks(s, dir), series))),
    "ts_roundtrip_leadtrail" -> ((s, dir) =>
      aggExact(Ts.unpack(chunks(s, dir, leadTrail = true), series))),
    // the full decoded point set, row for row
    "ts_roundtrip_points" -> ((s, dir) =>
      Ts.unpack(chunks(s, dir), series)
        .select(col("user_id"), col("event_type"), col("ts"), col("v"))
        .orderBy("user_id", "event_type", "ts", "v")),
    // chunk layout: how many 2-h gorilla chunks per series, points per chunk
    "ts_chunk_stats" -> ((s, dir) =>
      chunks(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_chunks"), sum("n").as("n_points"),
          max("n").as("max_chunk_points"))
        .orderBy("user_id", "event_type")),
    // aggregate *directly over compressed chunks* (no point materialization)
    "ts_compressed_agg" -> ((s, dir) => {
      val c = chunks(s, dir)
      c.select(col("user_id"), graft.functions.gorilla_chunk_agg(col("chunk")).as("a"))
        .groupBy("user_id")
        .agg(sum(col("a.n")).as("n"),
          min(col("a.min_ts")).as("min_ts"), max(col("a.max_ts")).as("max_ts"),
          min(col("a.min_v")).as("min_v"), max(col("a.max_v")).as("max_v"))
        .orderBy("user_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "ts_roundtrip_agg" -> aggExactSql,
    "ts_roundtrip_leadtrail" -> aggExactSql,
    "ts_roundtrip_points" ->
      """SELECT user_id, event_type, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts, value AS v
        |FROM events ORDER BY user_id, event_type, ts, v""".stripMargin,
    "ts_chunk_stats" ->
      """SELECT user_id, event_type, count(*) AS n_chunks,
        |  CAST(sum(n) AS BIGINT) AS n_points, max(n) AS max_chunk_points
        |FROM (
        |  SELECT user_id, event_type,
        |    CAST((epoch_ns(ts) // 1000000000) // 7200 * 7200 AS BIGINT) AS w,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2, 3
        |) GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "ts_compressed_agg" ->
      """SELECT user_id, count(*) AS n,
        |  min(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS min_ts,
        |  max(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS max_ts,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
