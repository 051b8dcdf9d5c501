package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_roundtrip_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TsQueries.queries ++ graft.queries.RelQueries.queries ++
      graft.queries.OpsQueries.queries ++ graft.queries.PromqlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.TsQueries.oracleSql ++ graft.queries.RelQueries.oracleSql ++
      graft.queries.OpsQueries.oracleSql ++ graft.queries.PromqlQueries.oracleSql
}
