package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated TPC-H-ish test data. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.registerAll(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /**
   * The table written bucketed (+ sorted) by `key` into `buckets`
   * buckets — the co-located-join layout: two tables bucketed the same
   * way join WITHOUT a shuffle (and, sorted, without a sort), which at
   * 100 TB removes the single largest exchange in the relational
   * layer. Written once per (dir, table) per JVM; the catalog entry is
   * session-scoped (in-memory catalog), so re-registration re-writes
   * only in a fresh session.
   */
  def bucketed(spark: SparkSession, dir: String, name: String,
               key: String, buckets: Int = 8): DataFrame = synchronized {
    graft.functions.registerAll(spark)
    val table = s"graft_${name}_b"
    if (!spark.catalog.tableExists(table)) {
      val path = s"/tmp/graft_bucketed/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$name"
      // pre-partition on the bucket hash (same Murmur3 family) so each
      // task holds exactly one bucket => ONE file per bucket, which is
      // what lets the scan also honor sortBy (multi-file buckets force
      // a sort back in)
      apply(spark, dir, name)
        .repartition(buckets, org.apache.spark.sql.functions.col(key))
        .write
        .mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    }
    spark.table(table)
  }
}
