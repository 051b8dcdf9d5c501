package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated TPC-H-ish test data. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.registerAll(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
