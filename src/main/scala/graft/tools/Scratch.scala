package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway dev runner: dump one SparkEntry query to parquet. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val out = if (args.length > 2) args(2) else s"/tmp/scratch_$name"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.mode("overwrite").parquet(out)
    println(s"ROWS=${spark.read.parquet(out).count()}")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out.sql"), sql)
    }
    spark.stop()
  }
}
