package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Write `.explain("formatted")` of selected query keys to
 * `<outDir>/<key>_<suffix>.txt` — the before/after plan artifacts the
 * optimization rounds commit under plans/rNN/.
 * Usage: runMain graft.tools.ExplainSome <sfDir> <outDir> <suffix> <key...>
 */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val keys = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $name")
    }
    spark.stop()
  }
}
