package graft.tools
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("documents", "embeddings").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val names = args.toSeq
    // two passes: second pass is the warmed number
    (1 to 2).foreach { pass =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"pass$pass $n ${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
