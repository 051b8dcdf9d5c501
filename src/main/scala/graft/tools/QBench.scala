package graft.tools
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("documents", "embeddings").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // optional leading "-rN": N warm reps after the cold pass (the
    // noisy-host protocol — report min AND median, read the median)
    val (reps, names) = args.toSeq match {
      case r +: rest if r.startsWith("-r") =>
        val n = r.drop(2).toIntOption.getOrElse(
          sys.error(s"-rN needs an integer, got '$r'"))
        require(n >= 1, s"-rN needs N >= 1, got $n")
        (n, rest)
      case rest => (1, rest)
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"cold  $n ${(System.nanoTime() - t0) / 1e9}%.2f")
      val ts = (1 to reps).map { _ =>
        System.gc()
        val s0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - s0) / 1e9
      }.sorted
      println(f"warm  $n min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f max=${ts.last}%.3f reps=$reps")
    }
    graft.ops.CacheScope.releaseAll()
    spark.stop()
  }
}
