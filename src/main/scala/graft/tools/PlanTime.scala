package graft.tools
import org.apache.spark.sql.SparkSession

/**
 * Split a query key's wall time into build (DataFrame construction),
 * plan (analysis + optimization + physical planning, forced via
 * executedPlan), and exec (the action) — the guide-§1 "where does the
 * time actually go" measurement for sub-second keys where driver-side
 * planning can rival execution. Two passes; read the second (warm).
 * Usage: runMain graft.tools.PlanTime <key...>   (SPARK_GRAFT_SF_DIR)
 */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    (1 to 2).foreach { pass =>
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        System.gc()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"pass$pass $n%-42s build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f total=${(t3 - t0) / 1e9}%6.3f")
      }
    }
    graft.ops.CacheScope.releaseAll()
    spark.stop()
  }
}
