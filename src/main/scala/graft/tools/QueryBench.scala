package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused repeat-bench: time selected SparkEntry queries N times each
  * (after one untimed warm pass) to separate real plan cost from
  * run-to-run noise. args: sfDir reps name1 name2 ... */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.queries.OpsQueries.storeModels(spark, dir)
    catch { case _: Throwable => () }
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => println(s"WARM FAIL $n: $e") }
    }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f max=${times.max}%.3f")
    }
    spark.stop()
  }
}
