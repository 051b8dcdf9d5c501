package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Probe-budget sweep for the stored-LSH ANN path (r8 verdict "Next
 * round" #3): for each (probes, probes2Tables) config, measure wall
 * latency of the sim_ann_lsh query shape on sf0.1 and recall@5 vs
 * brute force on the 10-query benchmark — the data behind the tuned
 * defaults in OpsQueries.
 *
 * Usage: LshTune [sfDir]
 */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.queries.OpsQueries.storeModels(spark, dir)
    val truth = Similarity.bruteTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val configs = Seq((1, 0), (2, 2), (2, 4), (2, 5), (2, 6), (2, Int.MaxValue))
    for ((probes, t2) <- configs) {
      def run(): (Double, Set[(Long, Long)]) = {
        // time the FULL query shape the bench runs (every corpus
        // vector is a query); recall reads the 10-query benchmark rows
        val t0 = System.nanoTime()
        val rows = Similarity.annTopKStored(idx, emb, "vec_id", "embedding",
            k = 5, probes = probes, probes2Tables = t2)
          .orderBy("q_id", "rank").select("q_id", "n_id").collect()
        ((System.nanoTime() - t0) / 1e9,
          rows.filter(_.getLong(0) < 10).map(r => (r.getLong(0), r.getLong(1))).toSet)
      }
      run() // warm
      val (sec, got) = run()
      val (sec2, _) = run()
      val recallBp = 10000L * truth.intersect(got).size / truth.size
      println(f"[lshtune] probes=$probes t2=${if (t2 == Int.MaxValue) "all" else t2.toString}%-3s " +
        f"sec=${math.min(sec, sec2)}%.2f recall_bp=$recallBp")
    }
    spark.stop()
  }
}
