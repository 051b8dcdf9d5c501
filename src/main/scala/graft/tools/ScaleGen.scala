package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic scale-corpus generator: schema-identical, statistically
 * similar siblings of the driver's sf* tables (TESTDATA.md), at 100x -
 * 2000x the sf0.1 row counts, so the heavy operator families can be
 * MEASURED at multi-GB input instead of plan-asserted (VERDICT r8,
 * "What's missing" #1). Everything is a pure function of the row id
 * (seeded per-id generators, no partitioning sensitivity): re-running
 * any subset reproduces byte-identical rows.
 *
 * Layout written to `outDir`:
 *   events.parquet      nEvents rows   (Jan 2024, nUsers x 5 series)
 *   documents.parquet   nDocs rows     (~165-word docs; per 20-block:
 *                                       1 near-dup @ ~2% word edits +
 *                                       1 exact dup of the block base)
 *   embeddings.parquet  nVecs rows     (64-dim, 256 planted clusters)
 *
 * Usage: ScaleGen <outDir> [nEvents] [nDocs] [nVecs]
 */
object ScaleGen {
  // ~40-word tech vocabulary in the flavor of the driver's documents
  val Vocab: Array[String] = Array(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "index", "join", "shard", "cache", "store", "chunk",
    "codec", "plan", "stage", "task", "block", "range", "limit", "distinct")

  val Langs: Array[String] = Array("en", "en", "en", "en", "en", "en", "en",
    "de", "fr", "es", "ru", "zh") // ~58% en, long tail

  /** One word: ~25% from the 40-word head vocabulary, else a
    * log-uniform (Zipf-ish) id out of a 200k-word tail — Heaps/Zipf
    * statistics, so shingle document frequencies scale the way a real
    * corpus's do (mostly-rare tail + genuinely hot head shingles that
    * exercise the df caps / prefix filters) instead of every 3-gram
    * appearing in thousands of documents. */
  private def pickWord(r: java.util.Random): String =
    if (r.nextInt(4) == 0) Vocab(r.nextInt(Vocab.length))
    else "w" + math.exp(r.nextDouble() * math.log(200000.0)).toLong

  /** Words of the FRESH doc for a given seed id (block bases and
    * non-dup rows); near/exact dups derive from their block base. */
  private def freshWords(seedId: Long): Array[String] = {
    val r = new java.util.Random(seedId * 0x9E3779B97F4A7C15L + 42L)
    val len = 40 + r.nextInt(260) // avg ~170 words
    Array.fill(len)(pickWord(r))
  }

  /** doc text for id under the 20-block dup plan:
    * id%20==1 -> ~2% word substitutions of the block base (a planted
    * NEAR dup: ~6% of 3-gram shingles change, jaccard ~0.85-0.9);
    * id%20==2 -> byte-exact copy of the block base;
    * otherwise fresh. */
  def docText(id: Long): String = {
    val slot = id % 20
    if (slot == 1 && id >= 1) {
      val base = freshWords(id - 1)
      val r = new java.util.Random(id * 0xC2B2AE3D27D4EB4FL + 7L)
      val out = base.clone()
      val nMut = math.max(1, base.length / 50)
      var i = 0
      while (i < nMut) {
        out(r.nextInt(out.length)) = pickWord(r)
        i += 1
      }
      out.mkString(" ")
    } else if (slot == 2 && id >= 2) freshWords(id - 2).mkString(" ")
    else freshWords(id).mkString(" ")
  }

  def docRow(id: Long): Row = {
    val text = docText(id)
    val r = new java.util.Random(id * 0x165667B19E3779F9L + 3L)
    Row(id, text, Langs(r.nextInt(Langs.length)), "src" + r.nextInt(20),
      text.length.toLong)
  }

  def vecRow(id: Long, dim: Int): Row = {
    val cluster = ((id * 2654435761L) >>> 16).toInt & 255
    val cr = new java.util.Random(cluster * 0x9E3779B97F4A7C15L + 11L)
    val center = Array.fill(dim)(cr.nextGaussian().toFloat)
    val r = new java.util.Random(id * 0xFF51AFD7ED558CCDL + 13L)
    val v = Array.tabulate(dim)(j => center(j) + 0.15f * r.nextGaussian().toFloat)
    Row(id, v.toSeq, cluster % 20)
  }

  def events(spark: SparkSession, n: Long): DataFrame = {
    val types = array(lit("click"), lit("view"), lit("purchase"),
      lit("signup"), lit("error"))
    val baseSec = 1704067200L // 2024-01-01 00:00:00 UTC, the testdata epoch
    val nUsers = 30000L
    spark.range(0L, n, 1L, 512)
      .select(col("id").as("event_id"),
        timestamp_seconds(lit(baseSec) +
          pmod(xxhash64(col("id"), lit(7L)), lit(30L * 86400))).as("ts"),
        pmod(xxhash64(col("id"), lit(11L)), lit(nUsers)).as("user_id"),
        element_at(types,
          (pmod(xxhash64(col("id"), lit(13L)), lit(5L)) + 1).cast("int"))
          .as("event_type"),
        // 2-decimal grid in [0, 10000) — the same cents-exact domain
        // every ts query relies on
        (pmod(xxhash64(col("id"), lit(17L)), lit(1000000L)) / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(19L)), lit(100L)),
          lit("}")).as("props"))
  }

  def documents(spark: SparkSession, n: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val rdd = spark.range(0L, n, 1L, 256).rdd.map((id: java.lang.Long) => docRow(id))
    spark.createDataFrame(rdd, schema)
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val rdd = spark.range(0L, n, 1L, 128).rdd.map((id: java.lang.Long) => vecRow(id, dim))
    spark.createDataFrame(rdd, schema)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val nEvents = if (args.length > 1) args(1).toLong else 200000000L
    val nDocs = if (args.length > 2) args(2).toLong else 2000000L
    val nVecs = if (args.length > 3) args(3).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-gen")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scalegen] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // pass 0 for a table to skip (re-)generating it
    if (nEvents > 0) t(s"events x$nEvents") {
      events(spark, nEvents).write.mode("overwrite")
        .parquet(s"$outDir/events.parquet")
    }
    if (nDocs > 0) t(s"documents x$nDocs") {
      documents(spark, nDocs).write.mode("overwrite")
        .parquet(s"$outDir/documents.parquet")
    }
    if (nVecs > 0) t(s"embeddings x$nVecs") {
      embeddings(spark, nVecs).write.mode("overwrite")
        .parquet(s"$outDir/embeddings.parquet")
    }
    spark.stop()
  }
}
