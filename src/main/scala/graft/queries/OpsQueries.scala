package graft.queries

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LLM-data-pipeline operators as driver-contract queries over the
 * `documents` and `embeddings` tables.
 *
 * Oracle policy: operators whose semantics are expressible in SQL get
 * an exact DuckDB oracle (exact dedup, brute-force jaccard/cosine/
 * top-k, text analysis). Approximate/custom-hash operators (MinHash
 * LSH, SimHash, hyperplane ANN) are rows-only here and are instead
 * validated in `OpsSpec` against the exact baselines (recall/subset
 * properties) — an oracle cannot re-derive the hash family in SQL.
 */
object OpsQueries {

  private val docCols = Seq("doc_id", "text")

  /**
   * The persisted ANN index for a data dir: train AND encode ONCE
   * (first call per corpus fingerprint runs the k-means jobs and
   * writes centroids/codebooks PLUS the encoded corpus — lists, PQ
   * codes, residual codes, int8 codes), then every ANN query is pure
   * probe/code-scan/rerank — the chunk-store ingest-once shape applied
   * to ANN end-to-end. Two queries against the same corpus pay
   * training once and can never see different models; at 100 TB the
   * query path reads a few percent of the raw vector bytes.
   */
  def storeModels(s: SparkSession, dir: String): Similarity.AnnIndex = synchronized {
    val path = storeModelPath(s, dir)
    // hot-index caching: a serving cluster keeps the encoded corpus
    // (lists/codes — a few percent of the raw float bytes) resident in
    // executor memory instead of re-reading parquet per query; persist
    // spills to local disk if it outgrows memory, so this is the
    // at-scale shape, not a driver collect
    indexCache.getOrElseUpdate((s, path), {
      val idx = Similarity.readIndex(s, path)
      Seq(idx.lists, idx.codes, idx.resCodes, idx.sq8Codes, idx.lshLists)
        .foreach(_.persist())
      idx
    })
  }

  /** The INCREMENTALLY MAINTAINED index for a dir: trained + encoded
    * on a 90% base corpus, then the held-out 10% appended through
    * [[Similarity.appendToModels]] with the STORED models — the
    * daily-growth maintenance path, published once like
    * [[storeModels]]. The base/batch split is the same deterministic
    * id-hash construction the samplers use, so both halves are
    * engine- and layout-stable. */
  def appendedModels(s: SparkSession, dir: String): Similarity.AnnIndex = synchronized {
    val path = modelPath(dir) + "_app"
    publishOnce(s, path) { tmp =>
      val e = Tables(s, dir, "embeddings")
      val isBatch = pmod(xxhash64(col("vec_id"), lit(779L)), lit(10L)) === 7L
      Similarity.writeModels(e.filter(!isBatch), "vec_id", "embedding", tmp)
      Similarity.appendToModels(e.filter(isBatch), "vec_id", "embedding", tmp)
    }
    indexCache.getOrElseUpdate((s, path), {
      val idx = Similarity.readIndex(s, path)
      Seq(idx.lists, idx.codes, idx.resCodes, idx.sq8Codes, idx.lshLists)
        .foreach(_.persist())
      idx
    })
  }

  private val indexCache =
    scala.collection.mutable.Map[(SparkSession, String), Similarity.AnnIndex]()

  /**
   * The persisted SIGNATURE TABLE for a corpus — the dedup analogue
   * of the ANN index above: shingle hashes, the 64-minhash signature,
   * and the simhash are computed in ONE scan of the text and kept
   * resident (spilling to disk if large), and every dedup stage
   * probes this table instead of re-hashing the corpus. At 100 TB
   * signatures are computed when a document enters the corpus and
   * stored beside it (~hundreds of bytes/doc); re-deriving them per
   * stage would re-read the raw text — the dominant cost — once per
   * dedup query instead of once per corpus.
   */
  def docSignatures(s: SparkSession, dir: String): DataFrame = synchronized {
    sigCache.getOrElseUpdate((s, dir), {
      // durable like the ANN model store: signatures are written
      // beside the corpus once per corpus fingerprint, so a later
      // session (or another JVM) reads the published table instead of
      // re-hashing the text
      val path = sigPath(dir)
      publishOnce(s, path) { tmp =>
        Dedup.signatures(Tables(s, dir, "documents"), "doc_id", "text")
          .write.mode("overwrite").parquet(tmp)
      }
      s.read.parquet(path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** Signature-table path keyed by corpus fingerprint, so a
    * regenerated dir never reads stale signatures; `s1` versions the
    * signature layout. */
  private def sigPath(dir: String): String =
    s"/tmp/graft_models/${dir.replaceAll("[^A-Za-z0-9.]", "_")}_${corpusFingerprint(dir, "documents")}_s1"

  /** Corpus fingerprint: md5 over the ORDERED (name, length, mtime)
    * tuples of the table's files — an additive sum of length+mtime
    * (the previous scheme) admits collisions (swap bytes between two
    * files, touch timestamps that cancel), which would silently serve
    * a stale signature/model store for a regenerated corpus. */
  private[queries] def corpusFingerprint(dir: String, table: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    val files = if (src.isDirectory) src.listFiles().toSeq else Seq(src)
    val desc = files.filter(_.isFile).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Publish a derived table once per corpus: write to a session-
    * unique temp dir, then atomically rename into place. Two JVMs
    * racing on the same fingerprint cannot interleave writes into one
    * destination (the previous direct-overwrite + _SUCCESS check
    * could); the rename loser just deletes its temp copy. */
  private[queries] def publishOnce(s: SparkSession, path: String)
                                  (write: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) return
    // a marker-less target is a crashed partial write — by contract it
    // reads as absent, so clear it out of the rename's way
    if (fs.exists(target)) fs.delete(target, true)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    write(tmp.toString)
    fs.mkdirs(target.getParent)
    if (!fs.rename(tmp, target)) fs.delete(tmp, true)
  }

  private val sigCache =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  /**
   * The persisted POSTING-LIST table (id, g, pos, n) for a corpus —
   * the df-ranked exploded shingles the prefix-filtered containment /
   * Jaccard joins probe. Published beside the signature table for the
   * same reason: the vocabulary df groupBy and the per-doc rank window
   * are corpus-sized shuffles that belong at ingest, not per query —
   * rebuilding them per containment run was the repo's only measured
   * shuffle spill at 2M docs.
   */
  def docPostings(s: SparkSession, dir: String): DataFrame = synchronized {
    postCache.getOrElseUpdate((s, dir), {
      val path = sigPath(dir) + "_p1"
      publishOnce(s, path) { tmp =>
        Dedup.postings(docSignatures(s, dir))
          .write.mode("overwrite").parquet(tmp)
      }
      s.read.parquet(path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  private val postCache =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  /**
   * The VERIFIED near-dup pair table for the bounded correctness
   * corpus (id < 1000): LSH candidates + exact-Jaccard verify,
   * published once per corpus. Pair generation and clustering are
   * separate stages of a real dedup pipeline — the pair table is the
   * hand-off artifact, and every downstream consumer (fixpoint
   * clustering in `dedup_pipeline`, survivor join in `dedup_apply`)
   * reads it instead of re-running candidates+verify per consumer.
   */
  def verifiedPairs(s: SparkSession, dir: String): DataFrame = synchronized {
    pairCache.getOrElseUpdate((s, dir), {
      val sigs = docSignatures(s, dir).filter(col("id") < 1000)
      Dedup.jaccardVerifySigs(Dedup.minhashLshSigs(sigs), sigs, 0.5)
        .select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  private val pairCache =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  /**
   * The per-corpus IMAGE SIGNATURE table — [[docSignatures]] for
   * media: decode + perceptual hash run once per corpus (at ingest in
   * a real pipeline; phash is a property of the pixels, so it is
   * computed when the image first arrives and stored beside it), and
   * every image-dedup stage probes the hashes instead of re-decoding
   * blobs.
   */
  def imageSignatures(s: SparkSession, dir: String): DataFrame = synchronized {
    imgSigCache.getOrElseUpdate((s, dir), {
      Multimodal.imagePhash(
          Multimodal.syntheticPixelMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  private val imgSigCache =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  /**
   * Measured recall of every approximate path against its exact
   * baseline, as NUMBERS (basis points) rather than spec booleans —
   * one row per op: (op, n_true, n_found, n_matched, recall_bp).
   * Runs per round inside Verify so a recall regression is visible in
   * the round artifact (RECALL.json) and, via `quality_recall_gate`'s
   * pinned thresholds, fails the oracle gate outright.
   *
   * - `sim_ann_*`: intersection with the exact brute-force top-5 of
   *   the same 10 queries (`sim_topk`'s definition).
   * - `dedup_minhash`: verified LSH pairs vs brute n-gram Jaccard
   *   pairs ≥ 0.5 on the bounded corpus (id < 1000).
   * - `dedup_simhash`: banded-kernel pairs vs brute Hamming ≤ 7 pairs
   *   over the same signatures (id < 1000 bound keeps brute ≤ 500k
   *   comparisons at any SF).
   * - `minhash_bucket_cap`: pairs surviving the LSH `maxBucket`
   *   truncation vs all in-bucket pairs — [[Dedup.minhashBucketStats]]
   *   accounting, so cap-induced loss is a measured number.
   */
  def recallReport(s: SparkSession, dir: String): DataFrame = synchronized {
    // one computation per (session, corpus): the report is a published
    // per-round ARTIFACT (RECALL.json) read by two query keys and the
    // Verify dump — the brute-force truth passes are the expensive
    // part, and they are identical across those consumers
    recallCache.getOrElseUpdate((s, dir), {
      val df = computeRecallReport(s, dir)
      val rows = df.collect() // 13 rows — one per approximate op
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), df.schema)
    })
  }

  private val recallCache =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  private def computeRecallReport(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val brutePairs = Similarity
      .bruteTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
      .select(col("q_id").cast("long").as("a"), col("n_id").cast("long").as("b"))
    def recallRow(op: String, truth: DataFrame, found: DataFrame): DataFrame = {
      val t = truth.agg(count(lit(1)).as("n_true"))
      val f = found.agg(count(lit(1)).as("n_found"))
      val m = found.join(truth, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_matched"))
      t.crossJoin(f).crossJoin(m)
        .select(lit(op).as("op"), col("n_true"), col("n_found"), col("n_matched"),
          expr("CAST(n_matched * 10000 DIV n_true AS BIGINT)").as("recall_bp"))
    }
    val annOps = Seq("sim_ann_lsh", "sim_ann_lsh_join", "sim_ann_ivf", "sim_ann_pq",
      "sim_ann_ivfpq", "sim_ann_ivfpq_res", "sim_ann_sq8", "sim_ann_ivfsq8",
      "sim_ann_append")
    val annRows = annOps.map { op =>
      recallRow(op, brutePairs,
        queries(op)(s, dir).filter(col("q_id") < 10)
          .select(col("q_id").cast("long").as("a"), col("n_id").cast("long").as("b")))
    }
    val sigs = docSignatures(s, dir)
    val bounded = sigs.filter(col("id") < 1000)
    val mhTruth = Dedup.ngramJaccardBruteSigs(sigs, 1000, 0.5)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    val mhFound = verifiedPairs(s, dir)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    val sh = bounded.select(col("id"), col("simhash"))
    val shTruth = sh.as("x").join(sh.as("y"),
        col("x.id") < col("y.id") &&
          expr("bit_count(x.simhash ^ y.simhash) <= 7"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val shFound = Dedup.simhashPairsSigs(bounded)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    val capStats = Dedup.minhashBucketStats(sigs)
      .select(lit("minhash_bucket_cap").as("op"),
        col("pairs_total").as("n_true"),
        (col("pairs_total") - col("pairs_dropped")).as("n_found"),
        (col("pairs_total") - col("pairs_dropped")).as("n_matched"),
        expr("CAST((pairs_total - pairs_dropped) * 10000 DIV pairs_total AS BIGINT)")
          .as("recall_bp"))
    (annRows :+ recallRow("dedup_minhash", mhTruth, mhFound)
      :+ recallRow("dedup_simhash", shTruth, shFound)
      :+ capStats)
      .reduce(_ unionByName _)
  }

  /** Ensure the model store for `dir` is trained, and return its path.
    * Published via [[publishOnce]]: train into a temp dir, atomic
    * rename — concurrent JVMs can't interleave writes into one store. */
  def storeModelPath(s: SparkSession, dir: String): String = synchronized {
    val path = modelPath(dir)
    publishOnce(s, path) { tmp =>
      Similarity.writeModels(Tables(s, dir, "embeddings"), "vec_id", "embedding", tmp)
    }
    path
  }

  /** Cache key: input dir + total bytes+mtimes of the embeddings
    * table, so a regenerated test dir never reads stale models (the
    * `m9` suffix versions the store layout/params — m9 packs the
    * PQ/residual codes (one array<int> row per vector — the adc_score
    * kernel-scan shape) and makes nlist corpus-adaptive (identical 16
    * below 128k vectors); m8 records the
    * corpus size in lsh_meta so the quantized query paths scale their
    * rerank depth with it (the r10 scale-recall fix): a cached m7
    * store would silently keep the fixed depth; m7 forced
    * regeneration after r9 changed trained-model CONTENT without a
    * layout change (hash-sampled training, corpus-adaptive lshBits):
    * a cached pre-r9 store and a fresh one were both readable but
    * yielded different recall for identical inputs; m6 trained with
    * iters=4 and ksub=32 (the recall uplift round); m5 pre-grouped the
    * LSH buckets into (table, bucket, ids) lists; m4 added the encoded
    * corpus: lists, PQ/residual/int8 codes, LSH buckets). */
  private def modelPath(dir: String): String = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val files = if (src.isDirectory) src.listFiles().toSeq else Seq(src)
    val fp = files.filter(_.isFile).map(f => f.length() + f.lastModified()).sum
    s"/tmp/graft_models/${dir.replaceAll("[^A-Za-z0-9.]", "_")}_${java.lang.Long.toHexString(fp)}_m9"
  }

  /** Pinned recall floors (basis points) for `quality_recall_gate` —
    * measured at sf0.01 AND sf0.1, then set with enough margin to
    * absorb corpus-regeneration noise but tight enough that a real
    * regression (a broken hash family, a recall-losing cap) goes red. */
  // measured 2026-08-14 at the r10 config (iters=4, ksub=32, nprobe=8,
  // rerankFactor=24; sim_ann_lsh now the SERVING shape at the full
  // radius-2 probe budget, sim_ann_lsh_join the all-corpus self-join
  // at the LshTune-tuned probes=2/t2=6 budget), sf0.01 / sf0.1:
  // lsh 8000/9200, lsh_join 7200/9000, ivf 8600/8400, pq 9800/8200,
  // ivfpq 8600/7400, ivfpq_res 8600/7200, sq8 10000/10000,
  // ivfsq8 8600/8400, append 8200/6600 (the incremental store trains
  // on the 90% base, so it sits a few hundred bp under ivfpq by
  // construction — drift cost, not a bug); floors sit under the measured minimum (most by
  // 10-20 points; the two lsh rows by 5-7 points — acceptable
  // because the corpus is seeded and the measurement is deterministic
  // per config, so the margin only has to absorb config changes,
  // which are deliberate) so a real
  // regression (broken hash family, lost probe, recall-losing cap)
  // goes red. The three pair paths are EXACT by construction
  // (LSH candidate-complete at J>=0.9, 8-band simhash blocking exact
  // at dist<=7, bucket cap binding nothing) so their floors pin 10000
  private val recallFloorBp: Map[String, Long] = Map(
    "sim_ann_lsh" -> 7500L,
    "sim_ann_lsh_join" -> 6500L,
    "sim_ann_ivf" -> 7000L,
    "sim_ann_pq" -> 6500L,
    "sim_ann_ivfpq" -> 6000L,
    "sim_ann_ivfpq_res" -> 6000L,
    "sim_ann_append" -> 6000L,
    "sim_ann_sq8" -> 9000L,
    "sim_ann_ivfsq8" -> 7000L,
    "dedup_minhash" -> 10000L,
    "dedup_simhash" -> 10000L,
    "minhash_bucket_cap" -> 10000L)

  private def recallFloors(op: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    recallFloorBp.foldLeft(lit(Long.MaxValue)) { case (acc, (k, v)) =>
      when(op === k, lit(v)).otherwise(acc)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshSigs(docSignatures(s, dir)).orderBy("a_id", "b_id")),
    "dedup_minhash_verify" -> ((s, dir) => {
      val sigs = docSignatures(s, dir)
      Dedup.jaccardVerifySigs(Dedup.minhashLshSigs(sigs), sigs, 0.5)
        .orderBy("a_id", "b_id")
    }),
    // character-level second signal on the Jaccard-verified near-dup
    // pairs: Levenshtein within 2% of the longer doc — the typo-level
    // gate that separates "same text, small edits" from paraphrase.
    // The O(len²) kernel prices per CANDIDATE, never per corpus pair
    "dedup_edit_verify" -> ((s, dir) => {
      val sigs = docSignatures(s, dir)
      Dedup.editVerify(
        Dedup.jaccardVerifySigs(Dedup.minhashLshSigs(sigs), sigs, 0.5),
        Tables(s, dir, "documents"), "doc_id", "text", maxDistPermille = 20)
        .orderBy("a_id", "b_id")
    }),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardBruteSigs(docSignatures(s, dir),
        maxId = 1000, threshold = 0.5).orderBy("a_id", "b_id")),
    // asymmetric containment |A∩B|/|A| off the signature store: the
    // snippet-inside-page measure contamination checks need and
    // symmetric Jaccard misses (a pair qualifies when either
    // direction ≥ 0.5)
    "text_containment" -> ((s, dir) =>
      Dedup.containmentBruteSigs(docSignatures(s, dir),
        maxId = 1000, threshold = 0.5).orderBy("a_id", "b_id")),
    // the FULL-corpus scale path: prefix-filtered containment join
    // (rarest-shingle prefixes bound the inverted join exactly — no
    // recall-losing bucket cap), equal output to brute over the same
    // corpus (pinned in OpsSpec); runs unbounded where the brute
    // baseline needs its id cap. Probes the PUBLISHED posting-list
    // artifact — the df rank shuffle is paid once per corpus.
    "text_containment_join" -> ((s, dir) =>
      Dedup.containmentJoinPostings(docPostings(s, dir),
          docSignatures(s, dir), threshold = 0.5)
        .orderBy("a_id", "b_id")),
    "dedup_components" -> ((s, dir) => {
      val sigs = docSignatures(s, dir).filter(col("id") < 1000)
      Dedup.components(
        Dedup.ngramJaccardPrefixSigs(sigs, 1000, 0.5),
        sigs, "id").orderBy("id")
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairsSigs(docSignatures(s, dir)).orderBy("a_id", "b_id")),
    // corpus maintenance: dedup TODAY'S batch (doc_id >= 400) against
    // already-deduped history (< 400) — candidates touch at least one
    // batch doc, history is never re-paired against itself; verified
    // with exact jaccard and oracled against brute pairs restricted
    // to the batch
    "dedup_incremental" -> ((s, dir) => {
      val sigs = docSignatures(s, dir).filter(col("id") < 1000)
      Dedup.jaccardVerifySigs(
        Dedup.minhashLshIncrementalSigs(
          sigs.filter(col("id") >= 400), sigs.filter(col("id") < 400)),
        sigs, 0.5).orderBy("a_id", "b_id")
    }),
    "dedup_embedding" -> ((s, dir) =>
      Similarity.cosinePairs(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        maxId = 1000, threshold = 0.45).orderBy("a_id", "b_id")),
    "sim_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.bruteTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
        .orderBy("q_id", "rank")
    }),
    // corpus segmentation: deterministic k-means cluster assignments
    // with membership counts. SQL-oracled since r18: Lloyd's itself
    // has no SQL twin, but the assignments are a pure function of the
    // trained ≤ k-row centroid model (deterministic seeding,
    // 1e-6-quantized means), so the query exports the model as SQL
    // literals and DuckDB re-runs the nearest-centroid argmax —
    // assignment==independent-nearest-centroid additionally pinned in
    // OpsSpec
    "sim_kmeans" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8)
      stashKmeansOracle(cents.select("cluster", "centroid").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)))
      Similarity.kmeansAssignWith(cents, e, "vec_id", "embedding").orderBy("id")
    }),
    // radius dual of sim_topk: ALL neighbors above a similarity
    // threshold per query (retrieval wants "sufficiently similar",
    // not "k closest"); query side broadcasts, corpus is the scan
    "sim_range_search" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.rangeSearch(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        threshold = 0.3).orderBy("q_id", "n_id")
    }),
    // corpus-dominant tokens from ONE mergeable fixed-state sketch
    // (misra_gries TypedImperativeAggregate): no full-vocabulary
    // shuffle — the 100 TB boilerplate/stopword detector (rows-only:
    // reported counts are guarantee-banded lower bounds; the
    // superset + error-bound guarantees are pinned in OpsSpec)
    "text_heavy_hitters" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(graft.functions.misra_gries(col("w"), 64).as("hh"))
        .select(posexplode(col("hh")))
        .filter(col("pos") < 10)
        .select((col("pos") + 1).as("rank"), col("col.item").as("term"),
          col("col.lower_count").as("lower_count"))),
    // multi-probe LSH SERVING off the persisted bucket lists — the
    // same 10-query batch shape as every other sim_ann_* key (r9
    // verdict: the key previously measured the all-corpus self-join,
    // making it the family's odd one out on both axes). The query
    // batch hashes through the stored hyperplane family, probes its
    // budgeted buckets against the pre-grouped lists, and reranks
    // exactly; per-query the full radius-2 fan-out is cheap (1 + b +
    // C(b,2) bucket lookups), so serving runs the FULL probe budget —
    // recall 8000 bp at sf0.01 (floor 7500), latency sibling-shaped.
    // The all-corpus self-join lives on as sim_ann_lsh_join below
    "sim_ann_lsh" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.annTopKStoredFor(storeModels(s, dir), e,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank")
    }),
    // the ALL-CORPUS LSH neighbor join (every vector is a query) —
    // the near-dup/clustering candidate shape, throughput-priced:
    // ~17 µs/query at sf0.1 amortized across 75k queries. Probe
    // budget stays the LshTune-tuned t2=6 default (radius-2 on 6 of 8
    // tables): the committed sweep (LSH_TUNE.json) shows t2=6
    // dominates full radius-2 on this shape (sf0.1 recall 9000 bp vs
    // 8000 at ~10% less wall), and the recall floor (6500 bp at
    // sf0.01, measured 7200) rides the same 10-query benchmark
    "sim_ann_lsh_join" -> ((s, dir) =>
      Similarity.annTopKStored(storeModels(s, dir), Tables(s, dir, "embeddings"),
        "vec_id", "embedding", k = 5, probes = 2, probes2Tables = 6)
        .orderBy("q_id", "rank")),
    // IVF ANN off the FULLY persisted index (train+encode once): the
    // query path is probe -> persisted-list scan -> exact rerank only
    "sim_ann_ivf" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfTopKStored(storeModels(s, dir), e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5).orderBy("q_id", "rank")
    }),
    // PQ ANN: ADC scan over PERSISTED codes (the corpus floats are
    // never read before the rerank) + exact rerank (rows-only: recall
    // pinned vs brute force in OpsSpec; hash-seeded codebooks are not
    // SQL-expressible)
    "sim_ann_pq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.pqTopKStored(storeModels(s, dir), e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5).orderBy("q_id", "rank")
    }),
    // IVF-PQ composition: persisted-list-restricted candidate scan
    // scored by persisted codes, exact rerank (rows-only: recall
    // pinned vs brute in OpsSpec)
    "sim_ann_ivfpq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopKStored(storeModels(s, dir), e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5).orderBy("q_id", "rank")
    }),
    // residual IVF-PQ: vectors quantized as centroid + PQ(v - centroid)
    // — the billion-scale accuracy variant; persisted residual codes
    // carry the list assignment (rows-only: recall floor + >=
    // non-residual recall in OpsSpec)
    "sim_ann_ivfpq_res" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfPqResidualTopKStored(storeModels(s, dir), e,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank")
    }),
    // int8 scalar-quantized scan over PERSISTED codes: ¼ the scan
    // bytes of floats, exact integer scoring (bit-stable), exact
    // rerank on top (rows-only: recall pinned in OpsSpec)
    "sim_ann_sq8" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.sq8TopKStored(storeModels(s, dir), e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5).orderBy("q_id", "rank")
    }),
    // IVF-SQ8: probe-restricted persisted lists scored by persisted
    // int8 codes — the FAISS IVF-SQ rung between IVF-flat and IVF-PQ
    // (rows-only: recall floor vs brute pinned in OpsSpec)
    "sim_ann_ivfsq8" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfSq8TopKStored(storeModels(s, dir), e,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank")
    }),
    // INCREMENTAL index maintenance end-to-end: the store was trained
    // + encoded on a 90% base corpus and the held-out 10% APPENDED
    // with the stored models (Similarity.appendToModels — no retrain,
    // no corpus re-encode), then the flagship IVF-PQ query serves the
    // union off the maintained tables. The daily-growth path: batch
    // encode is linear in the batch; a rebuild re-trains + re-encodes
    // everything (245 s at 2M vectors, per day, for ever). Rows-only:
    // recall floor + append/rebuild table parity pinned in OpsSpec
    "sim_ann_append" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopKStored(appendedModels(s, dir), e,
        e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank")
    }),
    // per-round recall NUMBERS for every approximate path (rows-only:
    // the values are measurements; the pinned thresholds live in
    // quality_recall_gate, which IS sql-oracled)
    "quality_recall" -> ((s, dir) => recallReport(s, dir).orderBy("op")),
    // threshold gate over the measured recalls: the oracle pins one
    // (op, pass=true) row per approximate path, so any recall dropping
    // below its floor flips pass -> false and hash-fails the gate
    "quality_recall_gate" -> ((s, dir) =>
      recallReport(s, dir)
        .select(col("op"), (col("recall_bp") >= recallFloors(col("op"))).as("pass"))
        .orderBy("op")),
    "text_langid" -> ((s, dir) =>
      TextOps.langId(Tables(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),
    // within-doc repetition (dup-bigram + top-bigram shares) — the
    // Gopher-style quality gate for boilerplate/spam docs
    "text_repetition" -> ((s, dir) =>
      TextOps.repetition(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // apply the quality gate: emit the surviving corpus (the filter
    // materialization every dataset build ships); exact-int thresholds
    "text_filter_apply" -> ((s, dir) =>
      TextOps.filterApply(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // dataset-card numbers: per-(lang, source) doc/char/token totals
    "text_corpus_stats" -> ((s, dir) =>
      TextOps.corpusStats(Tables(s, dir, "documents"), "lang", "source", "text")
        .orderBy("lang", "source")),
    // per-vector L2 norms (index-order double accumulation == oracle)
    "sim_norms" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), size(col("embedding")).as("dim"),
          sqrt(graft.functions.vec_dot(col("embedding"), col("embedding"))).as("l2_norm"))
        .orderBy("vec_id")),
    "text_quality" -> ((s, dir) =>
      TextOps.quality(Tables(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),
    // length-proportional deterministic sampling (integer-exact hash
    // gate, p = min(1, n_chars/2000)): uniform-over-chars doc pick
    "sample_weighted" -> ((s, dir) =>
      TextOps.sampleWeighted(Tables(s, dir, "documents"), "doc_id",
          col("n_chars"), scale = 2000L)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")),
    // per-source best-quality-first cut at an 800-token budget (binds
    // at every SF: sources carry ~1.3k tokens at sf0.01, ~13k at sf0.1)
    "text_token_budget" -> ((s, dir) =>
      TextOps.tokenBudget(Tables(s, dir, "documents"), "doc_id", "text",
        "source", budget = 800L).orderBy("doc_id")),
    // concat-and-chunk packing into 1024-token training sequences,
    // sharded 8 ways per source so the cumsum parallelizes
    "pack_sequences" -> ((s, dir) =>
      TextOps.packSequences(Tables(s, dir, "documents"), "doc_id", "text",
        "source", ctxLen = 1024L).orderBy("doc_id")),
    // split a 1M-token budget across languages proportionally to
    // exact token counts, largest-remainder rounded to sum exactly
    "mix_allocate" -> ((s, dir) =>
      TextOps.mixAllocate(Tables(s, dir, "documents"), "lang", "text",
        budget = 1000000L).orderBy("lang")),
    // winnowing fingerprints (MOSS): rightmost-min of every 8-hash
    // window over word 4-gram hashes — position-bearing span
    // fingerprints at ~2/(w+1) the gram count
    "text_winnowing" -> ((s, dir) =>
      TextOps.winnowing(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "pos", "fp")),
    // RAG-ingestion chunking: 64-token windows at stride 48 per doc,
    // fingerprints standing in for chunk payloads
    "text_chunks" -> ((s, dir) =>
      TextOps.chunk(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")),
    // chunk-level duplication profile: which RAG chunks already exist
    // elsewhere (skip-re-encode signal for an embedding indexer)
    "text_chunk_dedup" -> ((s, dir) =>
      TextOps.chunkDedup(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // span-evidence near-dup candidates: pairs sharing >= 3 winnow
    // fingerprints (each one a k-gram both docs' windows selected),
    // fp-blocked inversion with a hot-fingerprint df cap
    "dedup_winnow" -> ((s, dir) =>
      TextOps.winnowPairs(Tables(s, dir, "documents"), "doc_id", "text",
        minShared = 3L).orderBy("a_id", "b_id")),
    // temperature-scaled mixture (α = 0.5): low-resource languages
    // up-sampled relative to proportional; integer micro-weights from
    // IEEE sqrt keep the largest-remainder split exact
    "mix_temperature" -> ((s, dir) =>
      TextOps.mixTemperature(Tables(s, dir, "documents"), "lang", "text",
        budget = 1000000L).orderBy("lang")),
    // deterministic per-stratum k-sample (reproducible reservoir
    // equivalent): k smallest md5(id) per language, two-stage
    // shard-then-merge ranking so no whole-stratum window exists
    "sample_reservoir" -> ((s, dir) =>
      TextOps.sampleReservoir(Tables(s, dir, "documents"), "doc_id", "lang",
        k = 20).orderBy("lang", "rank")),
    // deterministic global epoch shuffle: id-derived permutation,
    // ranked per hash bucket so no whole-corpus window exists
    "sample_shuffle" -> ((s, dir) =>
      TextOps.sampleShuffle(Tables(s, dir, "documents"), "doc_id")
        .orderBy("doc_id")),
    // length-staged curriculum order: easy (short) stages first,
    // salted-hash shuffle within a stage; global pos via the same
    // bucket-offset distributed ranking as sample_shuffle
    "sample_curriculum" -> ((s, dir) =>
      TextOps.sampleCurriculum(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // stride-interleaved mixture order: sources appear token-mass-
    // proportionally in every prefix of the training order (no bursts)
    "sample_interleave" -> ((s, dir) =>
      TextOps.sampleInterleave(Tables(s, dir, "documents"), "doc_id", "text",
        "source").orderBy("ikey", "source", "doc_id")),
    // dedup observability: near-dup cluster size distribution off the
    // published pair table — the dataset-card numbers a dedup run
    // reports (how many clusters of each size, docs covered, and the
    // surviving-corpus count = number of clusters)
    "dedup_cluster_stats" -> ((s, dir) => {
      val sigs = docSignatures(s, dir).filter(col("id") < 1000)
      Dedup.components(verifiedPairs(s, dir), sigs, "id")
        .groupBy("comp").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("size")).as("n_docs"))
        .orderBy("size")
    }),
    // length-bucketed batch packing with padding-waste accounting
    "pack_buckets" -> ((s, dir) =>
      TextOps.packBuckets(Tables(s, dir, "documents"), "doc_id", "text",
        bandTokens = 16L, batchDocs = 8, nShards = 4)
        .orderBy("band", "shard", "batch_id")),
    // span-granular duplication profile (10-word spans): which docs
    // are stitched from text that exists elsewhere in the corpus
    "text_span_dedup" -> ((s, dir) =>
      TextOps.spanDedup(Tables(s, dir, "documents"), "doc_id", "text",
        k = 10).orderBy("doc_id")),
    // maximal shared token runs >= 10 between doc pairs with exact
    // start offsets and lengths — the extent form of exact substring
    // dedup (the oracle joins on RAW gram text, independently checking
    // the 48-bit fp path)
    "text_span_extents" -> ((s, dir) =>
      TextOps.spanExtents(Tables(s, dir, "documents"), "doc_id", "text",
        minRun = 10).orderBy("a_id", "b_id", "a_start", "b_start")),
    // apply the extents: every duplicated run's b-side occurrence is
    // removed from its doc (lowest-id copy survives) — exact
    // span-granular dedup, Lee et al. 2022's "keep one copy"
    "text_span_scrub" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextOps.spanScrub(docs,
        TextOps.spanExtents(docs, "doc_id", "text", minRun = 10),
        "doc_id", "text").orderBy("doc_id")
    }),
    "text_tokens" -> ((s, dir) =>
      TextOps.tokens(Tables(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),
    "text_fingerprint" -> ((s, dir) =>
      TextOps.fingerprint(Tables(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "fp_md5").orderBy("doc_id")),
    // deterministic train/val/test split: stable hash thresholds, a
    // doc never migrates splits as the corpus grows
    "sample_split" -> ((s, dir) =>
      TextOps.sampleSplit(Tables(s, dir, "documents"), "doc_id")
        .select("doc_id", "lang", "split").orderBy("doc_id")),
    // deterministic md5-gated stratified sample (integer-exact ppm
    // gate — fully SQL-oracled, same trick as sample_weighted)
    "sample_stratified" -> ((s, dir) =>
      TextOps.sampleStratified(Tables(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "fr" -> 0.25, "zh" -> 1.0), defaultRate = 0.1)
        .select("doc_id", "lang").orderBy("doc_id")),
    "mm_features" -> ((s, dir) =>
      Multimodal.featureStats(
        Multimodal.syntheticMedia(Tables(s, dir, "documents"), "doc_id", "text"))),
    // REAL pixel content decode: per-image channel sums/means off
    // deflate-compressed PNGs using all five scanline filters — the
    // values only come out right through a genuine inflate + unfilter
    // pass (PngPixels), while the oracle recomputes them
    // arithmetically from the md5-seeded pixel formula
    // perceptual 64-bit image hash off REAL pixel decodes — identical
    // pixels hash identically whatever container delivered them
    // (rows-only: DCT hash has no SQL oracle; robustness + blocking
    // exactness pinned in PHashSpec)
    "mm_image_phash" -> ((s, dir) =>
      imageSignatures(s, dir).orderBy("media_id")),
    // image near-dup pairs: the SimHash 8×8-band blocking + native
    // bucket kernel reused verbatim on phash (exact for dist ≤ 6)
    "mm_image_neardup" -> ((s, dir) => {
      val ph = imageSignatures(s, dir)
        .select(col("media_id").as("id"), col("phash").as("simhash"))
      Dedup.simhashPairsSigs(ph, maxDist = 6).orderBy("a_id", "b_id")
    }),
    // the text dedup pipeline's clustering/apply machinery, reused
    // verbatim on IMAGE near-dup pairs: phash blocking -> fixpoint
    // components -> one canonical image per perceptual cluster
    // (rows-only like its pair source; components' transitive-closure
    // properties are pinned generally in OpsSpec)
    "mm_image_dedup" -> ((s, dir) => {
      val ph = imageSignatures(s, dir)
        .select(col("media_id").as("id"), col("phash").as("simhash"))
      Dedup.components(
        Dedup.simhashPairsSigs(ph, maxDist = 6).select("a_id", "b_id"),
        ph, "id").orderBy("id")
    }),
    // spectral audio fingerprint off the real PCM parse (rows-only:
    // sign-of-band-energy bits have no SQL oracle; robustness and
    // amplitude invariance pinned in PHashSpec)
    "mm_audio_fingerprint" -> ((s, dir) =>
      Multimodal.audioFingerprint(
        Multimodal.syntheticPcmMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF().orderBy("media_id")),
    "mm_pixel_stats" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.syntheticPixelMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF().orderBy("media_id")),
    // mixed-format REAL pixel decode through magic-byte dispatch: even
    // docs are 24-bit BMPs (bottom-up padded BGR — the decoder must
    // flip both), odd docs are LZW-compressed GIFs (variable-width
    // codes + palette resolution); the oracle recomputes every channel
    // sum arithmetically from the md5 pixel formulas
    "mm_pixel_formats" -> ((s, dir) =>
      Multimodal.formatPixelStats(
        Multimodal.syntheticFormatMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF().orderBy("media_id")),
    // REAL audio sample content decode: exact integer PCM moments +
    // peak per clip, off genuine 16-bit RIFF payloads (little-endian
    // interleaved) — values only come out right through a real
    // data-chunk walk and sample parse (AvHeader.decodeWavSamples)
    "mm_audio_stats" -> ((s, dir) =>
      Multimodal.audioStats(
        Multimodal.syntheticPcmMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF().orderBy("media_id")),
    // all-modality header decode: per-row image dims, WAV sample rate/
    // channels/samples, AVI dims/frames — every value must round-trip
    // md5 bytes -> real container bytes -> format parser, row by row
    "mm_av_features" -> ((s, dir) =>
      Multimodal.extractAvFeatures(
        Multimodal.syntheticAvMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF().orderBy("media_id")),
    // audio feature-extraction windows: 16-sample frames over the REAL
    // parsed WAV header sample count (the windows an MFCC-style
    // extractor consumes; sample decode stays out of scope). Integer
    // window math => hash-exact oracle.
    "mm_audio_windows" -> ((s, dir) =>
      Multimodal.extractAvFeatures(
        Multimodal.syntheticAvMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("n_frames").as("n_samples"), col("sample_rate"),
          explode(sequence(lit(0), expr("(n_frames - 1) div 16"))).as("win_idx"))
        .withColumn("start_sample", col("win_idx") * 16)
        .withColumn("n_in_window",
          least(lit(16), col("n_samples") - col("start_sample")))
        .orderBy("media_id", "win_idx")),
    // frame-sampling PLAN for video rows: ≤ 8 stride-sampled frame
    // indices per video, computed from the REAL parsed AVI header
    // frame count (decode of frame pixels stays out of scope — no
    // codecs in-container; this is the plan a mapInPandas decoder
    // would execute). Integer stride arithmetic => hash-exact oracle.
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.extractAvFeatures(
        Multimodal.syntheticAvMedia(Tables(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .filter(col("kind") === "video")
        .withColumn("stride", expr("(n_frames + 7) div 8"))
        .select(col("media_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, col("stride")))
            .as("frame_idx"))
        .orderBy("media_id", "frame_idx")),
    // corpus-wide bigram frequencies (map-side combine + TakeOrdered)
    "text_ngram_topk" -> ((s, dir) =>
      TextOps.ngramTopK(Tables(s, dir, "documents"), "text", n = 2, k = 20)),
    // characteristic terms per doc: integer-only tf-idf ordering
    "text_keyterms" -> ((s, dir) =>
      TextOps.keyTerms(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "rank")),
    // engine-agnostic deterministic subsample (smallest md5(id))
    "sample_hash_topk" -> ((s, dir) =>
      TextOps.sampleTopKByHash(Tables(s, dir, "documents"), "doc_id", 100)),
    // snapshot drift: cross-multiplied per-token count difference
    // between the doc_id-parity corpus halves — the whole ranking is
    // exact BIGINT, no float anywhere
    "text_drift" -> ((s, dir) =>
      TextOps.snapshotDrift(Tables(s, dir, "documents"), "doc_id", "text", 10)),
    // reference-LM quality score: bigram/unigram counts trained on the
    // even-id half, every odd-id doc scored by bigram attestation —
    // exact BIGINT counts + ONE division (the perplexity-filter shape
    // without the libm/float-fold hash hazards)
    "text_lm_score" -> ((s, dir) =>
      TextOps.lmScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("id")),
    // the flagship dedup pipeline end-to-end: LSH candidates -> exact
    // jaccard verify -> fixpoint components -> canonical doc per
    // cluster. Oracled against brute-force transitive closure (the
    // LSH path must lose nothing at this threshold — OpsSpec proves
    // candidate recall; this proves the whole composition)
    "dedup_pipeline" -> ((s, dir) => {
      val sigs = docSignatures(s, dir).filter(col("id") < 1000)
      Dedup.components(verifiedPairs(s, dir), sigs, "id").orderBy("id")
    }),
    // the step every dedup pipeline actually ships: keep one
    // representative per near-dup cluster (the min doc_id — what
    // min-label components converge to) and emit the surviving corpus
    "dedup_apply" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("doc_id") < 1000)
      val sigs = docSignatures(s, dir).filter(col("id") < 1000)
      val comp = Dedup.components(verifiedPairs(s, dir), sigs, "id")
      docs.join(comp.filter(col("id") === col("comp")),
          docs("doc_id") === col("id"))
        .select(docs("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),
    // batch-equivalent of the streaming first-arrival dedup
    // (StreamIngest.dedupStream; stream==batch parity is proven over
    // MemoryStream in StreamIngestSpec): with arrival order = doc_id,
    // the survivor of each content hash is its minimum doc_id
    "stream_dedup" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("content_hash", md5(col("text")))
        .groupBy("content_hash")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_arrivals"))
        .select("doc_id", "content_hash", "n_arrivals")
        .orderBy("doc_id")),
    // benchmark decontamination: docs >= 450 play the held-out set;
    // every training doc sharing a word 5-gram with it gets flagged
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextOps.decontaminate(
        docs.filter(col("doc_id") < 450), docs.filter(col("doc_id") >= 450),
        "doc_id", "text").orderBy("doc_id")
    }),
    // the same contamination flags through the Bloom-prefilter path:
    // held-out shingles fold into one broadcast bloom_agg sketch, the
    // corpus gram stream prefilters BEFORE the exact semi-join (zero
    // false negatives + exact verify of the fpp tail == identical
    // output, so it shares the exact operator's oracle)
    "text_decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextOps.decontaminateBloom(
        docs.filter(col("doc_id") < 450), docs.filter(col("doc_id") >= 450),
        "doc_id", "text").orderBy("doc_id")
    }),
    // PII scrub: the corpus text carries no PII, so the query injects a
    // deterministic synthetic email + phone per doc (the oracle builds
    // the exact same string), then the operator counts and redacts them
    "text_pii_scrub" -> ((s, dir) => {
      val withPii = Tables(s, dir, "documents").withColumn("text",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      TextOps.piiScrub(withPii, "doc_id", "text").orderBy("doc_id")
    }),
    // semantic dedup: connected components over embedding-cosine edges
    // (composition of cosinePairs + the fixpoint components operator)
    "dedup_semantic" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Dedup.components(
        Similarity.cosinePairs(e, "vec_id", "embedding", maxId = 1000, threshold = 0.45),
        e.filter(col("vec_id") < 1000), "vec_id").orderBy("id")
    }),
  )

  private val shinglesSql =
    """sh AS (SELECT doc_id,
      |  list_distinct(list_transform(generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin

  private val cosSql = (a: String, b: String) =>
    s"""list_sum(list_transform(generate_series(1, len($a)), i ->
       |    CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform(generate_series(1, len($a)), i ->
       |    CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform(generate_series(1, len($b)), i ->
       |    CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /** Shared CTE prefix: brute-force transitive closure over
    * exact-jaccard >= 0.5 edges on doc_id < 1000, ending in
    * `lbl(id, comp)` — min-id component labels for every doc. */
  private lazy val componentsCteSql: String = s"""WITH RECURSIVE $shinglesSql,
    |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
    |       FROM sh a, sh b
    |       WHERE a.doc_id < b.doc_id AND a.doc_id < 1000 AND b.doc_id < 1000
    |         AND len(list_intersect(a.s, b.s)) /
    |           CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5),
    |e AS (SELECT a_id AS x, b_id AS y FROM pr UNION SELECT b_id, a_id FROM pr),
    |reach(x, y) AS (SELECT x, y FROM e
    |  UNION SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
    |cmp AS (SELECT x AS id, least(x, min(y)) AS comp FROM reach GROUP BY x),
    |ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 1000),
    |lbl AS (SELECT ids.id, coalesce(cmp.comp, ids.id) AS comp
    |        FROM ids LEFT JOIN cmp ON ids.id = cmp.id)""".stripMargin

  /** The ground truth for BOTH the components operator (fed brute
    * pairs) and the full LSH->verify->components pipeline. */
  private lazy val componentsOracleSql: String = s"""$componentsCteSql,
    |sz AS (SELECT comp, count(*) AS comp_size FROM lbl GROUP BY comp)
    |SELECT lbl.id, lbl.comp, sz.comp_size, lbl.id != lbl.comp AS is_dup
    |FROM lbl JOIN sz ON lbl.comp = sz.comp ORDER BY lbl.id""".stripMargin

  /** Shared by text_decontaminate and text_decontaminate_bloom: the
    * bloom prefilter has no false negatives and its hits are exactly
    * re-verified, so both operators are output-identical. */
  private val decontaminateOracleSql: String =
    """WITH sh AS (SELECT doc_id,
      |  list_distinct(list_transform(generate_series(1, len(w) - 4),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |      w[i+3] || ' ' || w[i+4])) AS s
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id >= 450),
      |hit AS (SELECT DISTINCT doc_id FROM
      |  (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id < 450) t
      |  WHERE g IN (SELECT g FROM b))
      |SELECT sh.doc_id, sh.doc_id IN (SELECT doc_id FROM hit) AS is_contaminated
      |FROM sh WHERE sh.doc_id < 450 ORDER BY sh.doc_id""".stripMargin

  /** The sim_kmeans oracle is DATA-DEPENDENT: the trained ≤ k-row
    * centroid model becomes SQL literals when the query runs. Verify
    * dumps oracle_sql.json AFTER the query loop, so the stash is
    * always populated for the driver's compare; an unpopulated stash
    * (query filtered out or failed) just leaves sim_kmeans rows-only,
    * as before r18. Doubles export via Double.toString (round-trips
    * exactly) with an e0 suffix so DuckDB types them DOUBLE, never
    * DECIMAL; the per-centroid norm is precomputed in the kernel's
    * index order, and the oracle's per-vector dot/norm fold through
    * list_sum in the same index order. */
  @volatile private var kmeansOracleSql: Option[String] = None

  private def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  private def stashKmeansOracle(cents: Array[(Int, Array[Float])]): Unit = {
    val rows = cents.sortBy(_._1).map { case (c, cw) =>
      var nb = 0.0
      var i = 0
      while (i < cw.length) { nb += cw(i).toDouble * cw(i).toDouble; i += 1 }
      s"($c, [${cw.map(f => dlit(f.toDouble)).mkString(", ")}], ${dlit(nb)})"
    }
    kmeansOracleSql = Some(
      s"""WITH c(cluster, centroid, nb) AS (VALUES
        |  ${rows.mkString(",\n  ")}),
        |d AS (SELECT e.vec_id, c.cluster,
        |    list_sum(list_transform(list_zip(e.embedding, c.centroid),
        |      p -> CAST(p[1] AS DOUBLE) * p[2])) AS dot,
        |    list_sum(list_transform(e.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
        |    c.nb AS nb
        |  FROM embeddings e CROSS JOIN c),
        |a AS (SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, cluster) AS rn FROM d),
        |m AS (SELECT vec_id AS id, cluster FROM a WHERE rn = 1),
        |s AS (SELECT cluster, count(*) AS n_members FROM m GROUP BY cluster)
        |SELECT m.id, CAST(m.cluster AS BIGINT) AS cluster, s.n_members
        |FROM m JOIN s USING (cluster) ORDER BY m.id""".stripMargin)
  }

  def oracleSql: Map[String, String] = staticOracleSql ++
    kmeansOracleSql.map("sim_kmeans" -> _).toMap

  private val staticOracleSql: Map[String, String] = Map(
    // one pinned (op, pass=true) row per approximate path, generated
    // from the same floor map the Spark side reads — a measured recall
    // below its floor flips the Spark row to pass=false and the gate
    // hash-fails; the floors themselves cannot drift out of sync
    "quality_recall_gate" -> (recallFloorBp.keys.toSeq.sorted
      .map(k => s"SELECT '$k' AS op, true AS pass")
      .mkString("", " UNION ALL ", " ORDER BY op")),
    "dedup_pipeline" -> componentsOracleSql,
    "dedup_apply" -> s"""$componentsCteSql
      |SELECT d.doc_id, d.lang, d.source, d.n_chars
      |FROM documents d JOIN lbl ON d.doc_id = lbl.id
      |WHERE lbl.id = lbl.comp ORDER BY d.doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
        |g AS (SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |      FROM h GROUP BY 1)
        |SELECT h.doc_id, h.content_hash, g.keep_id, g.n_copies,
        |  h.doc_id != g.keep_id AS is_dup
        |FROM h JOIN g USING (content_hash) ORDER BY h.doc_id""".stripMargin,
    // the brute >= τ pair set IS the verify output: every qualifying
    // pair in this corpus has J >= 0.9, where a 16-band×4-row miss has
    // probability (1 - 0.9^4)^16 ≈ 3e-8 — and OpsSpec pins
    // verified == brute exactly. Shingles here replicate the
    // shingle_hashes kernel (split on single spaces, word 3-grams
    // joined by ' ', whole text when < 3 words, distinct), via a
    // shared-shingle inverted join rather than all-pairs.
    "dedup_minhash_verify" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |msh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(ws[i : least(i+2, len(ws))], ' ')
        |     for i in range(1, greatest(len(ws) - 2, 1) + 1)])) AS g
        |  FROM words),
        |sizes AS (SELECT doc_id, count(*) AS n FROM msh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        |          FROM msh a JOIN msh b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT i.a_id, i.b_id, i.n_common,
        |       CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
        |FROM inter i JOIN sizes sa ON i.a_id = sa.doc_id
        |             JOIN sizes sb ON i.b_id = sb.doc_id
        |WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // same brute Jaccard-pair truth as dedup_minhash_verify (LSH pair
    // recall vs that truth is gated at 100%), narrowed by the exact
    // integer edit-distance test the op applies
    "dedup_edit_verify" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |msh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(ws[i : least(i+2, len(ws))], ' ')
        |     for i in range(1, greatest(len(ws) - 2, 1) + 1)])) AS g
        |  FROM words),
        |sizes AS (SELECT doc_id, count(*) AS n FROM msh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        |          FROM msh a JOIN msh b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |cand AS (SELECT i.a_id, i.b_id
        |         FROM inter i JOIN sizes sa ON i.a_id = sa.doc_id
        |                      JOIN sizes sb ON i.b_id = sb.doc_id
        |         WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.5)
        |SELECT c.a_id, c.b_id,
        |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
        |  CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len
        |FROM cand c JOIN documents da ON c.a_id = da.doc_id
        |            JOIN documents db ON c.b_id = db.doc_id
        |WHERE levenshtein(da.text, db.text) * 1000
        |  <= greatest(length(da.text), length(db.text)) * 20
        |ORDER BY a_id, b_id""".stripMargin,
    // the prefix-join output must equal the unbounded brute set — the
    // oracle is the same inverted-join SQL without the id cap
    // inverted-index form of the brute truth (join on shared shingle,
    // count per pair): identical rows/values/dtypes to the all-pairs
    // list_intersect spelling — zero-intersection pairs can never pass
    // 0.5 — but linear in shared-shingle occurrences instead of
    // quadratic in docs (~30 DuckDB-minutes -> <1 s at sf0.1)
    "text_containment_join" -> s"""WITH $shinglesSql,
      |u AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
      |sz AS (SELECT doc_id, len(s) AS n FROM sh),
      |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      |      FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT i.a_id, i.b_id, i.n_common,
      |  i.n_common / CAST(sa.n AS DOUBLE) AS c_a_in_b,
      |  i.n_common / CAST(sb.n AS DOUBLE) AS c_b_in_a
      |FROM i JOIN sz sa ON i.a_id = sa.doc_id
      |       JOIN sz sb ON i.b_id = sb.doc_id
      |WHERE greatest(i.n_common / CAST(sa.n AS DOUBLE),
      |               i.n_common / CAST(sb.n AS DOUBLE)) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin,
    // containment replicates the shingle kernel the same way the
    // verify oracle does; both directions emitted, either ≥ 0.5
    "text_containment" -> s"""WITH $shinglesSql
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.s, b.s)) AS n_common,
      |  len(list_intersect(a.s, b.s)) / CAST(len(a.s) AS DOUBLE) AS c_a_in_b,
      |  len(list_intersect(a.s, b.s)) / CAST(len(b.s) AS DOUBLE) AS c_b_in_a
      |FROM sh a, sh b
      |WHERE a.doc_id < 1000 AND b.doc_id < 1000 AND a.doc_id < b.doc_id
      |  AND greatest(
      |    len(list_intersect(a.s, b.s)) / CAST(len(a.s) AS DOUBLE),
      |    len(list_intersect(a.s, b.s)) / CAST(len(b.s) AS DOUBLE)) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin,
    "dedup_ngram_jaccard" -> s"""WITH $shinglesSql
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.s, b.s)) AS n_common,
      |  len(list_intersect(a.s, b.s)) /
      |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
      |FROM sh a, sh b
      |WHERE a.doc_id < b.doc_id AND a.doc_id < 1000 AND b.doc_id < 1000
      |  AND len(list_intersect(a.s, b.s)) /
      |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin,
    "dedup_components" -> componentsOracleSql,
    "dedup_incremental" -> s"""WITH $shinglesSql
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.s, b.s)) AS n_common,
      |  len(list_intersect(a.s, b.s)) /
      |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
      |FROM sh a, sh b
      |WHERE a.doc_id < b.doc_id AND a.doc_id < 1000 AND b.doc_id < 1000
      |  AND (a.doc_id >= 400 OR b.doc_id >= 400)
      |  AND len(list_intersect(a.s, b.s)) /
      |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin,
    "dedup_embedding" -> s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  ${cosSql("a.embedding", "b.embedding")} AS cos
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000
      |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.45
      |ORDER BY a_id, b_id""".stripMargin,
    "sim_range_search" -> s"""SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |  ${cosSql("q.embedding", "n.embedding")} AS cos
      |FROM embeddings q, embeddings n
      |WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
      |  AND ${cosSql("q.embedding", "n.embedding")} >= 0.3
      |ORDER BY q_id, n_id""".stripMargin,
    "sim_topk" -> s"""SELECT q_id, rank, n_id, cos FROM (
      |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    ${cosSql("q.embedding", "n.embedding")} AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, n.vec_id) AS rank
      |  FROM embeddings q, embeddings n
      |  WHERE q.vec_id < 10 AND n.vec_id != q.vec_id)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "text_langid" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(ws, x -> x IN ('der','die','und','das','ein'))) AS score_de,
        |  len(list_filter(ws, x -> x IN ('the','a','of','and','to'))) AS score_en,
        |  len(list_filter(ws, x -> x IN ('el','los','las','una','y'))) AS score_es,
        |  len(list_filter(ws, x -> x IN ('le','la','et','les','des'))) AS score_fr,
        |  len(list_filter(ws, x -> x IN ('的','了','是','在','我'))) AS score_zh
        |FROM w)
        |SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
        |  CASE WHEN greatest(score_de, score_en, score_es, score_fr, score_zh) = 0 THEN 'und'
        |       WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
        |       WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
        |       WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
        |       WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,
    // the integer-exact hash gate replicated digit-by-digit (DuckDB
    // has no hex->int conv; the 8-hex-digit sum is exact in doubles)
    "sample_weighted" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE CAST(list_sum(list_transform(generate_series(1, 8), i ->
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
        |      * power(16, 8 - i))) AS BIGINT) * 2000
        |  < CAST(n_chars AS BIGINT) * 4294967296
        |ORDER BY doc_id""".stripMargin,
    // the split thresholds replicated on the same 8-hex-digit hash
    "sample_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN hval * 1000000 < 50000 * 4294967296 THEN 'val'
        |       WHEN hval * 1000000 < 100000 * 4294967296 THEN 'test'
        |       ELSE 'train' END AS split
        |FROM (SELECT doc_id, lang,
        |  CAST(list_sum(list_transform(generate_series(1, 8), i ->
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(doc_id AS VARCHAR) || ':split:42'), i, 1)) - 1)
        |      * power(16, 8 - i))) AS BIGINT) AS hval
        |  FROM documents) ORDER BY doc_id""".stripMargin,
    // the same 8-hex-digit md5 gate, salted, with per-stratum ppm rates
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(list_sum(list_transform(generate_series(1, 8), i ->
        |    (strpos('0123456789abcdef',
        |       substr(md5(CAST(doc_id AS VARCHAR) || ':42'), i, 1)) - 1)
        |      * power(16, 8 - i))) AS BIGINT) * 1000000
        |  < (CASE lang WHEN 'en' THEN 500000 WHEN 'fr' THEN 250000
        |      WHEN 'zh' THEN 1000000 ELSE 100000 END) * 4294967296
        |ORDER BY doc_id""".stripMargin,
    "text_token_budget" ->
      """WITH w AS (SELECT doc_id, source, length(text) AS n_chars,
        |  string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n_tokens,
        |  len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE) * 0.5 +
        |  len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is')))
        |    / CAST(len(ws) AS DOUBLE) * 0.2 +
        |  least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
        |FROM w),
        |r AS (SELECT doc_id, source, n_tokens, quality_score,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY quality_score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        |FROM c)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(quality_score * 1000) AS BIGINT) AS quality_milli, cum_tokens
        |FROM r WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH w AS (SELECT doc_id, source, doc_id % 8 AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents),
        |c AS (SELECT doc_id, source, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - n_tokens AS start_offset
        |FROM w)
        |SELECT doc_id, source, shard, n_tokens, start_offset,
        |  start_offset // 1024 AS seq_id, start_offset % 1024 AS offset_in_seq
        |FROM c ORDER BY doc_id""".stripMargin,
    "mix_allocate" ->
      """WITH t AS (SELECT lang,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY lang),
        |s AS (SELECT lang, n_tokens,
        |  CAST(sum(n_tokens) OVER () AS BIGINT) AS total FROM t),
        |f AS (SELECT lang, n_tokens, total,
        |  CAST((1000000 * n_tokens) // total AS BIGINT) AS fl,
        |  CAST((1000000 * n_tokens) % total AS BIGINT) AS rem FROM s),
        |r AS (SELECT lang, n_tokens, fl, rem,
        |  row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |  CAST(1000000 - sum(fl) OVER () AS BIGINT) AS short FROM f)
        |SELECT lang, n_tokens,
        |  CAST(fl + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_tokens
        |FROM r ORDER BY lang""".stripMargin,
    "text_winnowing" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(1, len(ws) - 4 + 2),
        |          j -> CAST(('0x' || substr(md5(array_to_string(ws[j:j+3], ' ')),
        |                     1, 12)) AS BIGINT)) AS hs
        |      FROM w WHERE len(ws) >= 4),
        |s AS (SELECT doc_id, hs, least(8, len(hs)) AS wl FROM g),
        |f AS (SELECT doc_id,
        |        list_transform(range(1, len(hs) - wl + 2),
        |          i -> {'pos': i + wl -
        |                  list_position(list_reverse(hs[i:i+wl-1]),
        |                                list_min(hs[i:i+wl-1])),
        |                'fp': list_min(hs[i:i+wl-1])}) AS fps
        |      FROM s)
        |SELECT DISTINCT doc_id, u.pos AS pos, u.fp AS fp
        |FROM f, LATERAL UNNEST(fps) AS t(u)
        |ORDER BY doc_id, pos, fp""".stripMargin,
    "text_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, len(ws) AS n FROM w),
        |k AS (SELECT doc_id, ws, n,
        |  CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END AS nc FROM n)
        |SELECT doc_id, CAST(u AS BIGINT) AS chunk_idx,
        |  CAST(u * 48 AS BIGINT) AS start_token,
        |  CAST(least(64, n - u * 48) AS BIGINT) AS n_tokens,
        |  CAST(('0x' || substr(md5(array_to_string(
        |    ws[u*48+1 : u*48+least(64, n-u*48)], ' ')), 1, 12)) AS BIGINT) AS fp
        |FROM (SELECT doc_id, ws, n, UNNEST(range(0, nc)) AS u FROM k)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, len(ws) AS n FROM w),
        |k AS (SELECT doc_id, ws, n,
        |  CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END AS nc FROM n),
        |c AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(array_to_string(
        |    ws[u*48+1 : u*48+least(64, n-u*48)], ' ')), 1, 12)) AS BIGINT) AS fp
        |FROM (SELECT doc_id, ws, n, UNNEST(range(0, nc)) AS u FROM k)),
        |t AS (SELECT fp, count(*) AS tot FROM c GROUP BY 1)
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_chunks,
        |  CAST(sum(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END) * 1000 // count(*)
        |    AS BIGINT) AS dup_milli
        |FROM c JOIN t USING (fp)
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,
    // same winnow CTE, inverted: distinct (doc, fp) -> df cap (<= 50)
    // -> fp self-join -> pairs with >= 3 shared fingerprints
    "dedup_winnow" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(1, len(ws) - 4 + 2),
        |          j -> CAST(('0x' || substr(md5(array_to_string(ws[j:j+3], ' ')),
        |                     1, 12)) AS BIGINT)) AS hs
        |      FROM w WHERE len(ws) >= 4),
        |s AS (SELECT doc_id, hs, least(8, len(hs)) AS wl FROM g),
        |f AS (SELECT doc_id,
        |        list_transform(range(1, len(hs) - wl + 2),
        |          i -> list_min(hs[i:i+wl-1])) AS fps
        |      FROM s),
        |d AS (SELECT DISTINCT doc_id, UNNEST(fps) AS fp FROM f),
        |keep AS (SELECT fp FROM d GROUP BY fp HAVING count(*) <= 50),
        |e AS (SELECT d.doc_id, d.fp FROM d JOIN keep USING (fp))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
        |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY a_id, b_id""".stripMargin,
    "mix_temperature" ->
      """WITH t AS (SELECT lang,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY lang),
        |q AS (SELECT lang, n_tokens,
        |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS wq
        |FROM t),
        |s AS (SELECT lang, n_tokens, wq,
        |  CAST(sum(wq) OVER () AS BIGINT) AS total FROM q),
        |f AS (SELECT lang, n_tokens, wq, total,
        |  CAST((1000000 * wq) // total AS BIGINT) AS fl,
        |  CAST((1000000 * wq) % total AS BIGINT) AS rem FROM s),
        |r AS (SELECT lang, n_tokens, wq, fl, rem,
        |  row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |  CAST(1000000 - sum(fl) OVER () AS BIGINT) AS short FROM f)
        |SELECT lang, n_tokens, wq,
        |  CAST(fl + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_tokens
        |FROM r ORDER BY lang""".stripMargin,
    "sample_reservoir" ->
      """WITH h AS (SELECT doc_id, lang,
        |  md5(CAST(doc_id AS VARCHAR) || ':res:42') AS h FROM documents)
        |SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |    AS BIGINT) AS rank
        |FROM h
        |QUALIFY rank <= 20
        |ORDER BY lang, rank""".stripMargin,
    // per-source rank by (md5, id), stride key all-integer: the op's
    // bucket-offset ranks concatenate to exactly this window rank
    "sample_interleave" ->
      """WITH h AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  md5(CAST(doc_id AS VARCHAR) || ':ilv:42') AS h FROM documents),
        |r AS (SELECT doc_id, source, n_tokens, h,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS src_rank FROM h),
        |w AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS w FROM h GROUP BY 1)
        |SELECT r.doc_id, r.source, r.src_rank,
        |  CAST((r.src_rank * 2 + 1) * 1000000000000 // (w.w * 2) AS BIGINT) AS ikey
        |FROM r JOIN w ON r.source = w.source
        |ORDER BY ikey, r.source, doc_id""".stripMargin,
    "dedup_cluster_stats" -> s"""$componentsCteSql,
      |sz AS (SELECT comp, count(*) AS size FROM lbl GROUP BY comp)
      |SELECT size, count(*) AS n_clusters,
      |  CAST(count(*) * size AS BIGINT) AS n_docs
      |FROM sz GROUP BY size ORDER BY size""".stripMargin,
    // global rank by (md5, id) == bucket offset + in-bucket rank: the
    // hex string orders identically to its first-byte numeric bucket
    "sample_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  md5(CAST(doc_id AS VARCHAR) || ':shuffle:42') AS h FROM documents)
        |SELECT doc_id,
        |  CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
        |       (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS BIGINT)
        |    AS bucket,
        |  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    // curriculum pos = rank over (stage, h, id); the op's per-(stage,
    // bucket) offsets + in-bucket ranks concatenate to exactly this
    "sample_curriculum" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  md5(CAST(doc_id AS VARCHAR) || ':cur:42') AS h FROM documents),
        |s AS (SELECT doc_id, n_tokens, h,
        |  CAST(CASE WHEN n_tokens < 40 THEN 0 WHEN n_tokens < 80 THEN 1
        |            WHEN n_tokens < 160 THEN 2 ELSE 3 END AS BIGINT) AS stage
        |FROM c)
        |SELECT doc_id, stage, n_tokens,
        |  CAST(row_number() OVER (ORDER BY stage, h, doc_id) - 1 AS BIGINT) AS pos
        |FROM s ORDER BY doc_id""".stripMargin,
    "pack_buckets" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents),
        |b AS (SELECT doc_id, n_tokens, n_tokens // 16 AS band,
        |  doc_id % 4 AS shard FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY band, shard
        |  ORDER BY doc_id) - 1 AS rk FROM b)
        |SELECT band, shard, rk // 8 AS batch_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  max(n_tokens) AS max_tokens,
        |  count(*) * max(n_tokens) AS padded_tokens,
        |  count(*) * max(n_tokens) - CAST(sum(n_tokens) AS BIGINT)
        |    AS waste_tokens
        |FROM r GROUP BY 1, 2, 3 ORDER BY band, shard, batch_id""".stripMargin,
    "text_span_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |sp AS (SELECT doc_id,
        |  unnest(list_transform(generate_series(1, len(ws) - 9), i ->
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] ||
        |    ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' ||
        |    ws[i+7] || ' ' || ws[i+8] || ' ' || ws[i+9])) AS g
        |FROM w),
        |c AS (SELECT doc_id, g, count(*) AS c FROM sp GROUP BY 1, 2),
        |t AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.doc_id, CAST(sum(c.c) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN t.tot >= 2 THEN c.c ELSE 0 END) AS BIGINT)
        |    AS n_dup_spans,
        |  (1000 * CAST(sum(CASE WHEN t.tot >= 2 THEN c.c ELSE 0 END)
        |    AS BIGINT)) // CAST(sum(c.c) AS BIGINT) AS dup_milli
        |FROM c JOIN t USING (g) GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // brute-force extents off RAW gram text (no hash anywhere): all
    // 10-gram positions, the same df <= 50 boilerplate cap, pair join
    // on gram EQUALITY, gaps-and-islands per alignment diagonal
    "text_span_extents" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |sp AS (SELECT doc_id,
        |  unnest(list_transform(generate_series(1, len(ws) - 9), i ->
        |    {'pos': i - 1, 'g':
        |      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] ||
        |      ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' ||
        |      ws[i+7] || ' ' || ws[i+8] || ' ' || ws[i+9]})) AS u
        |  FROM w),
        |g0 AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM sp),
        |keep AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
        |    FROM g0 GROUP BY g) WHERE df <= 50),
        |g1 AS (SELECT g0.doc_id, g0.pos, g0.g FROM g0 JOIN keep USING (g)),
        |m AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.pos AS a_pos, b.pos AS b_pos
        |  FROM g1 a JOIN g1 b ON a.g = b.g AND a.doc_id < b.doc_id),
        |i AS (SELECT a_id, b_id, a_pos, b_pos, a_pos - b_pos AS diag,
        |    a_pos - row_number() OVER (
        |      PARTITION BY a_id, b_id, a_pos - b_pos ORDER BY a_pos) AS isl
        |  FROM m)
        |SELECT a_id, b_id, CAST(min(a_pos) AS BIGINT) AS a_start,
        |  CAST(min(b_pos) AS BIGINT) AS b_start,
        |  CAST(count(*) + 9 AS BIGINT) AS run_tokens
        |FROM i GROUP BY a_id, b_id, diag, isl
        |ORDER BY a_id, b_id, a_start, b_start""".stripMargin,
    // scrub = the same brute extents, then drop every b-side-covered
    // token and reassemble in position order
    "text_span_scrub" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |sp AS (SELECT doc_id,
        |  unnest(list_transform(generate_series(1, len(ws) - 9), i ->
        |    {'pos': i - 1, 'g':
        |      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] ||
        |      ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' ||
        |      ws[i+7] || ' ' || ws[i+8] || ' ' || ws[i+9]})) AS u
        |  FROM w),
        |g0 AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM sp),
        |keep AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
        |    FROM g0 GROUP BY g) WHERE df <= 50),
        |g1 AS (SELECT g0.doc_id, g0.pos, g0.g FROM g0 JOIN keep USING (g)),
        |m AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.pos AS a_pos, b.pos AS b_pos
        |  FROM g1 a JOIN g1 b ON a.g = b.g AND a.doc_id < b.doc_id),
        |i AS (SELECT a_id, b_id, a_pos, b_pos, a_pos - b_pos AS diag,
        |    a_pos - row_number() OVER (
        |      PARTITION BY a_id, b_id, a_pos - b_pos ORDER BY a_pos) AS isl
        |  FROM m),
        |ext AS (SELECT b_id, min(b_pos) AS b_start,
        |    count(*) + 9 AS run_tokens
        |  FROM i GROUP BY a_id, b_id, diag, isl),
        |spans AS (SELECT b_id AS doc_id, b_start AS s,
        |    b_start + run_tokens AS e FROM ext),
        |toks AS (SELECT doc_id, u.p AS p, u.tok AS tok
        |  FROM (SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(ws)), i -> {'p': i - 1, 'tok': ws[i]})) AS u
        |    FROM w) q),
        |kept AS (SELECT t.doc_id, t.p, t.tok FROM toks t
        |  WHERE NOT EXISTS (SELECT 1 FROM spans sp2
        |    WHERE sp2.doc_id = t.doc_id AND t.p >= sp2.s AND t.p < sp2.e)),
        |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nkept,
        |    string_agg(tok, ' ' ORDER BY p) AS text_scrubbed
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(reb.text_scrubbed, '') AS text_scrubbed,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) - coalesce(nkept, 0)
        |    AS n_removed
        |FROM documents d LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH w AS (SELECT doc_id, length(text) AS n_chars,
        |  string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, n_chars, len(ws) AS n_words,
        |  len(list_distinct(ws)) AS n_uniq,
        |  len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM w)
        |SELECT doc_id, n_chars, n_words, n_uniq, n_stop,
        |  n_uniq / CAST(n_words AS DOUBLE) AS uniq_ratio,
        |  n_stop / CAST(n_words AS DOUBLE) AS stop_ratio,
        |  (n_chars - n_words + 1) / CAST(n_words AS DOUBLE) AS avg_word_len,
        |  n_uniq / CAST(n_words AS DOUBLE) * 0.5 + n_stop / CAST(n_words AS DOUBLE) * 0.2 +
        |    least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_re,
        |  len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]{1,3}')) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // image dims must round-trip md5 bytes -> PNG IHDR -> header parser;
    // the oracle recomputes them straight from the md5 (45 = fixture
    // PNG byte length: 8 sig + 25 IHDR + 12 IEND)
    "mm_features" ->
      """WITH m AS (SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  md5(text) AS hx FROM documents),
        |b AS (SELECT doc_id, kind,
        |  CAST('0x' || substr(hx, 1, 2) AS INT) AS b0,
        |  CAST('0x' || substr(hx, 3, 2) AS INT) AS b1
        |FROM m)
        |SELECT kind, count(*) AS n,
        |  CAST(count(*) * (CASE WHEN kind = 'image' THEN 45 ELSE 16 END) AS BIGINT)
        |    AS total_bytes,
        |  max(b0 % 64 + 1) AS max_w, max(b1 % 64 + 1) AS max_h
        |FROM b GROUP BY kind ORDER BY kind""".stripMargin,
    // channel sums recomputed arithmetically per format: a row only
    // matches if the BMP path really row-flipped + BGR-swapped and the
    // GIF path really LZW-decoded + palette-resolved
    "mm_pixel_formats" ->
      """WITH b AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(text), 1, 2) AS INT) AS b0,
        |  CAST('0x' || substr(md5(text), 3, 2) AS INT) AS b1,
        |  CAST('0x' || substr(md5(text), 5, 2) AS INT) AS b2,
        |  CAST('0x' || substr(md5(text), 7, 2) AS INT) AS b3,
        |  CAST('0x' || substr(md5(text), 9, 2) AS INT) % 48 + 4 AS w,
        |  CAST('0x' || substr(md5(text), 11, 2) AS INT) % 48 + 4 AS h
        |FROM documents),
        |s AS (SELECT doc_id, w, h,
        |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'gif' END AS fmt,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN h * list_sum([(b0 + x) % 256 for x in range(0, w)])
        |    ELSE list_sum([list_sum([(b0 + (3*x + 7*y + b3) % 256) % 256
        |      for y in range(0, h)]) for x in range(0, w)]) END AS sr,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN w * list_sum([(b1 + y) % 256 for y in range(0, h)])
        |    ELSE list_sum([list_sum([(b1 + (3*x + 7*y + b3) % 256) % 256
        |      for y in range(0, h)]) for x in range(0, w)]) END AS sg,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN list_sum([list_sum([(b2 + x + y) % 256 for y in range(0, h)])
        |      for x in range(0, w)])
        |    ELSE list_sum([list_sum([(b2 + (3*x + 7*y + b3) % 256) % 256
        |      for y in range(0, h)]) for x in range(0, w)]) END AS sb
        |FROM b)
        |SELECT doc_id AS media_id, fmt, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g,
        |  CAST(sb AS BIGINT) AS sum_b
        |FROM s ORDER BY media_id""".stripMargin,
    // PCM moments recomputed arithmetically from the md5-seeded sample
    // formula — Spark's numbers come from a real RIFF walk + 16-bit
    // little-endian sample parse, so an offset/endianness bug cannot
    // cancel
    "mm_audio_stats" ->
      """WITH b AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(text), 1, 2) AS INT) AS b0,
        |  CAST('0x' || substr(md5(text), 3, 2) AS INT) AS b1,
        |  CAST('0x' || substr(md5(text), 5, 2) AS INT) % 2 + 1 AS ch,
        |  CAST('0x' || substr(md5(text), 7, 2) AS INT) % 400 + 50 AS frames,
        |  (CAST('0x' || substr(md5(text), 9, 2) AS INT) % 4 + 1) * 11025 AS rate
        |FROM documents),
        |v AS (SELECT doc_id, rate, ch, frames, frames * ch AS n,
        |  [((b0 + 1) * (i + 1) + 7 * b1) % 65536 - 32768
        |   for i in range(0, frames * ch)] AS s
        |FROM b)
        |SELECT doc_id AS media_id, rate AS sample_rate, ch AS channels,
        |  frames AS n_frames, CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_sum(s) AS BIGINT) AS sum_pcm,
        |  CAST(list_sum([x * x for x in s]) AS BIGINT) AS sum_sq,
        |  CAST(list_max([abs(x) for x in s]) AS INT) AS peak,
        |  CAST(list_sum(s) AS DOUBLE) / n AS mean_pcm,
        |  CAST(list_sum([x * x for x in s]) AS DOUBLE) / n AS mean_square
        |FROM v ORDER BY media_id""".stripMargin,
    // channel sums recomputed arithmetically from the md5-seeded pixel
    // formula — Spark's numbers come from a real inflate + unfilter of
    // the compressed scanlines, so a filter/inflate bug cannot cancel
    "mm_pixel_stats" ->
      """WITH b AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(text), 1, 2) AS INT) AS b0,
        |  CAST('0x' || substr(md5(text), 3, 2) AS INT) AS b1,
        |  CAST('0x' || substr(md5(text), 5, 2) AS INT) AS b2,
        |  CAST('0x' || substr(md5(text), 9, 2) AS INT) % 48 + 4 AS w,
        |  CAST('0x' || substr(md5(text), 11, 2) AS INT) % 48 + 4 AS h
        |FROM documents),
        |s AS (SELECT doc_id, w, h,
        |  h * list_sum([(b0 + x) % 256 for x in range(0, w)]) AS sr,
        |  w * list_sum([(b1 + y) % 256 for y in range(0, h)]) AS sg,
        |  list_sum([list_sum([(b2 + x + y) % 256 for y in range(0, h)])
        |            for x in range(0, w)]) AS sb
        |FROM b)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g,
        |  CAST(sb AS BIGINT) AS sum_b,
        |  CAST(sr AS DOUBLE) / (w * h) AS mean_r,
        |  CAST(sg AS DOUBLE) / (w * h) AS mean_g,
        |  CAST(sb AS DOUBLE) / (w * h) AS mean_b
        |FROM s ORDER BY media_id""".stripMargin,
    // every feature recomputed straight from the md5 bytes the fixture
    // containers encode — a row matches only if the WAV/AVI/PNG parser
    // read the real header correctly
    "mm_av_features" ->
      """WITH b AS (SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST('0x' || substr(md5(text), 1, 2) AS INT) AS b0,
        |  CAST('0x' || substr(md5(text), 3, 2) AS INT) AS b1,
        |  CAST('0x' || substr(md5(text), 5, 2) AS INT) AS b2
        |FROM documents)
        |SELECT doc_id AS media_id, kind,
        |  CAST(CASE kind WHEN 'image' THEN 45
        |    WHEN 'audio' THEN 44 + 2 * (b1 % 2 + 1) * (b2 % 64 + 1)
        |    ELSE 88 END AS INT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE b0 % 64 + 1 END AS INT) AS width,
        |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE b1 % 64 + 1 END AS INT) AS height,
        |  CAST(CASE WHEN kind = 'audio' THEN (b0 % 4 + 1) * 11025 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN kind = 'audio' THEN b1 % 2 + 1 ELSE 0 END AS INT) AS channels,
        |  CAST(CASE kind WHEN 'audio' THEN b2 % 64 + 1
        |    WHEN 'video' THEN b2 % 1000 + 1 ELSE 0 END AS INT) AS n_frames
        |FROM b ORDER BY media_id""".stripMargin,
    "mm_audio_windows" ->
      """WITH b AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(text), 1, 2) AS INT) % 4 * 11025 + 11025 AS sample_rate,
        |  CAST('0x' || substr(md5(text), 5, 2) AS INT) % 64 + 1 AS n_samples
        |FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id AS media_id, CAST(n_samples AS INT) AS n_samples,
        |  CAST(sample_rate AS INT) AS sample_rate,
        |  CAST(w AS INT) AS win_idx, CAST(w * 16 AS INT) AS start_sample,
        |  CAST(least(16, n_samples - w * 16) AS INT) AS n_in_window
        |FROM b, unnest(generate_series(0, (n_samples - 1) // 16)) AS t(w)
        |ORDER BY media_id, win_idx""".stripMargin,
    "mm_frame_sample" ->
      """WITH b AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(text), 5, 2) AS INT) % 1000 + 1 AS n_frames
        |FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id AS media_id, CAST(n_frames AS INT) AS n_frames,
        |  CAST(unnest(generate_series(0, n_frames - 1, (n_frames + 7) // 8)) AS INT)
        |    AS frame_idx
        |FROM b ORDER BY media_id, frame_idx""".stripMargin,
    "text_filter_apply" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_uniq,
        |  len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop
        |FROM w)
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, c.n_words, c.n_uniq
        |FROM documents d JOIN c USING (doc_id)
        |WHERE length(d.text) >= 100 AND c.n_words >= 20
        |  AND c.n_uniq * 2 >= c.n_words AND c.n_stop > 0
        |ORDER BY d.doc_id""".stripMargin,
    "text_corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        |  min(length(text)) AS min_chars, max(length(text)) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "sim_norms" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |  sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "text_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |per AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_grams,
        |  count(*) AS n_uniq_grams,
        |  CAST(max(c) AS BIGINT) AS top_gram_n,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_rep_grams,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) /
        |    CAST(sum(c) AS DOUBLE) AS dup_gram_frac,
        |  CAST(max(c) AS BIGINT) / CAST(sum(c) AS DOUBLE) AS top_gram_frac
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_ngram_topk" ->
      """SELECT ngram, count(*) AS cnt FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1])) AS ngram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents))
        |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin,
    // drift ranking is exact BIGINT cross-multiplication — no float
    "text_drift" ->
      """WITH tok AS (SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) WHERE len(tok) > 0),
        |c AS (SELECT tok,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM tok GROUP BY tok),
        |t AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
        |    CAST(sum(c1) AS BIGINT) AS n1 FROM c)
        |SELECT tok, c0, c1, abs(c0 * n1 - c1 * n0) AS drift
        |FROM c, t ORDER BY drift DESC, tok LIMIT 10""".stripMargin,
    "text_lm_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT doc_id, doc_id % 2 = 0 AS ref, ws[i] AS w1, ws[i+1] AS w2
        |  FROM (SELECT doc_id, ws,
        |    unnest(generate_series(1, len(ws) - 1)) AS i FROM w)),
        |rb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg WHERE ref GROUP BY w1, w2),
        |ru AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
        |  SELECT unnest(ws) AS w1 FROM w WHERE doc_id % 2 = 0) GROUP BY w1)
        |SELECT t.doc_id AS id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN rb.c12 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hits,
        |  CAST(sum(CASE WHEN ru.c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(sum(coalesce(rb.c12, 0)) AS BIGINT) AS evidence,
        |  CAST(sum(CASE WHEN rb.c12 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS hit_ratio
        |FROM bg t LEFT JOIN rb ON t.w1 = rb.w1 AND t.w2 = rb.w2
        |          LEFT JOIN ru ON t.w1 = ru.w1
        |WHERE NOT t.ref
        |GROUP BY t.doc_id ORDER BY id""".stripMargin,
    "text_keyterms" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY doc_id, term),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT doc_id, rank, term, tf, df FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, dfx.df ASC, tf.term) AS rank
        |  FROM tf JOIN dfx USING (term))
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "sample_hash_topk" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
        |ORDER BY h, doc_id LIMIT 100""".stripMargin,
    "text_decontaminate" -> decontaminateOracleSql,
    // the bloom path must be output-identical to the exact operator
    "text_decontaminate_bloom" -> decontaminateOracleSql,
    "stream_dedup" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS content_hash,
        |  count(*) AS n_arrivals
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or +1-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "dedup_semantic" -> s"""WITH RECURSIVE
      |pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |       FROM embeddings a, embeddings b
      |       WHERE a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000
      |         AND ${cosSql("a.embedding", "b.embedding")} >= 0.45),
      |e AS (SELECT a_id AS x, b_id AS y FROM pr UNION SELECT b_id, a_id FROM pr),
      |reach(x, y) AS (SELECT x, y FROM e
      |  UNION SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
      |cmp AS (SELECT x AS id, least(x, min(y)) AS comp FROM reach GROUP BY x),
      |ids AS (SELECT vec_id AS id FROM embeddings WHERE vec_id < 1000),
      |lbl AS (SELECT ids.id, coalesce(cmp.comp, ids.id) AS comp
      |        FROM ids LEFT JOIN cmp ON ids.id = cmp.id),
      |sz AS (SELECT comp, count(*) AS comp_size FROM lbl GROUP BY comp)
      |SELECT lbl.id, lbl.comp, sz.comp_size, lbl.id != lbl.comp AS is_dup
      |FROM lbl JOIN sz ON lbl.comp = sz.comp ORDER BY lbl.id""".stripMargin,
  )
}
