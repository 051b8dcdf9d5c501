package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Brute-force cosine is the correctness baseline: distributed
 * query-broadcast x corpus-scan, linear in corpus size per query.
 * The scale path is random-hyperplane LSH bucketing: candidates share
 * a bucket, so per-query work is bucket-sized, not corpus-sized.
 * All float math is double-widened and accumulated in index order, so
 * results are reproducible across engines.
 */
object Similarity {

  /** Cosine similarity of two float-array columns, in double — a native
    * one-pass kernel, numerically identical to the three-sum SQL form. */
  def cosine(a: Column, b: Column): Column = graft.functions.cosine_sim(a, b)

  /** Exact top-k neighbors for each query vector (brute force). The
    * QUERY side broadcasts (it is the bounded one); the corpus is the
    * scan — broadcasting the corpus would cap it at driver memory. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    // corpus norms once per row, not once per (query, row): the scan
    // kernel is dot-only, bit-identical (see cosinePairs)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      sqrt(graft.functions.vec_dot(col(vecCol), col(vecCol))).as("q_n"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      sqrt(graft.functions.vec_dot(col(vecCol), col(vecCol))).as("n_n"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", graft.functions.vec_dot(col("q_vec"), col("n_vec")) /
        (col("q_n") * col("n_n")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Cosine range search: every corpus neighbor with cosine >= the
    * threshold, per query — the radius dual of [[bruteTopK]] (retrieval
    * wants "all sufficiently similar", dedup wants "the k closest").
    * Brute scan = the exact baseline; at scale, feed [[annCandidates]]
    * through the same threshold filter for the bucketed path. */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, threshold: Double): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      sqrt(graft.functions.vec_dot(col(vecCol), col(vecCol))).as("q_n"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      sqrt(graft.functions.vec_dot(col(vecCol), col(vecCol))).as("n_n"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", graft.functions.vec_dot(col("q_vec"), col("n_vec")) /
        (col("q_n") * col("n_n")))
      .filter(col("cos") >= threshold)
      .select("q_id", "n_id", "cos")
  }

  /** All near-duplicate pairs with cosine >= threshold within id < maxId. */
  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
                  maxId: Long, threshold: Double): DataFrame = {
    // per-row norms once, dot-only per pair: the pair kernel's
    // multiply-adds drop to a third, bit-identically — sqrt(Σx²) is
    // the same double whether computed once per row or once per pair,
    // and the accumulation order matches cosineFloat's
    val e = embeddings.filter(col(idCol) < maxId)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cvec"),
        sqrt(graft.functions.vec_dot(col(vecCol), col(vecCol))).as("__cn"))
    e.toDF("a_id", "vec_a", "na")
      .join(e.toDF("b_id", "vec_b", "nb"), col("a_id") < col("b_id"))
      .withColumn("cos", graft.functions.vec_dot(col("vec_a"), col("vec_b")) /
        (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /**
   * Random-hyperplane LSH bucketing: `nBits`-bit signature per vector
   * per hash table. Returns one (id, table, bucket) row per table.
   * Hyperplane components are signed hashes of (table, plane, dim) —
   * deterministic, no coefficient broadcast needed.
   */
  def lshBuckets(embeddings: DataFrame, idCol: String, vecCol: String,
                 nBits: Int, tables: Int): DataFrame =
    embeddings.select(col(idCol).as("id"),
        posexplode(graft.functions.hyperplane_buckets(col(vecCol), nBits, tables)))
      .toDF("id", "table", "bucket")

  /**
   * IVF (inverted-file) index: deterministic seeded k-means-lite.
   * Seeds are the nlist vectors with smallest xxhash64(id) (a
   * deterministic pseudo-random sample); `iters` Lloyd rounds of
   * (assign by cosine, recompute elementwise means). Returns
   * (cluster, centroid array<float>).
   *
   * At scale: assignment is a broadcast of nlist centroids against a
   * corpus scan (no shuffle of vectors); mean recomputation shuffles
   * (cluster, dim, component) triples — linear in corpus size.
   */
  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, iters: Int = 4): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // seed selection is a distributed TakeOrdered (per-partition top-k,
    // no full sort); the <= nlist survivors are numbered on the driver
    // — the single-partition row_number window this replaces was a
    // needless serial stage
    val spark = e.sparkSession
    val seedRows = e.orderBy(xxhash64(col("id")), col("id")).limit(nlist)
      .orderBy("id").select("vec").collect()
    var centroids = spark.createDataFrame(
      spark.sparkContext.parallelize(
        seedRows.zipWithIndex.map { case (r, i) => Row(i + 1, r.get(0)) }.toSeq, 1),
      StructType(Seq(StructField("cluster", IntegerType, nullable = false),
        e.schema("vec").copy(name = "centroid"))))
    var it = 0
    while (it < iters) {
      // assignment is 1-row-in/1-row-out through the nearest-centroid
      // kernel (no ×nlist row amplification, no groupBy shuffle).
      // round the means to 1e-6: float sums depend on partition order,
      // and unquantized noise would make bucket assignment run-varying
      val (cids, mat) = centroidModel(centroids)
      val assigned = e.select(
        element_at(graft.functions.nearest_centroids(col("vec"), cids, mat, 1), 1)
          .as("cluster"), col("vec"))
      centroids = assigned
        .select(col("cluster"), posexplode(col("vec")))
        .groupBy("cluster", "pos").agg(round(avg("col"), 6).as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
      it += 1
    }
    centroids
  }

  /** The centroid table as plain arrays (sorted by cluster id) for the
    * nearest-centroid kernel — collected once per consumer; bounded by
    * construction (≤ nlist rows). */
  private def centroidModel(centroids: DataFrame): (Array[Int], Array[Array[Float]]) = {
    val rows = centroids.select("cluster", "centroid").collect()
      .sortBy(_.getInt(0))
    (rows.map(_.getInt(0)), rows.map(_.getSeq[Float](1).toArray))
  }

  /** Nearest centroid per vector: ONE codegen'd kernel call per row —
    * no crossJoin row amplification (the old broadcast-crossJoin +
    * argmax-aggregate pushed corpus×nlist rows through a hash
    * aggregate; at the 100 TB setting of nlist=4096 that is a 4096×
    * blow-up of the scan), no shuffle at all. Tie order (cosine desc,
    * cluster asc) and cosine math are bit-identical to the old shape. */
  private def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val (ids, mat) = centroidModel(centroids)
    e.select(col("id"),
      element_at(graft.functions.nearest_centroids(col("vec"), ids, mat, 1), 1)
        .as("cluster"))
  }

  /** Materialize a tiny model table (centroids / codebooks) once —
    * collect + 1-partition parallelize — so its k-means lineage never
    * re-executes per consumer. Row counts are bounded by construction
    * (≤ nlist, ≤ m·ksub). */
  private def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().toSeq, 1), df.schema)
  }

  /** Each query's `nprobe` closest centroids: (q_id, cluster). Same
    * kernel as [[assign]] — one row per query through a codegen'd
    * top-nprobe selection, then a bounded explode; the crossJoin +
    * row_number window (with its sort) is gone. */
  private def probeLists(q: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val (ids, mat) = centroidModel(centroids)
    q.select(col("id").as("q_id"),
      explode(graft.functions.nearest_centroids(col("vec"), ids, mat, nprobe))
        .as("cluster"))
  }

  /** Exact-cosine rerank of (q_id, n_id) candidates: top k per query.
    * Shared tie-break everywhere: cosine desc, then n_id.
    *
    * Duplicate-pair tolerant: candidate generators (multi-table LSH,
    * multi-probe IVF) emit the same pair via several routes, and a
    * standalone `distinct()` shuffles the FULL pair set just to drop a
    * few percent of rows (measured 6 % at bench scale — the r5
    * sim_ann_lsh regression). Instead the rank window dedups for free:
    * duplicates of a pair are adjacent under the (cos desc, n_id)
    * order, so a `lag(n_id)` guard drops them inside the SAME
    * partitioning/sort the ranking already pays for — Catalyst plans
    * both window functions over one exchange, zero extra shuffles.
    * Already-unique candidate sets (topApprox output) pass through the
    * guard unchanged. */
  // rerankFactor = 24 default everywhere: the exact pass costs k·factor
  // dot products per query (trivial against the candidate scan), while
  // the approximate ordering is the dominant recall loss — measured at
  // sf0.1, PQ-scored variants sat at 6800 bp with factor 16 against an
  // 8400 bp probed-list ceiling; widening the net recovers most of it
  // (factor 24 → 7400, within 1000 bp of the ceiling)
  private def rerankExact(cand: DataFrame, q: DataFrame, e: DataFrame,
                          k: Int): DataFrame = {
    val scored = cand
      .join(q.toDF("q_id", "q_vec"), "q_id")
      .join(e.toDF("n_id", "n_vec"), "n_id")
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("__prev", lag("n_id", 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("n_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /**
   * IVF ANN top-k: queries probe their `nprobe` closest centroids and
   * rerank exactly within those inverted lists only. Trains the
   * centroids inline — for the train-once/query-many shape, train (or
   * [[writeModels]]) once and call [[ivfTopKWith]].
   */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 8): DataFrame =
    ivfTopKWith(materialize(ivfCentroids(embeddings, idCol, vecCol, nlist)),
      embeddings, queries, idCol, vecCol, k, nprobe)

  /**
   * K-means clustering of an embedding corpus as a user-facing
   * operator (corpus segmentation, per-cluster curation/sampling
   * budgets — the semantic-bucket step of a training-data pipeline).
   * Same trainer as the IVF index (deterministic seeded init via
   * distributed TakeOrdered, one codegen'd nearest-centroid kernel
   * call per row, 1e-6-quantized means so assignments are
   * layout-independent), surfaced with membership accounting: one row
   * per vector — (id, cluster, n_members) — with the per-cluster size
   * broadcast back (≤ k rows, never a corpus-sized join side).
   */
  def kmeans(embeddings: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int = 4): DataFrame =
    kmeansAssignWith(kmeansCentroids(embeddings, idCol, vecCol, k, iters),
      embeddings, idCol, vecCol)

  /** The materialized ≤ k centroid table behind [[kmeans]] (cluster,
    * centroid float array) — public so the sim_kmeans SQL oracle can
    * export the EXACT model DuckDB re-runs the nearest-centroid
    * argmax against (r18: assignments are deterministic and the
    * centroids 1e-6-quantized by design, so the oracle needs no
    * Lloyd's — only the ≤ k-row model as literals). */
  def kmeansCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 4): DataFrame =
    materialize(ivfCentroids(embeddings, idCol, vecCol, k, iters))

  /** [[kmeans]]'s assignment + membership sizes over a pre-trained
    * centroid table. */
  def kmeansAssignWith(cents: DataFrame, embeddings: DataFrame,
                       idCol: String, vecCol: String): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val assigned = assign(e, cents)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n_members"))
    assigned.join(broadcast(sizes), Seq("cluster"))
      .select(col("id"), col("cluster").cast("long").as("cluster"),
        col("n_members"))
  }

  /** IVF ANN top-k against a pre-trained centroid table (e.g. read back
    * from a [[writeModels]] store): pure probe/scan/rerank — no k-means
    * work on the query path. */
  def ivfTopKWith(centroids: DataFrame, embeddings: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int, nprobe: Int = 8): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val lists = assign(e, centroids) // inverted file: id -> cluster
    // no distinct: a vector lives in exactly ONE inverted list, so a
    // (q, n) pair can only arise via one probed cluster (and rerank
    // dedups defensively anyway)
    val cand = probeLists(q, centroids, nprobe)
      .join(lists.toDF("n_id", "cluster"), Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    rerankExact(cand, q, e, k)
  }

  /** Squared L2 distance of two float arrays — native codegen'd kernel
    * (HOF lambdas are interpreted, a codegen barrier; the numeric
    * result is identical: double accumulation in index order). */
  private def l2sq(a: Column, b: Column): Column = graft.functions.vec_l2sq(a, b)

  /** Dot product of two float arrays in double, index order. */
  private def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  /** Subspace slices: one (id, j, sub) row per vector per subspace.
    * When the dimension is not divisible by `m`, the LAST subspace
    * absorbs the `size % m` trailing dims — integer division alone
    * would silently drop them from the codebooks/codes and ADC scores
    * would ignore those dims. Training, encoding, and query paths all
    * slice through here, so the fold stays consistent end-to-end. */
  private[graft] def subspaces(e: DataFrame, m: Int): DataFrame = {
    val dsub = (size(col("vec")) / m).cast("int")
    e.select(col("id"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("vec"), j * dsub + 1,
          when(j === m - 1, size(col("vec")) - (lit(m) - 1) * dsub)
            .otherwise(dsub)))))
      .toDF("id", "j", "sub")
  }

  /** Nearest codeword per (vector, subspace): broadcast of the m·ksub
    * codebook rows against the subspace scan — no vector shuffle, and
    * the arg-min is a hash aggregate over an ordered struct (map-side
    * partial min), not a row_number window (which would add a sort). */
  private def pqAssign(subs: DataFrame, books: DataFrame): DataFrame =
    subs.join(broadcast(books), Seq("j"))
      .groupBy("id", "j")
      .agg(min(struct(l2sq(col("sub"), col("cw")).as("d"), col("code"))).as("__m"))
      .select(col("id"), col("j"), col("__m.code").as("code"))

  /**
   * Product-quantization codebooks: the vector space is cut into `m`
   * subspaces and each gets its own `ksub`-codeword k-means-lite
   * codebook (deterministic seeding by xxhash64(id) per subspace,
   * Lloyd rounds with 1e-6-rounded means — same determinism discipline
   * as [[ivfCentroids]]). Encoded, a 64-float vector becomes m small
   * codes: 256 B → 8 B at m=8, the memory-compression layer that lets
   * a 100 TB embedding corpus fit its candidate scan in RAM.
   */
  def pqCodebooks(embeddings: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, ksub: Int = 32, iters: Int = 4): DataFrame =
    pqCodebooksOn(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")), m, ksub, iters)

  /** PQ training on a prepared (id, vec) frame — shared by the raw and
    * residual codebook paths. */
  private def pqCodebooksOn(e: DataFrame, m: Int, ksub: Int, iters: Int): DataFrame = {
    val subs = subspaces(e, m)
    // seed ids: ONE distributed top-ksub by (xxhash64(id), id). The
    // hash ignores j, so every subspace's seeds are the same ksub ids —
    // the per-j row_number window this replaces sorted the WHOLE corpus
    // through m reducer partitions (m tasks each sorting 1/m of a
    // 100 TB corpus: a guaranteed straggler). TakeOrdered is
    // per-partition top-k + a ksub-row driver merge; codes are assigned
    // on the driver and broadcast back as a ksub-row join.
    val spark = e.sparkSession
    val seedIds = e.select(col("id"))
      .orderBy(xxhash64(col("id")), col("id")).limit(ksub).collect()
    val codeMap = spark.createDataFrame(
      spark.sparkContext.parallelize(
        seedIds.zipWithIndex.map { case (r, i) => Row(r.get(0), i) }.toSeq, 1),
      StructType(Seq(e.schema("id").copy(name = "id"),
        StructField("code", IntegerType, nullable = false))))
    var books = subs.join(broadcast(codeMap), Seq("id"))
      .select(col("j"), col("code"), col("sub").as("cw"))
    var it = 0
    while (it < iters) {
      // assignment carries the subvector through the aggregate
      // (first() — one sub per (id, j) group), so no join-back is
      // needed before the mean recompute
      val assigned = subs.join(broadcast(books), Seq("j"))
        .groupBy("id", "j")
        .agg(min(struct(l2sq(col("sub"), col("cw")).as("d"), col("code"))).as("__m"),
          first("sub").as("sub"))
        .select(col("j"), col("__m.code").as("code"), col("sub"))
      books = assigned
        .select(col("j"), col("code"), posexplode(col("sub")))
        .groupBy("j", "code", "pos").agg(round(avg("col"), 6).as("mean"))
        .groupBy("j", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean").cast("float")).as("cw"))
      it += 1
    }
    books
  }

  /** PQ-encode a corpus: m codes per vector. */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               books: DataFrame, m: Int = 8): DataFrame =
    pqAssign(subspaces(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")), m), books)

  /**
   * PQ ANN top-k by asymmetric distance computation: each query builds
   * an m×ksub lookup table of partial dot products against the
   * codebooks, the corpus is scanned as CODES ONLY (approx score =
   * sum of LUT entries at each neighbor's codes — the corpus vectors
   * are never touched), and the top `k·rerankFactor` by approximate
   * score are reranked with exact cosine.
   *
   * Scale shape: the scan is linear in corpus size like bruteTopK but
   * moves m small ints per vector instead of the full float array —
   * PQ is the bandwidth/memory path, and composes with [[ivfTopK]]
   * (probe lists first, then ADC-score only those lists) when even a
   * compressed full scan is too much.
   */
  def pqTopK(embeddings: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ksub: Int = 32,
             rerankFactor: Int = 24): DataFrame =
    pqTopKWith(materialize(pqCodebooks(embeddings, idCol, vecCol, m, ksub)),
      embeddings, queries, idCol, vecCol, k, m, rerankFactor)

  /** PQ ADC top-k against a pre-trained codebook table: encode + scan +
    * rerank only — no k-means on the query path. */
  def pqTopKWith(books: DataFrame, embeddings: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, m: Int = 8,
                 rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val codes = packCodes(pqEncode(embeddings, idCol, vecCol, books, m), "id")
      .toDF("n_id", "codes")
    // full-corpus ADC scan: one kernel call per (query, vector) —
    // the query LUTs broadcast like bruteTopK's query side
    val approx = codes.join(broadcast(adcLutArr(q, books, m)),
        col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.adc_score(col("codes"), col("lut")).as("approx_dot"))
    rerankExact(topApprox(approx, k * rerankFactor), q, e, k)
  }

  /** Query-side ADC lookup table: the partial dot product of every
    * (query subspace, codeword) pair — m·ksub rows per query. */
  private def adcLut(q: DataFrame, books: DataFrame, m: Int): DataFrame =
    subspaces(q, m).join(broadcast(books), Seq("j"))
      .select(col("id").as("q_id"), col("j"), col("code"),
        dot(col("sub"), col("cw")).as("pdot"))

  /** Codes PACKED one row per vector (`keyCols`*, codes: array<int>
    * ordered by subspace) — the store/scan shape: the ADC scan is ONE
    * `adc_score` kernel call per (query, vector) pair instead of m
    * exploded (id, j, code) rows dragged through a LUT join and
    * re-grouped by a hash aggregate. At 2M vectors × 100 queries the
    * exploded form pushed 1.6B rows through that aggregate — the
    * entire 280-340 s ADC cost of the r10 scale-recall run; the
    * packed scan is shuffle-free between the code read and topApprox. */
  private[graft] def packCodes(codes: DataFrame, keyCols: String*): DataFrame =
    codes.groupBy(keyCols.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** Dense per-query ADC LUT (q_id, lut: array<double>) indexed
    * j·ksub + code, for [[graft.functions.adc_score]]. Codebooks may
    * hold FEWER than ksub live codewords in a subspace (a codeword
    * that loses every member during Lloyd iterations disappears), so
    * the dense array is built by explicit position with dead slots at
    * 0.0 — corpus codes only reference live codewords, so a dead slot
    * is never read. Summation runs in fixed subspace order inside the
    * kernel, so scores are deterministic (the exploded join's partial
    * aggregation order was not). */
  private def adcLutArr(q: DataFrame, books: DataFrame, m: Int): DataFrame = {
    val ksub = books.agg(max("code")).collect()(0)
      .get(0).asInstanceOf[Number].intValue() + 1
    adcLut(q, books, m)
      .groupBy("q_id")
      .agg(map_from_entries(collect_list(struct(
        (col("j") * ksub + col("code")).as("k"), col("pdot")))).as("__mm"))
      .select(col("q_id"),
        transform(sequence(lit(0), lit(m * ksub - 1)),
          i => coalesce(element_at(col("__mm"), i), lit(0.0))).as("lut"))
  }

  /** Top n candidates per query by approximate score. */
  private def topApprox(approx: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("approx_dot").desc, col("n_id"))
    approx.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= n)
      .select("q_id", "n_id")
  }

  /**
   * Scalar-quantized (SQ8) ANN: every vector is quantized to one int8
   * byte per dimension with a single symmetric per-corpus scale
   * (code = round(v · 127 / maxAbs)), so the candidate scan reads ¼
   * the bytes of a float scan and scores with an exact integer dot —
   * bit-stable across partitionings, no float summation order. With a
   * global scale, integer-dot order equals dequantized approximate-dot
   * order, so no dequantization happens until the exact-cosine rerank
   * of the top k·rerankFactor.
   *
   * At scale: the scale is one order-independent aggregate over the
   * corpus (a single driver scalar — persist alongside the model
   * tables for the train-once shape); encode and scan are one
   * codegen'd pass each; no shuffle before the bounded rerank.
   */
  def sq8TopK(embeddings: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, rerankFactor: Int = 24): DataFrame =
    sq8TopKWith(sq8Scale(embeddings, idCol, vecCol),
      embeddings, queries, idCol, vecCol, k, rerankFactor)

  /** The SQ8 model: the corpus' max |component| — ONE order-independent
    * aggregate pass, persisted by [[writeModels]] so queries never
    * rescan the corpus for it (the train-once shape, trivially). */
  def sq8Scale(embeddings: DataFrame, idCol: String, vecCol: String): Double = {
    val row = embeddings
      .select(array_max(transform(col(vecCol), x => abs(x))).as("m"))
      .agg(max("m")).first()
    require(!row.isNullAt(0), "sq8: empty corpus (or all-empty embedding arrays)")
    val maxAbs = row.getFloat(0)
    require(maxAbs > 0f, "sq8: all-zero corpus")
    maxAbs.toDouble
  }

  /** SQ8 top-k against a pre-computed corpus scale: encode + scan +
    * rerank only — no corpus pass on the query path. */
  def sq8TopKWith(maxAbs: Double, embeddings: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    import graft.functions.{sq8_dot, sq8_encode}
    val inv = lit(127.0 / maxAbs)
    val codes = e.select(col("id").as("n_id"), sq8_encode(col("vec"), inv).as("n_code"))
    val qcodes = q.select(col("id").as("q_id"), sq8_encode(col("vec"), inv).as("q_code"))
    val approx = codes.join(broadcast(qcodes), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        sq8_dot(col("q_code"), col("n_code")).cast("double").as("approx_dot"))
    rerankExact(topApprox(approx, k * rerankFactor), q, e, k)
  }

  /**
   * IVF-SQ8: probe lists restrict the candidate scan (a
   * corpus-fraction instead of the full corpus), int8 codes score the
   * restricted candidates at ¼ float bandwidth with exact integer
   * dots, and the top k·rerankFactor rerank with exact cosine — the
   * FAISS IVF-SQ composition, sitting between IVF-flat (more memory)
   * and IVF-PQ (more quantization error) on the accuracy/cost ladder.
   */
  def ivfSq8TopKWith(centroids: DataFrame, maxAbs: Double,
                     embeddings: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int, nprobe: Int = 8,
                     rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    import graft.functions.{sq8_dot, sq8_encode}
    val inv = lit(127.0 / maxAbs)
    val codes = assign(e, centroids)
      .join(e, "id")
      .select(col("id").as("n_id"), col("cluster"),
        sq8_encode(col("vec"), inv).as("n_code"))
    val qcodes = q.select(col("id").as("q_id"), sq8_encode(col("vec"), inv).as("q_code"))
    val approx = probeLists(q, centroids, nprobe)
      .join(codes, Seq("cluster"))
      .join(broadcast(qcodes), Seq("q_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        sq8_dot(col("q_code"), col("n_code")).cast("double").as("approx_dot"))
    rerankExact(topApprox(approx, k * rerankFactor), q, e, k)
  }

  /**
   * IVF-PQ ANN: the two scale paths composed. IVF probing restricts
   * the candidate set to the query's `nprobe` inverted lists (a
   * corpus-fraction scan instead of a full one), PQ codes score those
   * candidates without touching corpus floats, and the top
   * `k·rerankFactor` are reranked with exact cosine. This is the
   * billion-vector shape: list restriction bounds work, codes bound
   * memory bandwidth, rerank restores precision at the top.
   */
  def ivfPqTopK(embeddings: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 8,
                m: Int = 8, ksub: Int = 32, rerankFactor: Int = 24): DataFrame =
    ivfPqTopKWith(materialize(ivfCentroids(embeddings, idCol, vecCol, nlist)),
      materialize(pqCodebooks(embeddings, idCol, vecCol, m, ksub)),
      embeddings, queries, idCol, vecCol, k, nprobe, m, rerankFactor)

  /** IVF-PQ top-k against pre-trained centroid + codebook tables. */
  def ivfPqTopKWith(centroids: DataFrame, books: DataFrame,
                    embeddings: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, nprobe: Int = 8,
                    m: Int = 8, rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val lists = assign(e, centroids)
    val cand = probeLists(q, centroids, nprobe)
      .join(lists.toDF("n_id", "cluster"), Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    // list-restricted ADC scan: only probed candidates meet their codes
    val codes = packCodes(pqEncode(embeddings, idCol, vecCol, books, m), "id")
      .toDF("n_id", "codes")
    val approx = cand.join(codes, Seq("n_id"))
      .join(broadcast(adcLutArr(q, books, m)), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.adc_score(col("codes"), col("lut")).as("approx_dot"))
    rerankExact(topApprox(approx, k * rerankFactor), q, e, k)
  }

  /**
   * Candidate pairs for LSH ANN: a pair is a candidate when the query's
   * signature is within hamming distance `probes` of the neighbor's
   * bucket in any table (multi-probe LSH — probing adjacent buckets
   * buys recall without shrinking the signature).
   *
   * Scale shape: buckets are materialized as capped `collect_list`s —
   * a degenerate hot bucket (e.g. the all-zeros sketch) is DROPPED at
   * `maxBucket` rather than exploding into O(bucket²) pairs, mirroring
   * `Dedup.minhashLsh`. With `nBits` wide signatures (default 10 ⇒ 1024
   * buckets/table) candidate volume is O(n · avgBucket · (1 + nBits) ·
   * tables), never all-pairs; size nBits ≈ log2(n) upward for larger
   * corpora.
   */
  def annCandidates(embeddings: DataFrame, idCol: String, vecCol: String,
                    nBits: Int = 10, tables: Int = 8, probes: Int = 2,
                    maxBucket: Int = 1000): DataFrame =
    annCandidatesFrom(lshBuckets(embeddings, idCol, vecCol, nBits, tables),
      nBits, probes, maxBucket)

  /** Candidate pairs from PRE-GROUPED (table, bucket, ids) lists —
    * the persisted-index path: the per-query collect_list shuffle is
    * gone entirely (grouping happened once, at [[writeModels]] time).
    * The probe side derives from the same lists by exploding ids
    * (every id sits in exactly one bucket per table, so the explode
    * IS the raw bucket frame) — two scans of a small parquet, zero
    * shuffles before the rerank window. Oversize buckets are dropped
    * from the BUILD side only, exactly like the raw-frame path. */
  private def annCandidatesFromLists(lists0: DataFrame, nBits: Int, probes: Int,
                                     maxBucket: Int,
                                     probes2Tables: Int = Int.MaxValue): DataFrame = {
    val lists = lists0.filter(size(col("ids")) <= maxBucket)
    val raw = lists0.select(col("table"), col("bucket"), explode(col("ids")).as("q_id"))
    probedBuckets(raw, nBits, probes, probes2Tables)
      .join(lists, Seq("table", "bucket"))
      .select(col("q_id"), explode(col("ids")).as("n_id"))
      .filter(col("q_id") =!= col("n_id"))
  }

  /** Probe-budget expansion of a (q_id, table, bucket) frame: radius-2
    * fan-out only on tables [0, probes2Tables) — the tables are
    * independent identically-distributed hash families, so which ones
    * widen is immaterial; the candidate fan-out (the query's latency
    * budget) scales from tables·(1+nBits) up to
    * tables·(1+nBits+C(nBits,2)) as the knob moves, trading latency
    * against recall per query. */
  private def probedBuckets(raw: DataFrame, nBits: Int, probes: Int,
                            probes2Tables: Int): DataFrame =
    if (probes < 2 || probes2Tables == Int.MaxValue)
      raw.select(col("q_id"), col("table"),
        explode(probeExpansion(nBits, probes)).as("bucket"))
    else
      raw.filter(col("table") < probes2Tables)
        .select(col("q_id"), col("table"),
          explode(probeExpansion(nBits, probes)).as("bucket"))
        .unionAll(raw.filter(col("table") >= probes2Tables)
          .select(col("q_id"), col("table"),
            explode(probeExpansion(nBits, 1)).as("bucket")))

  /** Candidate pairs from a prepared (id, table, bucket) frame —
    * the hash-at-query-time path ([[annCandidates]]). */
  /** The multi-probe bucket fan-out: the bucket itself, all single-bit
    * flips (radius 1), and at `probes >= 2` all two-bit flips — the
    * nearest signatures in hamming order, 1 + nBits + C(nBits, 2)
    * buckets at radius 2. The expansion is a fixed expression array
    * (probe count is a plan-time constant), so widening it costs scan
    * fan-out, never an extra shuffle. */
  private def probeExpansion(nBits: Int, probes: Int): Column = {
    require(probes <= 2, "only hamming radius <= 2 probing is supported")
    val r1 = (0 until nBits).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
    val r2 = for (i <- 0 until nBits; j <- i + 1 until nBits)
      yield col("bucket").bitwiseXOR(lit((1L << i) | (1L << j)))
    val flips = probes match {
      case 0 => Seq.empty
      case 1 => r1
      case _ => r1 ++ r2
    }
    array(col("bucket") +: flips: _*)
  }

  private def annCandidatesFrom(b0: DataFrame, nBits: Int, probes: Int,
                                maxBucket: Int): DataFrame = {
    // the bucket frame feeds BOTH the capped list build and the probe
    // side; persist it so one read (or one hyperplane-hash pass, on
    // the in-memory path) serves both consumers
    val b = b0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lists = b.groupBy("table", "bucket")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")) <= maxBucket)
    val probeBuckets = probeExpansion(nBits, probes)
    // NOT distinct: multi-table/multi-probe routes duplicate a few
    // percent of pairs, and a full-pair-set shuffle to drop them costs
    // more than carrying them into rerankExact's window, which dedups
    // inside the partitioning it already pays for (measured: the
    // standalone distinct was the r5 sim_ann_lsh regression)
    b.select(col("id").as("q_id"), col("table"), explode(probeBuckets).as("bucket"))
      .join(lists, Seq("table", "bucket"))
      .select(col("q_id"), explode(col("ids")).as("n_id"))
      .filter(col("q_id") =!= col("n_id"))
  }

  /**
   * ANN top-k via multi-table multi-probe LSH: exact cosine rerank over
   * the (deduped, bucket-capped) candidate set from [[annCandidates]].
   * Approximate by construction — recall measured against bruteTopK
   * in the spec, not against an oracle.
   */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              k: Int, nBits: Int = 10, tables: Int = 8, probes: Int = 2,
              maxBucket: Int = 1000): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cand = annCandidates(embeddings, idCol, vecCol, nBits, tables, probes, maxBucket)
    rerankExact(cand, e, e, k)
  }

  /** LSH ANN top-k off the PERSISTED pre-grouped bucket lists (the
    * store's own corpus-adaptive geometry, carried in `lsh_meta`): the
    * corpus is never re-hashed NOR re-grouped on the query path —
    * candidates come straight off the stored lists with zero
    * pre-rerank shuffles.
    *
    * Probe budget is a QUERY-TIME parameter pair (r8 verdict: the
    * recall/latency trade must be tunable per query, not baked in):
    * `probes` is the hamming probe radius (0-2), and `probes2Tables`
    * limits the radius-2 fan-out to that many of the hash tables
    * (the rest stay at radius 1) — candidate volume, and with it
    * latency, scales smoothly between the radius-1 floor and the full
    * radius-2 ceiling while recall degrades gracefully (each table is
    * an independent chance to catch a neighbor). */
  def annTopKStored(idx: AnnIndex, embeddings: DataFrame, idCol: String,
                    vecCol: String, k: Int, probes: Int = 2,
                    maxBucket: Int = 1000,
                    probes2Tables: Int = Int.MaxValue): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    rerankExact(annCandidatesFromLists(idx.lshLists, idx.lshBits, probes, maxBucket,
      probes2Tables), e, e, k)
  }

  /** Per-QUERY LSH ANN off the stored lists — the serving shape
    * (queries ≪ corpus), where [[annTopKStored]] is the all-corpus
    * self-join shape dedup runs. The query batch hashes at query time
    * through the SAME deterministic hyperplane family the index was
    * built with (`hyperplane_buckets` is a pure function of the
    * vector), probes its budgeted bucket set against the pre-grouped
    * stored lists, and reranks exactly. Cost: |q|·probes bucket
    * lookups + candidate-bounded rerank — corpus vectors are touched
    * only by the rerank's candidate join, and for a query id also in
    * the corpus the candidates (hence results) are identical to the
    * self-join path's (pinned in OpsSpec). */
  def annTopKStoredFor(idx: AnnIndex, embeddings: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int, probes: Int = 2,
                       maxBucket: Int = 1000,
                       probes2Tables: Int = Int.MaxValue): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val raw = lshBuckets(queries, idCol, vecCol, idx.lshBits, idx.lshTables)
      .toDF("q_id", "table", "bucket")
    val lists = idx.lshLists.filter(size(col("ids")) <= maxBucket)
    val cand = probedBuckets(raw, idx.lshBits, probes, probes2Tables)
      .join(lists, Seq("table", "bucket"))
      .select(col("q_id"), explode(col("ids")).as("n_id"))
      .filter(col("q_id") =!= col("n_id"))
    rerankExact(cand, q, e, k)
  }

  // === persisted ANN models: train once, query many =================

  /** Everything a query needs from a [[writeModels]] store: the
    * bounded model tables (materialized — broadcastable) AND the
    * ENCODED CORPUS (lists / codes — parquet scans, corpus-sized but
    * a few percent of the raw vector bytes). Query paths that read
    * codes from here never touch corpus floats until the rerank. */
  final case class AnnIndex(centroids: DataFrame, books: DataFrame,
                            resBooks: DataFrame, lists: DataFrame,
                            codes: DataFrame, resCodes: DataFrame,
                            sq8Codes: DataFrame, lshLists: DataFrame,
                            maxAbs: Double,
                            lshBits: Int = 10, lshTables: Int = 8,
                            n: Long = 0L)

  /**
   * Corpus-adaptive RERANK DEPTH for the quantized stored paths —
   * the r10 scale-recall gate's finding: quantization error per PAIR
   * is scale-free, but the number of neighbors inside one error band
   * grows linearly with corpus density, so a fixed depth (k·24 — the
   * value that captures the exact top-k at ≤ 75k vectors) captures
   * almost nothing of a 2M-vector corpus whose clusters hold ~8k
   * near-equidistant members (measured: PQ recall 9800 bp at 7.5k
   * vectors → 220 bp at 2M with fixed depth). The index knows its
   * corpus size (lsh_meta `n`), so depth tracks it: n/300 exact
   * 64-dim dots per query is ~7k at 2M — negligible against the code
   * scan that feeds it — and the floor keeps gate-corpus behavior
   * identical (n/300 < k·24 below ~36k vectors). Stores written
   * before the meta carried `n` report n=0 and keep the fixed depth.
   */
  private def rerankDepth(idx: AnnIndex, k: Int, rerankFactor: Int): Int =
    math.max(k * rerankFactor, (idx.n / 300L).toInt)

  /**
   * Train every ANN model table ONCE and persist them as parquet under
   * `path`: `centroids/` (IVF), `codebooks/` (PQ on raw vectors),
   * `res_codebooks/` (PQ on per-list residuals — see
   * [[ivfPqResidualTopKWith]]), the sq8 corpus scale — AND the encoded
   * corpus itself: `lists/` (id, cluster), `codes/` (id, j, code),
   * `res_codes/` (id, cluster, j, code), `sq8_codes/` (id, int8
   * bytes). A `_SUCCESS` marker lands after everything. This is the
   * chunk-store treatment applied to ANN end-to-end: training AND
   * encoding are ingest-time jobs, so the query path reads codes —
   * ~1–3% of the raw vector bytes — instead of re-encoding 100 TB of
   * floats per query. Model tables stay bounded (≤ nlist / m·ksub
   * rows) and broadcastable.
   */
  def writeModels(embeddings: DataFrame, idCol: String, vecCol: String,
                  path: String, nlist: Int = 0, m: Int = 8, ksub: Int = 32,
                  iters: Int = 4, trainSample: Long = 200000L,
                  lshBitsOverride: Int = 0): Unit = {
    // re-training over an existing complete store: drop the marker
    // FIRST, so a crash mid-rewrite (or a concurrent reader) can never
    // observe _SUCCESS alongside mixed-generation tables — the
    // "half-written dir reads as absent" contract holds for rewrites too
    val fsOut = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), embeddings.sparkSession.sparkContext.hadoopConfiguration)
    fsOut.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    // TRAIN on a bounded deterministic sample, ENCODE the full corpus
    // (the FAISS discipline; the r9 scale run measured full-corpus
    // k-means at 2M vectors spilling ~677 GB across its iterations —
    // codebook quality saturates long before corpus size, so the
    // training passes get a hash-gated ~trainSample-row subsample;
    // below the cap nothing changes, and the gate is the same
    // integer-exact ppm construction the samplers use, so the sample —
    // and with it every trained model — is layout- and
    // engine-independent). trainSample <= 0 disables the cap.
    val n = embeddings.count()
    // nlist <= 0 means CORPUS-ADAPTIVE (like lshBits): hold inverted
    // lists at ~8k vectors so the probe cost per query is
    // nprobe·8k-ish at any corpus size — at the historical fixed 16
    // a 2M-vector corpus had 125k-vector lists, so nprobe=8 scanned
    // HALF the corpus per query (the r10 scale run measured that as
    // the whole IVF-family latency). Small corpora keep the
    // historical 16, so gate-corpus models are bit-identical.
    val nlistEff =
      if (nlist > 0) nlist
      else math.max(16, math.min(4096, (n / 8000L).toInt))
    val train =
      if (trainSample <= 0 || n <= trainSample) embeddings
      else {
        val ppm = math.max(1L, trainSample * 1000000L / n)
        embeddings.filter(
          pmod(xxhash64(col(idCol), lit(2166136261L)), lit(1000000L)) < ppm)
      }
    val centroids = materialize(ivfCentroids(train, idCol, vecCol, nlistEff, iters))
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    val books = materialize(pqCodebooks(train, idCol, vecCol, m, ksub, iters))
    books.write.mode("overwrite").parquet(s"$path/codebooks")
    val resBooks = materialize(
      residualCodebooks(train, idCol, vecCol, centroids, m, ksub, iters))
    resBooks.write.mode("overwrite").parquet(s"$path/res_codebooks")
    val spark = embeddings.sparkSession
    val maxAbs = sq8Scale(embeddings, idCol, vecCol)
    spark.createDataFrame(Seq(Tuple1(maxAbs)))
      .toDF("max_abs").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/sq8")
    // the encoded corpus: one kernel pass each, written once. PQ and
    // residual codes land PACKED (one array<int> row per vector) —
    // the packing shuffle happens HERE, at ingest, so the ADC scan on
    // every query is a plain kernel scan with no code explode
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    assign(e, centroids).write.mode("overwrite").parquet(s"$path/lists")
    pqEncodePacked(embeddings, idCol, vecCol, books, m)
      .write.mode("overwrite").parquet(s"$path/codes")
    residualEncodePacked(embeddings, idCol, vecCol, centroids, resBooks, m)
      .write.mode("overwrite").parquet(s"$path/res_codes")
    e.select(col("id"), graft.functions.sq8_encode(col("vec"),
        lit(127.0 / maxAbs)).as("code"))
      .write.mode("overwrite").parquet(s"$path/sq8_codes")
    // pre-grouped: the query path's collect_list shuffle happens HERE,
    // once, instead of on every query. LSH geometry is CORPUS-ADAPTIVE
    // (and persisted in lsh_meta so query-time hashing always matches):
    // at fixed 10 bits a 2M-vector corpus averages ~2000 ids per
    // bucket — over the default query-time bucket cap, so every list
    // would be dropped and the stored-LSH path would return nothing at
    // exactly the scale it exists for. Bits grow with log2(n) to hold
    // ~16-32 ids per bucket; small corpora keep the historical 10.
    val lshBits =
      if (lshBitsOverride > 0) lshBitsOverride
      else math.max(10, math.min(24,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 32))))
    val lshTables = 8
    // the meta also records the encoded CORPUS SIZE: rerank depth on
    // the quantized query paths scales with it (see [[rerankDepth]])
    embeddings.sparkSession.createDataFrame(Seq((lshBits, lshTables, n)))
      .toDF("bits", "tables", "n").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/lsh_meta")
    lshBuckets(embeddings, idCol, vecCol, nBits = lshBits, tables = lshTables)
      .groupBy("table", "bucket").agg(collect_list("id").as("ids"))
      .write.mode("overwrite").parquet(s"$path/lsh_lists")
    // marker AFTER all model tables: a half-written model dir (crash
    // between writes) must read as absent, not as a partial model
    fsOut.create(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), true).close()
  }

  /**
   * INCREMENTAL index maintenance — append a batch of new vectors to a
   * complete [[writeModels]] store WITHOUT retraining: the batch is
   * encoded with the STORED models (centroid assignment, PQ/residual
   * codes, int8 at the stored scale, LSH at the stored geometry) and
   * appended to the corpus tables. This is the daily-growth path at
   * 100 TB: encoding a batch is linear in the batch, while a rebuild
   * re-trains and re-encodes the whole corpus (the r9 scale run
   * measured that at 245 s for 2M vectors — per day, for ever).
   *
   * Contract: batch ids must be DISJOINT from the stored corpus
   * (guarded below with an anti-join count against `lists` — a re-run
   * or overlapping batch would silently append duplicate rows to
   * every corpus table, inflate meta n, and skew rerank/recall).
   * After append, every corpus table equals what
   * [[writeModels]] would have produced had it encoded base ∪ batch
   * with the same trained models (encoders are deterministic), so
   * every `*TopKStored` query path serves the union transparently —
   * the meta corpus count is bumped so corpus-adaptive rerank depth
   * tracks growth. Model quality drifts only as far as the corpus
   * distribution drifts from the training corpus — re-train (a fresh
   * [[writeModels]]) on schedule, not per batch. The stored sq8 scale
   * is kept: batch components beyond it CLAMP (same as FAISS's fixed
   * ScalarQuantizer ranges); LSH lists gain per-batch fragment rows
   * for touched buckets — query-time bucket caps then apply per
   * fragment (conservative: fragments are only ever SMALLER than the
   * merged list) — fold them with [[compactLshLists]] on the same
   * schedule as retraining.
   *
   * Same crash discipline as [[writeModels]]: the `_SUCCESS` marker
   * drops before the first append and returns after the meta bump, so
   * a half-appended store reads as absent, never as a torn index.
   */
  def appendToModels(batch: DataFrame, idCol: String, vecCol: String,
                     path: String): Unit = {
    val spark = batch.sparkSession
    require(modelsExist(spark, path),
      s"appendToModels target $path is not a complete model store")
    val (centroids, books, resBooks) = readModels(spark, path)
    val maxAbs = readSq8Scale(spark, path)
    val meta = spark.read.parquet(s"$path/lsh_meta")
      .select("bits", "tables", "n").collect()(0)
    val (bits, tables, n0) = (meta.getInt(0), meta.getInt(1), meta.getLong(2))
    // m is a property of the trained codebooks, not a caller knob —
    // an append may not silently encode with a different geometry
    val m = books.agg(max("j")).collect()(0).getInt(0) + 1
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val e = batch.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // disjointness guard BEFORE the marker drops: one semi-join count
    // of the (small) batch against the stored id list — O(batch)
    // shuffle, the stored side is a pruned single-column scan
    val overlap = e.select("id").join(
      spark.read.parquet(s"$path/lists").select("id"), Seq("id"), "left_semi")
      .count()
    require(overlap == 0L,
      s"appendToModels batch shares $overlap id(s) with the stored corpus at " +
        s"$path; batches must be disjoint (deduplicate or re-key before append)")
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    assign(e, centroids).write.mode("append").parquet(s"$path/lists")
    pqEncodePacked(batch, idCol, vecCol, books, m)
      .write.mode("append").parquet(s"$path/codes")
    residualEncodePacked(batch, idCol, vecCol, centroids, resBooks, m)
      .write.mode("append").parquet(s"$path/res_codes")
    e.select(col("id"), graft.functions.sq8_encode(col("vec"),
        lit(127.0 / maxAbs)).as("code"))
      .write.mode("append").parquet(s"$path/sq8_codes")
    lshBuckets(batch, idCol, vecCol, nBits = bits, tables = tables)
      .groupBy("table", "bucket").agg(collect_list("id").as("ids"))
      .write.mode("append").parquet(s"$path/lsh_lists")
    // bump the corpus count (rerank depth scales with it). Parquet
    // overwrite of a read path self-deadlocks, so stage + rename
    val n1 = n0 + batch.count()
    val tmpMeta = s"$path/lsh_meta.tmp"
    spark.createDataFrame(Seq((bits, tables, n1)))
      .toDF("bits", "tables", "n").coalesce(1)
      .write.mode("overwrite").parquet(tmpMeta)
    // the swap must be VERIFIED before the marker returns: a failed
    // rename with _SUCCESS present would make readIndex silently fall
    // back to legacy geometry (bits=10, n=0) — wrong-bit-width probes
    // and reset rerank depth, not an error. Failing here leaves the
    // store marker-less, which reads as absent.
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$path/lsh_meta"), true),
      s"delete of $path/lsh_meta failed; store left marker-less")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmpMeta),
        new org.apache.hadoop.fs.Path(s"$path/lsh_meta")),
      s"rename $tmpMeta -> $path/lsh_meta failed; store left marker-less")
    fs.create(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), true).close()
  }

  /** Fold the per-batch LSH fragment rows [[appendToModels]] leaves
    * into one (table, bucket, ids) row per bucket again — run on the
    * retrain schedule, not per batch. Marker discipline as above. */
  def compactLshLists(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    val merged = spark.read.parquet(s"$path/lsh_lists")
      .select(col("table"), col("bucket"), explode(col("ids")).as("id"))
      .groupBy("table", "bucket").agg(collect_list("id").as("ids"))
    val tmp = s"$path/lsh_lists.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$path/lsh_lists"), true),
      s"delete of $path/lsh_lists failed; store left marker-less")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$path/lsh_lists")),
      s"rename $tmp -> $path/lsh_lists failed; store left marker-less")
    fs.create(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), true).close()
  }

  /** Read the complete index: bounded model tables materialized, the
    * encoded corpus left as parquet scans. */
  def readIndex(spark: SparkSession, path: String): AnnIndex = {
    // stores written before lsh_meta existed were all built at the
    // old fixed geometry — fall back ONLY when the file is absent; a
    // real read failure must propagate, because probing 10-bit
    // buckets against (say) 16-bit stored lists would silently return
    // zero candidates instead of erroring
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/lsh_meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (bits, tables, metaN) =
      if (!fs.exists(metaPath)) (10, 8, 0L)
      else {
        val df = spark.read.parquet(s"$path/lsh_meta")
        val r = df.collect()(0)
        val n = if (df.schema.fieldNames.contains("n")) r.getAs[Long]("n") else 0L
        (r.getAs[Int]("bits"), r.getAs[Int]("tables"), n)
      }
    AnnIndex(
      materialize(spark.read.parquet(s"$path/centroids")),
      materialize(spark.read.parquet(s"$path/codebooks")),
      materialize(spark.read.parquet(s"$path/res_codebooks")),
      spark.read.parquet(s"$path/lists"),
      spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/res_codes"),
      spark.read.parquet(s"$path/sq8_codes"),
      spark.read.parquet(s"$path/lsh_lists"),
      readSq8Scale(spark, path),
      lshBits = bits, lshTables = tables, n = metaN)
  }

  /** True when a [[writeModels]] store at `path` is complete. */
  def modelsExist(spark: SparkSession, path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
  }

  /** Read back (centroids, codebooks, res_codebooks) from a
    * [[writeModels]] store, materialized so consumers broadcast a
    * bounded local table instead of re-running the parquet scan per
    * join. */
  def readModels(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) =
    (materialize(spark.read.parquet(s"$path/centroids")),
      materialize(spark.read.parquet(s"$path/codebooks")),
      materialize(spark.read.parquet(s"$path/res_codebooks")))

  /** The persisted SQ8 corpus scale (max |component|). */
  def readSq8Scale(spark: SparkSession, path: String): Double =
    spark.read.parquet(s"$path/sq8").first().getDouble(0)

  // === query paths over the FULLY persisted index ===================
  // (probe + code-scan + rerank only: no corpus encode, no assignment
  // pass — the corpus floats are touched exactly once, at the bounded
  // exact-cosine rerank)

  /** IVF top-k off persisted lists: probe centroids, scan only the
    * probed inverted lists, rerank exactly. */
  def ivfTopKStored(idx: AnnIndex, embeddings: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nprobe: Int = 8): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // no distinct: one list per vector => pairs are unique by
    // construction (rerank dedups defensively anyway)
    val cand = probeLists(q, idx.centroids, nprobe)
      .join(idx.lists.toDF("n_id", "cluster"), Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    rerankExact(cand, q, e, k)
  }

  /** PQ ADC top-k off persisted PACKED codes: the corpus scan reads
    * one m-int array per vector from parquet — never the float
    * arrays — and scores with one `adc_score` kernel call per
    * (query, vector), no shuffle before topApprox. */
  def pqTopKStored(idx: AnnIndex, embeddings: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int, m: Int = 8,
                   rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val approx = idx.codes.toDF("n_id", "codes")
      .join(broadcast(adcLutArr(q, idx.books, m)), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.adc_score(col("codes"), col("lut")).as("approx_dot"))
    rerankExact(topApprox(approx, rerankDepth(idx, k, rerankFactor)), q, e, k)
  }

  /** IVF-PQ top-k off persisted lists + codes. */
  def ivfPqTopKStored(idx: AnnIndex, embeddings: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int, nprobe: Int = 8,
                      m: Int = 8, rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cand = probeLists(q, idx.centroids, nprobe)
      .join(idx.lists.toDF("n_id", "cluster"), Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    val approx = cand.join(idx.codes.toDF("n_id", "codes"), Seq("n_id"))
      .join(broadcast(adcLutArr(q, idx.books, m)), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.adc_score(col("codes"), col("lut")).as("approx_dot"))
    rerankExact(topApprox(approx, rerankDepth(idx, k, rerankFactor)), q, e, k)
  }

  /** Residual IVF-PQ top-k off persisted residual codes (which carry
    * the list assignment, so no assignment pass is needed). */
  def ivfPqResidualTopKStored(idx: AnnIndex, embeddings: DataFrame,
                              queries: DataFrame, idCol: String, vecCol: String,
                              k: Int, nprobe: Int = 8, m: Int = 8,
                              rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val codes = idx.resCodes.toDF("n_id", "cluster", "codes")
    // candidate lists come from the persisted `lists` table (the SAME
    // centroid assignment residual encoding used)
    val cand = probeLists(q, idx.centroids, nprobe)
      .join(idx.lists.toDF("n_id", "cluster"), Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id", "cluster")
    val qc = q.crossJoin(broadcast(idx.centroids))
      .select(col("id").as("q_id"), col("cluster"),
        dot(col("vec"), col("centroid")).as("c_dot"))
    val approx = cand.join(codes.select("n_id", "codes"), Seq("n_id"))
      .join(broadcast(adcLutArr(q, idx.resBooks, m)), Seq("q_id"))
      .join(broadcast(qc), Seq("q_id", "cluster"))
      .select(col("q_id"), col("n_id"),
        (col("c_dot") + graft.functions.adc_score(col("codes"), col("lut")))
          .as("approx_dot"))
    rerankExact(topApprox(approx, rerankDepth(idx, k, rerankFactor)), q, e, k)
  }

  /** SQ8 top-k off persisted int8 codes: the scan reads ¼ the float
    * bytes from parquet, scores with exact integer dots. */
  def sq8TopKStored(idx: AnnIndex, embeddings: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    import graft.functions.{sq8_dot, sq8_encode}
    val qcodes = q.select(col("id").as("q_id"),
      sq8_encode(col("vec"), lit(127.0 / idx.maxAbs)).as("q_code"))
    val approx = idx.sq8Codes.toDF("n_id", "n_code")
      .join(broadcast(qcodes), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        sq8_dot(col("q_code"), col("n_code")).cast("double").as("approx_dot"))
    rerankExact(topApprox(approx, rerankDepth(idx, k, rerankFactor)), q, e, k)
  }

  /** IVF-SQ8 top-k off persisted lists + int8 codes. */
  def ivfSq8TopKStored(idx: AnnIndex, embeddings: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int, nprobe: Int = 8,
                       rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    import graft.functions.{sq8_dot, sq8_encode}
    val qcodes = q.select(col("id").as("q_id"),
      sq8_encode(col("vec"), lit(127.0 / idx.maxAbs)).as("q_code"))
    val approx = probeLists(q, idx.centroids, nprobe)
      .join(idx.lists.toDF("n_id", "cluster"), Seq("cluster"))
      .join(idx.sq8Codes.toDF("n_id", "n_code"), Seq("n_id"))
      .join(broadcast(qcodes), Seq("q_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        sq8_dot(col("q_code"), col("n_code")).cast("double").as("approx_dot"))
    rerankExact(topApprox(approx, rerankDepth(idx, k, rerankFactor)), q, e, k)
  }

  // === residual IVF-PQ ==============================================

  /** Nearest centroid per vector, keeping the vector alongside —
    * (id, cluster, vec) in one 1-row-in/1-row-out kernel pass (the old
    * crossJoin + argmax-aggregate + first(vec) carry is gone). */
  private def assignWithVec(e: DataFrame, centroids: DataFrame): DataFrame = {
    val (ids, mat) = centroidModel(centroids)
    e.select(col("id"),
      element_at(graft.functions.nearest_centroids(col("vec"), ids, mat, 1), 1)
        .as("cluster"), col("vec"))
  }

  /** Per-vector residual against its assigned list centroid:
    * (id, cluster, vec = v − c). The standard billion-scale accuracy
    * move: residual norms are much smaller than vector norms, so the
    * same m×ksub codebook budget quantizes them with far less error. */
  private def residualFrame(e: DataFrame, centroids: DataFrame): DataFrame =
    assignWithVec(e, centroids)
      .join(broadcast(centroids), Seq("cluster"))
      .select(col("id"), col("cluster"),
        zip_with(col("vec"), col("centroid"), (x, y) => x - y)
          .cast("array<float>").as("vec"))

  /** Residual-encode a corpus: (id, cluster, j, code) — the persisted
    * index shape (codes + list assignment; vectors only needed again
    * at rerank). */
  def residualEncode(embeddings: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, resBooks: DataFrame, m: Int = 8): DataFrame = {
    val resid = residualFrame(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")), centroids)
    pqAssign(subspaces(resid.select("id", "vec"), m), resBooks)
      .join(resid.select("id", "cluster"), Seq("id"))
      .select("id", "cluster", "j", "code")
  }

  /** Collect a bounded codebook table (≤ m·ksub rows) into the
    * pq_encode_all kernel's model shape: per subspace j the live codes
    * ASCENDING and their codewords — the ordering the kernel's
    * strictly-less argmin needs to reproduce `min(struct(d, code))`
    * tie-breaks bit-exactly. */
  private def pqBookModel(books: DataFrame,
                          m: Int): (Array[Array[Int]], Array[Array[Array[Float]]]) = {
    val rows = books.select("j", "code", "cw").collect()
      .map(r => (r.get(0).asInstanceOf[Number].intValue(),
        r.get(1).asInstanceOf[Number].intValue(),
        r.getSeq[Float](2).toArray))
    val byJ = rows.groupBy(_._1)
    // a books/m mismatch (m larger than the trained codebooks) must
    // fail HERE at model build, not surface as silent -1 codes from
    // pq_encode_all that downstream ADC would score as garbage
    (0 until m).foreach(j => require(
      byJ.get(j).exists(_.nonEmpty),
      s"pqBookModel: no codewords for subspace $j — books table was " +
        s"trained with fewer than m=$m subspaces"))
    val sorted = Array.tabulate(m)(j => byJ(j).sortBy(_._2))
    (sorted.map(_.map(_._2)), sorted.map(_.map(_._3)))
  }

  /** MAP-ONLY packed PQ encode — (id, codes array<int>) straight off
    * the [[graft.functions.pq_encode_all]] kernel. Replaces the
    * exploded ×ksub join + per-(id, j) aggregate + pack shuffle on the
    * ingest path (which spilled at 2M vectors); output is bit-identical
    * to `packCodes(pqEncode(...))` (pinned in OpsSpec). */
  def pqEncodePacked(embeddings: DataFrame, idCol: String, vecCol: String,
                     books: DataFrame, m: Int = 8): DataFrame = {
    val (cs, bs) = pqBookModel(books, m)
    embeddings.select(col(idCol).as("id"),
      graft.functions.pq_encode_all(col(vecCol), cs, bs).as("codes"))
  }

  /** MAP-ONLY packed residual encode — (id, cluster, codes): centroid
    * assignment via the nearest_centroids kernel, residual subtraction
    * against the broadcast centroid table, pq_encode_all on the
    * residual. No corpus-sized shuffle anywhere. */
  def residualEncodePacked(embeddings: DataFrame, idCol: String, vecCol: String,
                           centroids: DataFrame, resBooks: DataFrame,
                           m: Int = 8): DataFrame = {
    val (cs, bs) = pqBookModel(resBooks, m)
    residualFrame(
        embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")), centroids)
      .select(col("id"), col("cluster"),
        graft.functions.pq_encode_all(col("vec"), cs, bs).as("codes"))
  }

  /** PQ codebooks trained on per-list residuals (v − centroid). */
  def residualCodebooks(embeddings: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, m: Int = 8, ksub: Int = 32,
                        iters: Int = 4): DataFrame =
    pqCodebooksOn(
      residualFrame(
        embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")), centroids)
        .select("id", "vec"),
      m, ksub, iters)

  /** Residual IVF-PQ with inline training — see [[ivfPqResidualTopKWith]]. */
  def ivfPqResidualTopK(embeddings: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 8,
                        m: Int = 8, ksub: Int = 32, rerankFactor: Int = 24): DataFrame = {
    val centroids = materialize(ivfCentroids(embeddings, idCol, vecCol, nlist))
    ivfPqResidualTopKWith(centroids,
      materialize(residualCodebooks(embeddings, idCol, vecCol, centroids, m, ksub)),
      embeddings, queries, idCol, vecCol, k, nprobe, m, rerankFactor)
  }

  /**
   * IVF-PQ with RESIDUAL encoding: each corpus vector is approximated
   * as centroid(list) + codewords(v − centroid), so the approximate
   * score decomposes as dot(q, c_list) + Σ_j LUT[j, code_j] — one
   * broadcast (query × centroid) dot table plus the same codes-only
   * ADC scan as [[ivfPqTopKWith]]. Same probe/scan/rerank plan shape;
   * strictly lower quantization error at equal m·ksub budget
   * (residual norms ≪ vector norms), which is what makes PQ usable at
   * billion scale.
   */
  def ivfPqResidualTopKWith(centroids: DataFrame, resBooks: DataFrame,
                            embeddings: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, k: Int,
                            nprobe: Int = 8, m: Int = 8,
                            rerankFactor: Int = 24): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val resid = residualFrame(e, centroids)
    val lists = resid.select(col("id").as("n_id"), col("cluster"))
    val codes = packCodes(
        pqAssign(subspaces(resid.select("id", "vec"), m), resBooks), "id")
      .toDF("n_id", "codes")
    // candidates keep the neighbor's list so the centroid term of the
    // score can be added back per (query, list)
    val cand = probeLists(q, centroids, nprobe)
      .join(lists, Seq("cluster"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id", "cluster")
    // query-side model tables: residual ADC LUT + per-list dot terms
    val qc = q.crossJoin(broadcast(centroids))
      .select(col("id").as("q_id"), col("cluster"),
        dot(col("vec"), col("centroid")).as("c_dot"))
    val approx = cand.join(codes, Seq("n_id"))
      .join(broadcast(adcLutArr(q, resBooks, m)), Seq("q_id"))
      .join(broadcast(qc), Seq("q_id", "cluster"))
      .select(col("q_id"), col("n_id"),
        (col("c_dot") + graft.functions.adc_score(col("codes"), col("lut")))
          .as("approx_dot"))
    rerankExact(topApprox(approx, k * rerankFactor), q, e, k)
  }
}
