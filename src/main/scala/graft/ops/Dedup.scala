package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines.
 *
 * Scale design: the only all-pairs work ever done is inside an LSH
 * bucket (bounded by `maxBucket`) or on an explicitly bounded
 * correctness-baseline subset. Everything else is hash-groupBy /
 * bucket-join shaped — linear shuffles that survive 100 TB.
 */
object Dedup {

  /** Word n-gram shingles of a text column (distinct set). */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /**
   * Exact dedup by content hash: every doc mapped to its group's
   * canonical (min) id plus the group size.
   *
   * Shape: a partial-aggregating groupBy builds the DUP GROUPS ONLY
   * (hashes with ≥ 2 copies), left-joined back onto the hashed rows;
   * singletons — the overwhelming majority of a real corpus — never
   * enter the join build side at all. Skew is handled where Spark has
   * machinery for it: the groupBy map-side-combines a hot hash
   * (millions of identical boilerplate docs become one partial per
   * input partition), and the join is an ordinary shuffle join AQE can
   * skew-split or demote to broadcast when the dup-group table is
   * small. The whole-partition window this replaces buffered every
   * row of a hot hash in ONE task with no partials and no AQE escape —
   * a guaranteed straggler at 100×. Cost of the trade: the narrow
   * (id, md5(text)) projection is computed in both branches of the
   * self-join — two linear scans that parallelize, bought for the
   * removal of a serial single-task cliff.
   */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
    val dupGroups = hashed.groupBy("content_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
    hashed.join(dupGroups, Seq("content_hash"), "left")
      .select(col(idCol), col("content_hash"),
        coalesce(col("keep_id"), col(idCol)).as("keep_id"),
        coalesce(col("n_copies"), lit(1L)).as("n_copies"),
        coalesce(col("keep_id") =!= col(idCol), lit(false)).as("is_dup"))
  }

  /**
   * One-pass SIGNATURE TABLE for a corpus: sorted shingle hashes, the
   * k-minhash signature derived from them, and the simhash — every
   * per-doc artifact the dedup stages below need, from a single scan
   * of the text. This is the ingest-once shape: at 100 TB a pipeline
   * computes signatures when a document enters the corpus and stores
   * them (a few hundred bytes/doc ≪ the text), and dedup stages probe
   * the signature table instead of re-hashing raw text per stage.
   * Columns: (id, sh: sorted shingle hashes, sig: k minhashes,
   * simhash: 64-bit).
   */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 64): DataFrame =
    docs.select(col(idCol).as("id"),
        graft.functions.shingle_hashes(col(textCol), 3).as("sh"),
        graft.functions.simhash_text(col(textCol)).as("simhash"))
      .withColumn("sig", graft.functions.minhash_hashes(col("sh"), k))

  /**
   * MinHash signatures + banded LSH candidate pairs.
   * k hashes in `bands` bands of `rowsPerBand`; docs sharing any band
   * bucket become candidates. Bucket explosion is capped at
   * `maxBucket` docs (degenerate buckets — e.g. empty texts — would
   * otherwise produce quadratic pairs).
   */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 bands: Int = 16, rowsPerBand: Int = 4,
                 maxBucket: Int = 1000): DataFrame =
    minhashLshSigs(signatures(docs, idCol, textCol, bands * rowsPerBand),
      bands, rowsPerBand, maxBucket)

  /** [[minhashLsh]] over a precomputed [[signatures]] frame (needs
    * `sig` length ≥ bands·rowsPerBand). */
  def minhashLshSigs(sigs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
                     maxBucket: Int = 1000): DataFrame =
    bucketPairs(banded(sigs, bands, rowsPerBand), maxBucket)

  /** (id, band, bucket) rows from a signature frame: one xxhash64
    * bucket per band slice of the minhash signature. */
  private def banded(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("id", "band", "bucket")

  /**
   * Accounting for [[minhashLshSigs]]'s `maxBucket` truncation: one
   * row with the total/dropped bucket and in-bucket pair counts at
   * the given cap. A dropped bucket silently loses candidate pairs,
   * so the recall gate pins `pairs_dropped == 0` at bench scale — if
   * a corpus ever trips the cap, the loss becomes a red gate (with
   * the count in RECALL.json), not an invisible recall hole.
   */
  def minhashBucketStats(sigs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
                         maxBucket: Int = 1000): DataFrame =
    banded(sigs, bands, rowsPerBand)
      .groupBy("band", "bucket").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("k") > maxBucket, 1L).otherwise(0L)).as("n_dropped_buckets"),
        sum(col("k") * (col("k") - 1) / 2).cast("long").as("pairs_total"),
        sum(when(col("k") > maxBucket, col("k") * (col("k") - 1) / 2)
          .otherwise(0L)).cast("long").as("pairs_dropped"))

  /** All pairs within a (band, bucket), capped and deduped across bands. */
  private def bucketPairs(banded: DataFrame, maxBucket: Int): DataFrame = {
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets.select(explode(flatten(transform(col("ids"), a =>
        filter(transform(col("ids"), b => struct(a.as("a"), b.as("b"))),
          p => p("a") < p("b"))))).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .distinct()
  }

  /**
   * INCREMENTAL near-dup candidates: a new batch (today's crawl)
   * against the full corpus WITHOUT re-pairing history against itself
   * — the corpus-maintenance shape. Every emitted pair touches at
   * least one batch doc: batch×history pairs come from joining the
   * batch's band buckets against history's (capped) bucket lists,
   * batch×batch pairs from the normal in-batch LSH. History×history
   * pairs were settled when history was deduped, so daily maintenance
   * costs O(batch · avgBucket · bands), not O(corpus²) — at 100 TB the
   * history side is touched only to hash and bucket it (linear, and a
   * pre-computed bucket table can stand in for it entirely).
   * Same hash family as [[minhashLsh]], so candidate completeness at a
   * given threshold carries over to the incremental pair set.
   */
  def minhashLshIncremental(batch: DataFrame, history: DataFrame,
                            idCol: String, textCol: String,
                            bands: Int = 16, rowsPerBand: Int = 4,
                            maxBucket: Int = 1000): DataFrame =
    minhashLshIncrementalSigs(
      signatures(batch, idCol, textCol, bands * rowsPerBand),
      signatures(history, idCol, textCol, bands * rowsPerBand),
      bands, rowsPerBand, maxBucket)

  /** [[minhashLshIncremental]] over precomputed [[signatures]] frames
    * (typically two filters of one persisted corpus signature table). */
  def minhashLshIncrementalSigs(batchSigs: DataFrame, histSigs: DataFrame,
                                bands: Int = 16, rowsPerBand: Int = 4,
                                maxBucket: Int = 1000): DataFrame = {
    // the batch's banded signatures feed BOTH the history probe and the
    // in-batch pairs; persist them so the banding pass over the batch
    // runs once, not once per consumer — released via CacheScope at the
    // harness's query boundary (see [[CacheScope]] for the lifecycle)
    val bandedBatch = CacheScope.register(banded(batchSigs, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hist = banded(histSigs, bands, rowsPerBand)
      .groupBy("band", "bucket")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")) <= maxBucket)
    val newOld = bandedBatch
      .join(hist, Seq("band", "bucket"))
      .select(col("id"), explode(col("ids")).as("oid"))
      .select(least(col("id"), col("oid")).as("a_id"),
        greatest(col("id"), col("oid")).as("b_id"))
      .distinct()
    newOld
      .unionByName(bucketPairs(bandedBatch, maxBucket))
      .distinct()
  }

  /** Exact Jaccard similarity for given candidate pairs (verify stage).
    * Shingle sets are pre-hashed to sorted longs once per doc; the
    * per-pair work is a linear merge, not string-set construction.
    *
    * Scale shape: the candidate frame (typically the LSH output) is
    * persisted once — it is consumed twice below — and the corpus-sized
    * shingle frame is semi-joined down to candidate ids BEFORE any
    * equi-join. Candidates ≪ corpus, so no corpus-sized frame is ever
    * broadcast or carried through a shuffle; the joins stay plain
    * shuffle joins (AQE may still broadcast the already-reduced side,
    * which is then bounded by the candidate count, not the corpus). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, threshold: Double): DataFrame =
    jaccardVerifySigs(pairs, docs.select(col(idCol).as("id"),
      graft.functions.shingle_hashes(col(textCol), 3).as("sh")), threshold)

  /** [[jaccardVerify]] over a precomputed [[signatures]] frame —
    * the shingle sets come off the signature table, so the verify
    * stage never touches raw text. */
  def jaccardVerifySigs(pairs: DataFrame, sigs: DataFrame,
                        threshold: Double): DataFrame = {
    val cand = CacheScope.register(
      pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val candIds = cand.select(col("a_id").as("__jid"))
      .unionAll(cand.select(col("b_id").as("__jid")))
      .distinct()
    val sh = sigs.select(col("id").as("__jid"), col("sh").as("__sh"))
      .join(candIds, Seq("__jid"), "left_semi")
    cand
      .join(sh.toDF("a_id", "sh_a"), "a_id")
      .join(sh.toDF("b_id", "sh_b"), "b_id")
      .withColumn("n_common",
        graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("n_common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "n_common", "jaccard")
  }

  /**
   * Edit-distance verification on top of Jaccard-qualified candidate
   * pairs — the second, character-level signal real dedup pipelines
   * run after set similarity: two docs can share most 3-gram shingles
   * yet differ by a large rewritten span, and only sequence distance
   * sees that. The O(|a|·|b|) Levenshtein kernel is priced accordingly:
   * it runs ONLY on pairs the cheap shingle verify already passed
   * (candidates, never the corpus), so at 100 TB its cost is
   * candidate-bounded while the corpus-wide work stays hash-shaped.
   * Raw text joins in via two hash joins on the pair ids (a left-semi
   * prefilter keeps the text shuffle to candidate ids only).
   *
   * A pair passes when `edit_dist · 1000 <= max_len · maxDistPermille`
   * — all-integer, so the gate is exact on both engines. Emits integer
   * distance + max length; no float ratio column (the oracle compares
   * hashes, and the ratio is derivable).
   *
   * LAZY: returns the un-materialized plan (downstream filters still
   * push into the joins). The persisted candidate intermediate is
   * registered with [[CacheScope]]; the caller releases it at its own
   * query boundary via `CacheScope.releaseAll()` (or lets it live for
   * reuse across repeated invocations — Spark's CacheManager dedupes
   * the plan, so re-running the query hits the cache). The round-9
   * eager `localCheckpoint` variant freed blocks per-call but billed a
   * full extra materialization to every invocation and made the result
   * non-recoverable on executor loss in cluster deployments.
   */
  def editVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                 textCol: String, maxDistPermille: Int): DataFrame = {
    val (out, cand) = editVerifyPlan(pairs, docs, idCol, textCol, maxDistPermille)
    CacheScope.register(cand)
    out
  }

  /** The lazy plan behind [[editVerify]] plus the persisted candidate
    * handle — exposed for plan assertions; callers own the unpersist. */
  private[graft] def editVerifyPlan(pairs: DataFrame, docs: DataFrame, idCol: String,
                                    textCol: String, maxDistPermille: Int): (DataFrame, DataFrame) = {
    val cand = pairs.select("a_id", "b_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = cand.select(col("a_id").as("__eid"))
      .unionAll(cand.select(col("b_id").as("__eid"))).distinct()
    val txt = docs.select(col(idCol).as("__eid"), col(textCol).as("__et"))
      .join(candIds, Seq("__eid"), "left_semi")
    val out = cand
      .join(txt.toDF("a_id", "__ta"), "a_id")
      .join(txt.toDF("b_id", "__tb"), "b_id")
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("max_len",
        greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
      .filter(col("edit_dist") * 1000L <= col("max_len") * maxDistPermille.toLong)
      .select("a_id", "b_id", "edit_dist", "max_len")
    (out, cand)
  }

  /**
   * Correctness-baseline exact Jaccard over a bounded id range
   * (all-pairs; the LSH path above is the scale path).
   */
  def ngramJaccardBrute(docs: DataFrame, idCol: String, textCol: String,
                        maxId: Long, threshold: Double): DataFrame =
    ngramJaccardBruteSigs(docs.select(col(idCol).as("id"),
      graft.functions.shingle_hashes(col(textCol), 3).as("sh")), maxId, threshold)

  /** [[ngramJaccardBrute]] over a precomputed [[signatures]] frame. */
  def ngramJaccardBruteSigs(sigs: DataFrame, maxId: Long,
                            threshold: Double): DataFrame = {
    val d = sigs.filter(col("id") < maxId)
      .select(col("id").as("__jid"), col("sh").as("__sh"))
    val pairs = d.toDF("a_id", "sh_a")
      .join(d.toDF("b_id", "sh_b"), col("a_id") < col("b_id"))
    pairs
      .withColumn("n_common",
        graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("n_common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "n_common", "jaccard")
  }

  /**
   * Asymmetric CONTAINMENT between docs: C(A→B) = |S(A)∩S(B)|/|S(A)|
   * is ~1 when A's shingles sit inside a larger B (a benchmark item
   * quoted inside a long crawl page) even though symmetric Jaccard is
   * tiny — exactly the pairs a Jaccard-tuned LSH under-recalls, and
   * the measure contamination checks need. Bounded all-pairs baseline
   * over `id < maxId` (the scale path generates candidates from a
   * rare-shingle inverted join — any pair with C ≥ τ > 0 shares a
   * shingle — then verifies with this same exact merge). Emits both
   * directions; a pair qualifies when either direction ≥ `threshold`.
   */
  def containmentBruteSigs(sigs: DataFrame, maxId: Long,
                           threshold: Double): DataFrame = {
    val d = sigs.filter(col("id") < maxId)
      .select(col("id").as("__jid"), col("sh").as("__sh"))
    d.toDF("a_id", "sh_a")
      .join(d.toDF("b_id", "sh_b"), col("a_id") < col("b_id"))
      .withColumn("n_common",
        graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("c_a_in_b", col("n_common") / size(col("sh_a")).cast("double"))
      .withColumn("c_b_in_a", col("n_common") / size(col("sh_b")).cast("double"))
      .filter(greatest(col("c_a_in_b"), col("c_b_in_a")) >= threshold)
      .select("a_id", "b_id", "n_common", "c_a_in_b", "c_b_in_a")
  }

  /**
   * PREFIX-FILTERED containment join — the exact sub-quadratic scale
   * path for [[containmentBruteSigs]] (PPJoin's prefix principle,
   * Xiao et al., WWW'08, applied to containment): order every doc's
   * shingles by GLOBAL document frequency ascending (rarest first);
   * if C(A→B) = |A∩B|/|A| ≥ τ then B misses fewer than (1−τ)·|A| of
   * A's shingles, so among A's ⌊(1−τ)·|A|⌋+1 rarest shingles at least
   * one is shared with B — the inverted join only needs each doc's
   * PREFIX, and candidates concentrate on RARE shingles (a stopword
   * 3-gram shared by half the corpus almost never lands in a prefix),
   * so bucket sizes stay bounded by construction instead of by a
   * recall-losing cap. Exact: candidates ⊇ all qualifying pairs in
   * either direction (each pair's shorter side contributes the
   * tighter prefix), then the sorted-merge intersection verifies.
   * Shuffles are linear in Σ|prefix| + candidate pairs.
   */
  def containmentJoinSigs(sigs: DataFrame, threshold: Double): DataFrame =
    containmentJoinPostings(postings(sigs), sigs, threshold)

  /** [[containmentJoinSigs]] over a PRE-PUBLISHED [[postings]] table —
    * the per-corpus form: the df groupBy + rank window amortize to one
    * parquet read, and only the (prefix ⋈ postings) candidate join +
    * verify run per query. */
  def containmentJoinPostings(post: DataFrame, sigs: DataFrame,
                              threshold: Double): DataFrame = {
    val cand = prefixCandidates(post, threshold)
    val sh = sigs.select(col("id"), col("sh"))
    cand
      .join(sh.toDF("a_id", "sh_a"), "a_id")
      .join(sh.toDF("b_id", "sh_b"), "b_id")
      .withColumn("n_common",
        graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("c_a_in_b", col("n_common") / size(col("sh_a")).cast("double"))
      .withColumn("c_b_in_a", col("n_common") / size(col("sh_b")).cast("double"))
      .filter(greatest(col("c_a_in_b"), col("c_b_in_a")) >= threshold)
      .select("a_id", "b_id", "n_common", "c_a_in_b", "c_b_in_a")
  }

  /**
   * POSTING-LIST ARTIFACT for prefix-filtered set joins: one row per
   * (doc, shingle) with `pos` = the shingle's 1-based rank inside the
   * doc under the GLOBAL ordering (document frequency ascending, hash
   * tiebreak) and `n` = the doc's shingle count. This is the second
   * half of the "pay the text scan once per corpus" contract: the df
   * groupBy and the per-doc rank window are corpus-sized shuffles that
   * belong in the published signature store (computed at ingest,
   * ~tens of bytes/row ≪ the text), NOT rebuilt per containment query
   * — rebuilding them per run was the repo's one measured spill at 2M
   * docs. Every prefix at ANY τ is a `pos ≤ ⌊(1−τ)·n⌋+1` filter over
   * this one table, so the artifact serves all thresholds.
   *
   * Incremental growth contract: correctness needs every doc ranked
   * under ONE shared total order, not an up-to-date df — so appended
   * docs must be ranked against the PUBLISHED df table (unseen
   * shingles slot in as rarest, ties by hash), never against a
   * recomputed df that would re-order existing rows. df-accuracy only
   * tunes posting-list sizes; re-publish on the retraining schedule,
   * like the ANN models.
   */
  def postings(sigs: DataFrame): DataFrame = {
    val ex = sigs.select(col("id"), explode(col("sh")).as("g"))
    // global df per shingle — one groupBy, broadcast-joined back is
    // wrong at 100 TB (vocabulary-sized), so it rides a shuffle join
    val df = ex.groupBy("g").agg(count(lit(1)).as("__df"))
    // rank each doc's shingles rarest-first (ties broken by hash
    // value, so both docs of any pair see the SAME total order — the
    // positional filter below depends on that)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("__df"), col("g"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("id")
    ex.join(df, "g")
      .select(col("id"), col("g"),
        row_number().over(wRank).as("pos"),
        count(lit(1)).over(wAll).cast("int").as("n"))
  }

  /**
   * [[postings]] with the vocabulary join DROPPED — kept as the
   * MEASURED dead-end that proves the full build's spill is inherent
   * (r14 scale verdict, 2M docs): prefix-filter candidate completeness
   * and the positional filter hold for ANY shared global total order
   * (the pigeonhole never uses df values, only "both docs rank by the
   * same function of g"), so ranking by (df if df > `hotDf` else 0, g)
   * with a broadcast hot map builds 32% faster (77 s vs 114 s — the
   * corpus-sized ex ⋈ df shuffle disappears) and verifies to IDENTICAL
   * pairs (OpsSpec pins equality at τ ∈ {0.5, 0.8, 0.95}, hotDf ∈
   * {0, 64}). BUT the probe explodes: on a dedup corpus the shingles a
   * near-dup CLUSTER shares have df = cluster size, all "cold" under
   * the hot cap, so hash-ordered prefixes pick them and every prefix
   * entry drags a cluster-sized posting list — the candidate join
   * filled the disk at 2M docs where the rarest-first probe runs in
   * 72 s / 0 spill. Rarest-first ordering is load-bearing for
   * candidate VOLUME, not just list bounds; the df join (and its
   * once-per-corpus sort spill) stays in [[postings]] by design.
   */
  def postingsHotDf(sigs: DataFrame, hotDf: Long = 64L): DataFrame = {
    val ex = sigs.select(col("id"), explode(col("sh")).as("g"))
    val hot = broadcast(ex.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotDf))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("__df"), col("g"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("id")
    ex.join(hot, Seq("g"), "left")
      .na.fill(0L, Seq("__df"))
      .select(col("id"), col("g"),
        row_number().over(wRank).as("pos"),
        count(lit(1)).over(wAll).cast("int").as("n"))
  }

  /** Prefix-filtered candidate pairs: every pair with containment ≥ τ
    * in either direction shares at least one shingle from the shorter
    * side's ⌊(1−τ)·n⌋+1 rarest shingles (pigeonhole on the global-df
    * ordering), so joining each doc's PREFIX against all postings is
    * candidate-complete — and prefixes concentrate on RARE shingles,
    * so posting lists stay bounded by construction instead of by a
    * recall-losing cap.
    *
    * Adds PPJoin's POSITIONAL filter (Xiao et al., WWW'08 §3.2): when
    * prefix shingle g sits at rank i of doc P (|P|=n_p) and rank j of
    * doc O (|O|=n_o) under the shared global order, everything shared
    * beyond g lies strictly after BOTH ranks, so
    * |P∩O| ≤ 1 + min(n_p−i, n_o−j). A match row dies map-side — before
    * the candidate-dedup shuffle and the verify join — when that bound
    * already caps containment below τ. Exact: the pair's earliest
    * shared shingle minimizes i and j SIMULTANEOUSLY (same total
    * order on both sides), so for any truly-qualifying pair that row's
    * bound ≥ the true overlap and survives; division by the same
    * `least(n)` expression the verify uses keeps the comparison
    * IEEE-consistent with the verify predicate. */
  private def prefixCandidates(post: DataFrame, threshold: Double): DataFrame = {
    val prefix = post
      .filter(col("pos") <= floor((lit(1.0) - threshold) * col("n")) + 1)
      .select(col("id").as("p_id"), col("g"),
        col("pos").as("p_pos"), col("n").as("p_n"))
    // candidate pairs share a prefix shingle of at least one side:
    // A's prefix hit in ANY of B's shingles covers C(A→B) ≥ τ, and
    // symmetrically, so join prefix(A) against ALL postings of g —
    // posting lists of prefix shingles are rare-shingle-sized
    prefix
      .join(post.select(col("id").as("o_id"), col("g"),
        col("pos").as("o_pos"), col("n").as("o_n")), "g")
      .filter(col("p_id") =!= col("o_id"))
      .filter((lit(1L) + least(col("p_n") - col("p_pos"),
          col("o_n") - col("o_pos"))).cast("double")
        / least(col("p_n"), col("o_n")).cast("double") >= threshold)
      .select(least(col("p_id"), col("o_id")).as("a_id"),
        greatest(col("p_id"), col("o_id")).as("b_id"))
      .distinct()
  }

  /**
   * Exact n-gram Jaccard pairs from the prefix-filtered candidate
   * set: J ≥ τ implies BOTH containments ≥ τ (|A∩B|/|A| ≥
   * |A∩B|/|A∪B|), so [[prefixCandidates]] is candidate-complete for
   * Jaccard too — the same exact pair set and jaccard doubles as
   * [[ngramJaccardBrute]] (identical verify expression), without the
   * all-pairs scan. The scale form of the brute baseline.
   */
  def ngramJaccardPrefixSigs(sigs: DataFrame, maxId: Long,
                             threshold: Double): DataFrame = {
    val s = sigs.filter(col("id") < maxId)
    val sh = s.select(col("id"), col("sh"))
    prefixCandidates(postings(s), threshold)
      .join(sh.toDF("a_id", "sh_a"), "a_id")
      .join(sh.toDF("b_id", "sh_b"), "b_id")
      .withColumn("n_common",
        graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("n_common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "n_common", "jaccard")
  }

  /**
   * Connected components of a near-dup pair graph by iterative
   * min-label propagation: each doc's component becomes the minimum
   * doc id reachable through near-dup edges, so an entire dup cluster
   * (even chains A~B~C where A!~C) keeps exactly one canonical doc.
   *
   * Iterates to the FIXPOINT: each round is one join + groupBy (the
   * standard large-graph CC shape, no driver-side state), and the loop
   * stops when a round changes zero labels — so arbitrarily long dup
   * chains converge, with `maxIters` only as a runaway bound (labels
   * move one hop per round; a chain of length L needs ~L rounds).
   * The per-round materialization doubles as the convergence check, so
   * the extra `count()` reads an already-computed frame.
   *
   * `reliable = true` swaps executor-local `localCheckpoint` (fast,
   * but lost on executor death) for reliable `checkpoint()` — required
   * on a real multi-executor cluster; needs
   * `sparkContext.setCheckpointDir` to be set.
   *
   * ADAPTIVE small-graph path: the edge frame is materialized (and
   * therefore counted for free) before the loop starts, and when the
   * dup subgraph is BROADCAST-SIZED (≤ `smallGraphMaxEdges`, default
   * 1M symmetric edge rows ≈ 16 MB — the same small-side judgment a
   * broadcast join makes) the fixpoint collapses to one driver-side
   * union-find pass: identical min-label output, zero propagation
   * rounds. Each distributed round is a whole-cluster barrier (join +
   * checkpoint + convergence count), so on the common case — dup
   * subgraphs are tiny relative to the corpus even at 100 TB — the
   * adaptive path removes 5-15 barriers and replaces them with one
   * collect + one broadcast. Above the cutoff nothing changes: the
   * subgraph-scoped pointer-jumping fixpoint runs exactly as before
   * (both paths proven identical on forced-cutoff graphs in OpsSpec).
   */
  def components(pairs: DataFrame, allIds: DataFrame, idCol: String,
                 maxIters: Int = 50, reliable: Boolean = false,
                 smallGraphMaxEdges: Long = 1L << 20): DataFrame = {
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // materialize edges once: the pair source may be expensive (LSH or
    // brute-force jaccard) and is joined in every propagation round
    val edges = pin(pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionAll(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
      .distinct())
    if (edges.count() <= smallGraphMaxEdges)
      return smallComponents(edges, allIds, idCol)
    // only nodes that touch an edge can ever change label, so the loop
    // iterates over the DUP-SUBGRAPH (≤ 2·|edges| nodes), not the
    // corpus — near-dup graphs are tiny relative to the corpus, so
    // every round's join/shuffle/materialization is subgraph-sized;
    // edge-free ids join back with comp = id once at the end
    val nodes = edges.select(col("x").as("id")).distinct()
    var comp = nodes.select(col("id"), col("id").as("comp"))
    var i = 0
    var changed = 1L
    while (changed > 0 && i < maxIters) {
      val neighborMin = edges
        .join(comp.select(col("id").as("y"), col("comp").as("ncomp")), "y")
        .groupBy(col("x").as("id")).agg(min("ncomp").as("nmin"))
      val stepped = comp.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("__prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // Rounds 3+: pointer jump (path compression), comp := comp(comp).
      // A label is always the id of a same-component node and only ever
      // decreases, so the jump is safe — and labels then travel ~2^round
      // hops per round instead of 1, making the long tail O(log chain)
      // rounds (rounds = whole-cluster barriers at scale, so the round
      // count is what matters at 100 TB). The first two rounds skip it:
      // most real dup graphs are shallow and converge before a jump
      // would ever pay for its extra subgraph-sized join.
      val next =
        if (i < 2) pin(stepped)
        else {
          val st = pin(stepped)
          val parent = st.select(col("id").as("__jid"), col("comp").as("__jcomp"))
          pin(st.join(parent, col("comp") === col("__jid"), "left")
            .select(col("id"), col("__prev"),
              coalesce(col("__jcomp"), col("comp")).as("comp")))
        }
      changed = next.filter(col("comp") =!= col("__prev")).count()
      comp = next.drop("__prev")
      i += 1
    }
    val full = allIds.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    val sizes = full.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    full.join(sizes, "comp")
      .select(col("id"), col("comp"), col("comp_size"),
        (col("id") =!= col("comp")).as("is_dup"))
  }

  /** Driver-side union-find over a broadcast-sized symmetric edge
    * frame — the small-graph arm of [[components]]. Union roots keep
    * the smaller id, so labels land on the component MINIMUM — the
    * same fixpoint the distributed loop converges to. The whole path
    * is shuffle-free: one bounded collect, then the corpus scan joins
    * two BROADCAST frames (non-root labels; cluster sizes — absent
    * rows mean comp = id / size 1, so both frames stay cluster-sized,
    * never corpus-sized). */
  private def smallComponents(edges: DataFrame, allIds: DataFrame,
                              idCol: String): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(a: Long): Long = {
      var r = a
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = a // path compression: point the walked chain at the root
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.select(col("x").cast("long"), col("y").cast("long")).collect()
      .foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    val labelRows = parent.keys.toSeq.map(id => (id, find(id)))
      .filter { case (id, c) => id != c }
    val sizeRows = labelRows.groupBy(_._2).view
      .mapValues(g => g.size + 1L).toSeq // +1: the root labels itself
    val spark = edges.sparkSession
    import spark.implicits._
    val idType = edges.schema("x").dataType
    val labels = labelRows.toDF("id", "comp")
      .select(col("id").cast(idType).as("id"), col("comp").cast(idType).as("comp"))
    val sizes = sizeRows.toDF("comp", "comp_size")
      .select(col("comp").cast(idType).as("comp"), col("comp_size"))
    allIds.select(col(idCol).as("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .join(broadcast(sizes), Seq("comp"), "left")
      .select(col("id"), col("comp"),
        coalesce(col("comp_size"), lit(1L)).as("comp_size"),
        (col("id") =!= col("comp")).as("is_dup"))
  }

  /**
   * SimHash near-dup pairs at hamming distance <= maxDist, found by
   * 8x8-bit band blocking (any identical byte => candidate): a pair
   * at distance d <= 7 cannot differ in all 8 bands (pigeonhole), so
   * blocking is exact for maxDist <= 7.
   */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 7, maxBucket: Int = 10000): DataFrame =
    simhashPairsSigs(docs.select(col(idCol).as("id"),
      graft.functions.simhash_text(col(textCol)).as("simhash")), maxDist, maxBucket)

  /** [[simhashPairs]] over a precomputed [[signatures]] frame. */
  /** `maxBucket` guards truly degenerate skew only: the native
    * kernel scans a 10k-doc bucket in ~100 ms (k² popcounts on
    * primitive arrays), so the default cap is high enough that no
    * real band bucket drops at bench scale — a dropped bucket loses
    * pairs the ≤-maxDist exactness claim promises, so the cap should
    * bind only where a single bucket would be quadratic-pathological. */
  def simhashPairsSigs(sigs: DataFrame, maxDist: Int = 7,
                       maxBucket: Int = 10000): DataFrame = {
    require(maxDist <= 7, "8-band blocking is exact only for maxDist <= 7")
    val sig = sigs.select(col("id"), col("simhash").as("sig"))
    val bandCols = (0 until 8).map(b =>
      shiftrightunsigned(col("sig"), b * 8).bitwiseAND(lit(0xFFL)))
    val banded = sig.select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
      .toDF("id", "sig", "band", "bucket")
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("sig"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
    // the k² in-bucket scan is ONE native kernel call per bucket
    // (simhash_bucket_pairs): primitive-array double loop, popcount
    // filter before any struct allocation — the nested
    // transform/filter/flatten expression tree this replaces paid
    // ~75 ns of interpretive struct machinery per pair-check, and at
    // Σk² ≈ 17 M checks per bench corpus that WAS the query cost.
    // Only surviving near-dups materialize, so distinct() stays small
    buckets.select(explode(
        graft.functions.simhash_bucket_pairs(col("xs"), maxDist)).as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.dist"))
      .distinct()
  }
}
