package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis operators: language-ID, quality scoring, token
 * counting, fingerprinting. Pure `org.apache.spark.sql.functions`
 * compositions (whole-stage codegen'd, no UDFs), with semantics chosen
 * to be exactly replicable in ANSI-ish SQL for the oracle.
 */
object TextOps {

  /** Marker stopword sets per language (deterministic heuristic). */
  val markers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "了", "是", "在", "我"))

  private def markerCount(words: Column, lang: String): Column =
    size(filter(words, w => w.isin(markers(lang): _*)))

  /**
   * n-gram/stopword language id: count marker words per language,
   * argmax with alphabetical tie-break, 'und' (undetermined) when no
   * marker hits at all.
   */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(lower(col(textCol)), " ")
    val scored = docs.select(
      col(idCol) +: markers.keys.toSeq.sorted.map(l =>
        markerCount(words, l).as(s"score_$l")): _*)
    val langs = markers.keys.toSeq.sorted
    val best = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
    val pick = langs.foldRight(lit("und")) { (l, rest) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(rest)
    }
    // foldRight means earlier (alphabetical) languages win ties
    scored.withColumn("pred_lang", pick)
  }

  /**
   * Quality metrics: counts and ratios derived from exact integers
   * (ratios are single divisions of exact ints — deterministic).
   */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    docs.select(col(idCol),
        length(col(textCol)).as("n_chars"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_uniq"),
        size(filter(words, w => w.isin(stop: _*))).as("n_stop"))
      .withColumn("uniq_ratio", col("n_uniq") / col("n_words").cast("double"))
      .withColumn("stop_ratio", col("n_stop") / col("n_words").cast("double"))
      .withColumn("avg_word_len",
        (col("n_chars") - col("n_words") + 1) / col("n_words").cast("double"))
      .withColumn("quality_score",
        col("uniq_ratio") * 0.5 + col("stop_ratio") * 0.2 +
          least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.3)
  }

  /**
   * Apply the quality gate: keep docs passing ALL thresholds and emit
   * the surviving corpus — the filter-materialization step every
   * dataset build ships. Predicates compare exact integers only
   * (`2·n_uniq ≥ n_words` is `uniq_ratio ≥ 0.5` without the float),
   * so engines can never disagree at a threshold boundary.
   */
  def filterApply(docs: DataFrame, idCol: String, textCol: String,
                  minChars: Int = 100, minWords: Int = 20): DataFrame = {
    // the quality stats are row-wise expressions, so the gate is a
    // plain filter on inline columns — no join back onto the corpus
    // (the quality(docs) + join shape scanned the text twice)
    val words = split(col(textCol), " ")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    docs
      .withColumn("n_words", size(words))
      .withColumn("n_uniq", size(array_distinct(words)))
      .withColumn("__n_stop", size(filter(words, w => w.isin(stop: _*))))
      .filter(length(col(textCol)) >= minChars && col("n_words") >= minWords &&
        col("n_uniq") * 2 >= col("n_words") && col("__n_stop") > 0)
      .drop("__n_stop")
  }

  /** Corpus reporting: per-(lang, source) document/char/token totals —
    * the dataset card numbers, one scan, exact integers. */
  def corpusStats(docs: DataFrame, langCol: String, sourceCol: String,
                  textCol: String): DataFrame =
    docs.groupBy(langCol, sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        sum(size(split(col(textCol), " ")).cast("long")).as("total_words"),
        min(length(col(textCol))).as("min_chars"),
        max(length(col(textCol))).as("max_chars"))

  /** Token counts: whitespace tokens, regex word/number/punct tokens,
    * and BPE-ish fixed-width subword pieces. */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(split(col(textCol), " ")).as("n_ws"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_re"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]{1,4}|[0-9]{1,3}"), lit(0))).as("n_bpeish"))

  /**
   * Deterministic stratified sampling: keep a row iff the first 32 md5
   * bits of `"id:salt"` land under the stratum's rate threshold via the
   * INTEGER-EXACT gate `h·10⁶ < round(rate·10⁶)·2³²` — the same
   * engine-portable construction as [[sampleWeighted]] (md5 is
   * bit-identical everywhere; xxhash64 is Spark-specific), with the
   * rate quantized to parts-per-million so the comparison never
   * touches a float. Bounds: h < 2³² so h·10⁶ < 2⁵², and
   * round(rate·10⁶)·2³² ≤ 2⁵² — no Long overflow possible.
   * Hash-gated (not RNG) so the sample is reproducible across runs,
   * cluster layouts, and retries — the property training-data
   * pipelines need for resumable dataset builds.
   */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       salt: Long = 42L): DataFrame = {
    def ppm(r: Double): Long = {
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0, 1]")
      Math.round(r * 1000000L)
    }
    val ratePpm = rates.foldLeft(lit(ppm(defaultRate))) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(ppm(r))).otherwise(acc)
    }
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long")
    df.withColumn("__ppm", ratePpm)
      .filter(h * 1000000L < col("__ppm") * 4294967296L)
      .drop("__ppm")
  }

  /**
   * Deterministic train/val/test split: the first 32 md5 bits of the
   * (salted) id place each doc on the [0, 2³²) line, and integer ppm
   * thresholds carve it — `h·10⁶ < valPpm·2³²` → val, below
   * `(valPpm+testPpm)·2³²` → test, else train. The assignment is a
   * pure function of the id: stable across runs, retries, engines,
   * partition layouts, and corpus growth (a doc never migrates
   * between splits when others are added — the property random
   * shuffles lose and hash splits exist to provide). All-integer
   * comparisons, same gate family as [[sampleStratified]].
   */
  def sampleSplit(df: DataFrame, idCol: String,
                  valPpm: Long = 50000L, testPpm: Long = 50000L,
                  salt: Long = 42L): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm <= 1000000L,
      s"split fractions $valPpm + $testPpm exceed 1000000 ppm")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":split:" + salt))), 1, 8), 16, 10).cast("long")
    df.withColumn("split",
      when(h * 1000000L < valPpm * 4294967296L, "val")
        .when(h * 1000000L < (valPpm + testPpm) * 4294967296L, "test")
        .otherwise("train"))
  }

  /**
   * Weight-proportional deterministic sampling: keep each doc with
   * probability min(1, weight/scale) via an INTEGER-EXACT hash gate —
   * `h·scale < weight·2³²`, with h the first 32 md5 bits of the id.
   * With weight = a token/char count this is uniform-over-TOKENS doc
   * sampling (a long doc is proportionally likelier kept), the right
   * prior for cutting a token-budgeted corpus from skewed-length
   * sources. The comparison is all-integer, so two engines can never
   * disagree at a threshold boundary — the float-free alternative to
   * Efraimidis–Spirakis u^(1/w) priorities, whose pow/ln doubles are
   * not bit-portable across runtimes. Hash-gated like
   * [[sampleStratified]]: reproducible across runs/retries/layouts.
   *
   * Overflow-free by construction: `scale < 2³¹` is asserted (h < 2³²
   * makes `h·scale < 2⁶³`), and rows with `weight ≥ scale` have
   * p = 1 so they short-circuit past the multiply — the
   * `weight·2³²` product therefore only evaluates with
   * `weight < scale < 2³¹`, which cannot wrap a Long.
   */
  def sampleWeighted(docs: DataFrame, idCol: String, weightCol: Column,
                     scale: Long): DataFrame = {
    require(scale > 0 && scale < (1L << 31),
      s"scale $scale outside (0, 2^31): h*scale would overflow Long")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = weightCol.cast("long")
    docs.filter(w >= scale || h * scale < w * 4294967296L)
  }

  /**
   * Token-budget corpus cut: per source, take docs best-quality-first
   * until the budget fills — the selection step that turns "2 %
   * quality tail of the crawl" into "exactly the N tokens we can
   * afford", per source so one giant source cannot starve the rest.
   * One window cumsum per source over (quality desc, id) — fully
   * ordered, so the cut is deterministic; emits each kept doc with
   * its running total.
   *
   * The score is EMITTED as integer milli-units (`floor(score·1000)`)
   * rather than a raw double: the ordering doubles are bit-identical
   * across engines (same IEEE expression tree), but `round(x, 3)`
   * implementations differ at half-boundaries (JVM BigDecimal
   * shortest-string HALF_UP vs multiply-and-round), so the only
   * hash-stable emission is an integer derived by the same IEEE ops
   * on both sides. Ordering stays on the unrounded score.
   */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, budget: Long): DataFrame = {
    val words = split(col(textCol), " ")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val scored = docs.select(col(idCol), col(sourceCol),
        size(words).cast("long").as("n_tokens"),
        length(col(textCol)).as("__nc"),
        size(words).as("__nw"),
        size(array_distinct(words)).as("__nu"),
        size(filter(words, w => w.isin(stop: _*))).as("__ns"))
      .withColumn("quality_score",
        col("__nu") / col("__nw").cast("double") * 0.5 +
          col("__ns") / col("__nw").cast("double") * 0.2 +
          least(col("__nw").cast("double") / 100.0, lit(1.0)) * 0.3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(col("quality_score").desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        floor(col("quality_score") * 1000).cast("long").as("quality_milli"),
        col("cum_tokens"))
  }

  /**
   * Deterministic concat-and-chunk sequence packing: documents are
   * concatenated in id order and sliced into fixed `ctxLen`-token
   * training sequences; each doc is assigned the sequence its FIRST
   * token lands in, plus its offset inside that sequence — the plan a
   * tokenizer-side packer executes verbatim. Packing runs per
   * (source, shard) with `shard = id mod nShards`, so the cumsum
   * windows are embarrassingly parallel: at 100 TB the packer's only
   * sequential dependency is within one shard, never the corpus, and
   * shard count scales with the cluster while keeping the assignment
   * reproducible (id-derived, not partition-derived). All-integer
   * arithmetic — start offsets, sequence ids, and in-sequence offsets
   * come from one window cumsum and two integer divisions.
   */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String, ctxLen: Long, nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(col(idCol), col(sourceCol),
        pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col(sourceCol), col("shard"), col("n_tokens"),
        col("start_offset"),
        // `div`, not `/`: Spark's `/` is double division, whose
        // rounding could cross an integer boundary on big offsets
        expr(s"start_offset div $ctxLen").as("seq_id"),
        pmod(col("start_offset"), lit(ctxLen)).as("offset_in_seq"))
  }

  /**
   * Deterministic global epoch shuffle: assign every doc a unique
   * position in a reproducible pseudo-random permutation — the
   * "training order" step of a dataset build, stable across runs,
   * engines, and cluster layouts (position is id-derived, never
   * partition-derived). Order = (md5(id:salt), id); the id tiebreak
   * makes the permutation total even under hash collisions.
   *
   * At scale the global rank is computed WITHOUT a whole-corpus
   * window: the first hash byte splits the corpus into 256 buckets
   * (hash-uniform, so no skew), each bucket ranks independently in
   * parallel, and the global offset of each bucket is a cumsum over
   * the 256-row bucket-count table (broadcast back). The only
   * single-task step touches 256 rows; everything corpus-sized
   * partial-aggregates or ranks per bucket. A different epoch = a
   * different salt = an independent permutation.
   */
  def sampleShuffle(docs: DataFrame, idCol: String, salt: Long = 42L,
                    nBuckets: Int = 256): DataFrame = {
    require(nBuckets == 256, "bucket = first md5 byte; other widths NYI")
    val keyed = docs.select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":shuffle:" + salt))).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
    val counts = keyed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    // 256-row frame: the unpartitioned window is deliberate and cheap
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("offset",
      coalesce(sum("cnt").over(wOff), lit(0L)))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("h"), col(idCol))
    keyed.withColumn("rk", row_number().over(wB))
      .join(broadcast(offsets.select(col("bucket"), col("offset"))), Seq("bucket"))
      .select(col(idCol), col("bucket"),
        (col("offset") + col("rk") - 1).as("pos"))
  }

  /**
   * Deterministic curriculum ordering: docs are staged easy→hard by
   * exact token count (fixed integer thresholds — the standard
   * length-based curriculum), then SHUFFLED within each stage so
   * intra-stage order carries no collection bias. The emitted `pos`
   * is the doc's global position in the curriculum: all stage-0 docs
   * first (in salted-hash order), then stage 1, and so on.
   *
   * Distributed ranking, not one window per stage: position = running
   * offset of all preceding (stage, bucket) groups + in-bucket rank,
   * where buckets are the first md5 byte — 256 contiguous hash ranges
   * per stage, so concatenating buckets in (stage, bucket) order IS
   * the (stage, h) order. The only whole-frame window runs over the
   * ≤ stages·256-row count table; per-doc work is two hash aggregates
   * and a broadcast join — the same shape [[sampleShuffle]] uses, so
   * a 100 TB curriculum orders with cluster-wide parallelism while
   * every position stays a pure function of (doc_id, n_tokens), never
   * of partitioning.
   */
  def sampleCurriculum(docs: DataFrame, idCol: String, textCol: String,
                       stages: Seq[Long] = Seq(40L, 80L, 160L),
                       salt: Long = 42L): DataFrame = {
    val stageExpr = stages.zipWithIndex
      .foldRight(lit(stages.size.toLong): Column) { case ((thr, i), acc) =>
        when(col("n_tokens") < thr, lit(i.toLong)).otherwise(acc)
      }
    val keyed = docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        md5(concat(col(idCol).cast("string"), lit(":cur:" + salt))).as("h"))
      .withColumn("stage", stageExpr)
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
    val counts = keyed.groupBy("stage", "bucket").agg(count(lit(1)).as("cnt"))
    // ≤ (nStages+1)·256 rows: unpartitioned window deliberate and cheap
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("stage", "bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("offset",
      coalesce(sum("cnt").over(wOff), lit(0L)))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("stage", "bucket").orderBy(col("h"), col(idCol))
    keyed.withColumn("rk", row_number().over(wB))
      .join(broadcast(offsets.select("stage", "bucket", "offset")),
        Seq("stage", "bucket"))
      .select(col(idCol), col("stage"), col("n_tokens"),
        (col("offset") + col("rk") - 1L).as("pos"))
  }

  /**
   * Deterministic stride-interleaved mixture order — the "no bursts"
   * training schedule: after [[mixAllocate]] decides how much of each
   * source to train on, the loader still needs an ORDER in which
   * sources appear proportionally to their weight in every prefix
   * (reading source A's docs then source B's would train on A first —
   * the classic mixture burst). Stride scheduling's virtual time
   * (r + 1/2) / w_s does exactly that; here it is the all-integer key
   *
   *   ikey = (2·r + 1) · 10¹² div (2·w_s)
   *
   * with r the doc's salted-hash shuffle rank WITHIN its source
   * (the same (group, first-md5-byte)-bucket distributed ranking as
   * [[sampleCurriculum]] — no whole-source window) and w_s the
   * source's EXACT total token count. Sorting by (ikey, source, id)
   * interleaves sources token-mass-proportionally with per-source
   * prefix deviation bounded by ~1 doc; integer div keeps both
   * engines bitwise-identical. Magnitude bound: (2r+1)·10¹² must stay
   * under 2⁶³ — fine to ~4.6M docs per source; beyond that, shrink
   * the scale constant (proportionality granularity degrades only
   * when scale/(2·w_s) reaches 1). The bound is ENFORCED per row
   * (`raise_error`), not just documented: an oversized source would
   * otherwise wrap silently and corrupt the training order.
   */
  def sampleInterleave(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, salt: Long = 42L): DataFrame = {
    val keyed = docs.select(col(idCol), col(sourceCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        md5(concat(col(idCol).cast("string"), lit(":ilv:" + salt))).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
    // ONE corpus pass feeds both the rank offsets and the token-mass
    // weights: counts carries per-(source, bucket) token sums, and the
    // source totals re-aggregate the bounded count table instead of
    // re-tokenizing the corpus a second time
    val counts = keyed.groupBy("source", "bucket")
      .agg(count(lit(1)).as("cnt"), sum("n_tokens").as("tok"))
    // ≤ sources·256 rows: the per-source running offset is a bounded
    // window over the count table, not over docs
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("offset",
      coalesce(sum("cnt").over(wOff), lit(0L)))
    val weights = counts.groupBy("source").agg(sum("tok").as("w"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "bucket").orderBy(col("h"), col(idCol))
    keyed.withColumn("rk", row_number().over(wB))
      .join(broadcast(offsets.select("source", "bucket", "offset")),
        Seq("source", "bucket"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("src_rank", col("offset") + col("rk") - 1L)
      // exact-Long bound for (2r+1)·10¹²: r ≤ 4611685. Fail LOUDLY on
      // the first over-bound rank instead of wrapping — NullType from
      // raise_error coerces to the long branch, so the guard costs one
      // codegen'd comparison per row
      .withColumn("src_rank",
        when(col("src_rank") > 4611685L, raise_error(concat(
          lit("sampleInterleave: src_rank exceeds the exact-Long ikey bound " +
            "(4611685) for source "), col("source"),
          lit(" — shrink the 1e12 scale constant"))))
          .otherwise(col("src_rank")))
      // integer `div`, NOT `/`: Spark's `/` is double division, and
      // the numerator (~1e17) is past 2^53 — a float detour would
      // corrupt low digits and break the bitwise oracle match
      .select(col(idCol), col("source"), col("src_rank"),
        expr("(src_rank * 2 + 1) * 1000000000000 div (w * 2)").as("ikey"))
  }

  /**
   * Length-bucketed batch packing: group docs of similar token length
   * into fixed-size batches so per-batch padding (every sequence pads
   * to the batch max) stays small — the sequence-bucketing trick that
   * cuts padding FLOPs versus arrival-order batching. Bands are
   * integer token ranges (`n_tokens div bandTokens`), batches fill in
   * id order within a (band, shard); the emitted per-batch padded /
   * waste accounting is exactly what a training-throughput dashboard
   * reads. All-integer arithmetic end to end.
   *
   * Shards make the within-band ranking embarrassingly parallel, the
   * same escape hatch [[packSequences]] uses: a 100 TB corpus has
   * billions of docs in one popular length band, and `id mod nShards`
   * splits that band's rank window into independent streams while
   * keeping every assignment id-reproducible (never partition-order).
   */
  def packBuckets(docs: DataFrame, idCol: String, textCol: String,
                  bandTokens: Long = 16L, batchDocs: Int = 8,
                  nShards: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "shard").orderBy(idCol)
    docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("band", expr(s"n_tokens div $bandTokens"))
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("rk", row_number().over(w) - 1)
      .withColumn("batch_id", expr(s"rk div $batchDocs"))
      .groupBy("band", "shard", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        max("n_tokens").as("max_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("max_tokens"))
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))
  }

  /**
   * Span-level duplication profile (the span-granular shape of exact
   * substring dedup, Lee et al. 2022 "Deduplicating Training Data
   * Makes Language Models Better"): every word `k`-gram position in
   * every doc, flagged when that span's text occurs anywhere else in
   * the corpus (another doc OR another position of the same doc).
   * Emits per-doc span counts and an integer dup-fraction in milli
   * units — the signal that separates "two docs share one quote"
   * (containment) from "this doc is stitched from boilerplate spans".
   *
   * Two partial-aggregating hash aggregates and one shuffle join on
   * the span hash — linear in corpus token count. The gram-total join
   * is vocabulary-sized, so it stays a shuffle join (broadcasting a
   * 100 TB corpus vocabulary is the anti-pattern). `word_ngrams` is
   * the same fused native kernel the repetition/decontaminate ops
   * scan with — one byte-pass per doc.
   */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 10): DataFrame = {
    val perDocGram = docs
      .select(col(idCol),
        explode(graft.functions.word_ngrams(col(textCol), k)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
    val totals = perDocGram.groupBy("g").agg(sum("c").as("tot"))
    perDocGram.join(totals, Seq("g"))
      .groupBy(idCol)
      .agg(sum("c").as("n_spans"),
        sum(when(col("tot") >= 2, col("c")).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_milli", expr("(1000 * n_dup_spans) div n_spans"))
  }

  /**
   * Maximal shared token runs between document pairs — the
   * span-EXTENT form of exact substring dedup (Lee et al. 2022's
   * dataset cards report these): every maximal run of ≥ `minRun`
   * tokens occurring in two documents, with both start offsets and
   * the exact run length. A shared run of R tokens is exactly
   * R−minRun+1 consecutive shared minRun-gram positions on one
   * alignment diagonal (a_pos − b_pos constant), so extents fall out
   * of a gaps-and-islands pass: group consecutive matches per
   * (pair, diagonal), run_tokens = island size + minRun − 1. Maximal
   * by construction — a longer containing run would extend the island.
   *
   * Shapes: gram hashes (first 48 md5 bits — the oracle joins on the
   * RAW gram text instead, so the hash path is independently checked)
   * are computed BEFORE the shuffle, so the inverted index carries
   * (fp, id, pos) rows, never gram text. Grams in more than `maxDf`
   * distinct docs drop (the winnowPairs/decontaminate boilerplate
   * cap — pairing them is O(df²) noise; a capped gram inside a run
   * splits the reported extent, and the oracle applies the identical
   * cap). The island windows partition per (pair, diagonal) —
   * match-sized, never corpus-sized.
   */
  def spanExtents(docs: DataFrame, idCol: String, textCol: String,
                  minRun: Int = 10, maxDf: Long = 50L): DataFrame = {
    val grams = gramIndex(docs, idCol, textCol, minRun)
    val keep = grams.select(col(idCol), col("fp")).distinct()
      .groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("fp")
    val f = grams.join(keep, Seq("fp"))
    val m = f.toDF("fp", "a_id", "a_pos")
      .join(f.toDF("fp", "b_id", "b_pos"), "fp")
      .filter(col("a_id") < col("b_id"))
    extentsFromMatches(m, minRun)
  }

  /**
   * [[spanExtents]] restricted to a CANDIDATE PAIR list — the scale
   * path (feed it LSH/winnow/containment candidates): the corpus-wide
   * form's fp self-join is Σ df² rows, and near-dup CLUSTERS make df =
   * cluster size, so a dedup-shaped 2M-doc corpus explodes through it
   * (measured r14: disk-full) — exactly why [[graft.ops.Dedup]]'s brute
   * jaccard is bounded. Here both joins are linear: pairs ⋈ grams(a)
   * by id, then by (b_id, fp) — volume = Σ over pairs of shared grams,
   * i.e. the size of the answer. No df cap either: boilerplate INSIDE
   * a curated pair is genuinely shared text, so pair-restricted
   * extents are cap-free exact (the flat form's capped grams split
   * extents; OpsSpec pins equality when no gram is capped).
   */
  def spanExtentsPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                       textCol: String, minRun: Int = 10): DataFrame =
    spanExtentsPairsIndexed(
      spanGramIndex(docs, idCol, textCol, minRun), pairs, minRun)

  /**
   * The PUBLISH-ONCE half of the span contract: the (fp, id, pos)
   * gram-index table — every word `minRun`-gram's 48-bit fingerprint
   * with its doc and position. Mirrors the signature/postings/winnow
   * artifact discipline ([[graft.ops.Dedup.postings]],
   * [[winnowPairsFps]]): the corpus text scan + gram hashing is the
   * once-per-corpus ingest cost; [[spanExtentsPairsIndexed]] probes
   * the published table per candidate batch without re-reading a byte
   * of text — at 100 TB the text re-scan dominates the probe, so the
   * split is load-bearing, not cosmetic. The artifact is keyed by
   * (corpus, minRun): a different run length hashes different grams.
   */
  def spanGramIndex(docs: DataFrame, idCol: String, textCol: String,
                    minRun: Int = 10): DataFrame =
    gramIndex(docs, idCol, textCol, minRun).withColumnRenamed(idCol, "id")

  /** [[spanExtentsPairs]] over a PRE-PUBLISHED [[spanGramIndex]]
    * table — the per-query probe: two linear equi-joins (pairs ⋈
    * grams(a) by id, then by (b_id, fp)) + the islands pass, volume =
    * Σ over pairs of shared grams. `minRun` must equal the value the
    * index was built with (it sets the reported extent floor). */
  def spanExtentsPairsIndexed(grams: DataFrame, pairs: DataFrame,
                              minRun: Int = 10): DataFrame = {
    // drop self-pairs: a caller-supplied (x, x) row survives the
    // least/greatest canonicalization, matches every gram of the doc
    // against itself on diagonal 0, and would report the WHOLE
    // document as a shared extent (spanScrub would then erase it) —
    // the flat form's a_id < b_id filter, applied here too
    val p = pairs.select(
      least(col("a_id"), col("b_id")).as("a_id"),
      greatest(col("a_id"), col("b_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    val g = grams.select("fp", "id", "pos")
    val m = p
      .join(g.toDF("fp", "a_id", "a_pos"), "a_id")
      .join(g.toDF("fp", "b_id", "b_pos"), Seq("b_id", "fp"))
    extentsFromMatches(m, minRun)
  }

  /**
   * APPLY the extents: remove every duplicated run's B-SIDE occurrence
   * from its document (extents are canonical a_id < b_id, so the
   * LOWEST-id occurrence survives — Lee et al. 2022's "keep one copy"
   * applied at span granularity instead of whole-doc). Overlapping
   * spans union naturally: a token goes iff ANY span covers it. Emits
   * (id, text_scrubbed, n_removed); docs scrubbed to nothing keep an
   * empty-string row, untouched docs pass through with n_removed = 0.
   *
   * Shapes: the span table is extent-count sized; the anti join is
   * equi on the doc id with the position range as residual, so tokens
   * shuffle once by id (the same volume any tokenize pass moves) and
   * the rebuild is a per-doc-grain aggregate. Extents are CONFIRMED
   * against the raw token text first (two extent-count-sized
   * equi-joins) — the fp-built extent tables can carry 48-bit
   * collision fabrications at corpus scale, and scrub is destructive.
   */
  def spanScrub(docs: DataFrame, extents: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    // CONFIRM each extent against the RAW token text before deleting:
    // the extent tables are built on 48-bit gram fingerprints, and at
    // corpus scale (~1e9 grams) colliding gram pairs are EXPECTED —
    // an unconfirmed collision extent would silently erase genuine
    // text. Shape: both extent sides union into ONE slice-request
    // table, docs join ONCE (a single extra text shuffle — a naive
    // per-side join would shuffle the corpus text twice and measured
    // 3× the scrub), each request hashes its token slice, and an
    // extent-grain groupBy compares the two hashes. An extent whose
    // doc is missing (or whose sides mismatch) is NOT scrubbed —
    // destructive ops fail safe. The small-SF oracle cannot see
    // collisions, so the guard must live in the operator.
    val ek = struct(col("a_id"), col("b_id"), col("a_start"),
      col("b_start"), col("run_tokens"))
    // explode, don't union: a union of two side-projections would
    // re-execute the caller's extents subtree twice
    val hashed = extents.select(ek.as("__ek"),
        col("run_tokens").as("__len"), explode(array(
          struct(col("a_id").as("rid"), col("a_start").as("st"),
            lit("a").as("sd")),
          struct(col("b_id").as("rid"), col("b_start").as("st"),
            lit("b").as("sd")))).as("__r"))
      .select(col("__ek"), col("__len"), col("__r.rid").as("__rid"),
        col("__r.st").as("__st"), col("__r.sd").as("__sd"))
      .join(docs.select(col(idCol).as("__rid"),
        split(col(textCol), " ").as("__t")), "__rid")
      .select(col("__ek"), col("__sd"), md5(concat_ws(" ",
        slice(col("__t"), (col("__st") + 1).cast("int"),
          col("__len").cast("int")))).as("__h"))
    val confirmed = hashed.groupBy("__ek")
      .agg(max(when(col("__sd") === "a", col("__h"))).as("__ha"),
        max(when(col("__sd") === "b", col("__h"))).as("__hb"))
      .filter(col("__ha").isNotNull && col("__ha") === col("__hb"))
    val spans = confirmed.select(col("__ek.b_id").as("__sid"),
      col("__ek.b_start").as("__s"),
      (col("__ek.b_start") + col("__ek.run_tokens")).as("__e"))
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .toDF(idCol, "__p", "__tok")
    val kept = toks.join(spans,
      toks(idCol) === spans("__sid") &&
        col("__p") >= col("__s") && col("__p") < col("__e"),
      "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__nkept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__tok")))),
          x => x.getField("__tok")), " ").as("text_scrubbed"))
    docs
      .select(col(idCol), size(split(col(textCol), " ")).cast("long").as("__ntok"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"),
        (col("__ntok") - coalesce(col("__nkept"), lit(0L))).as("n_removed"))
  }

  /** (fp, id, pos) for every word minRun-gram — fp = first 48 md5
    * bits, hashed in the projection so no shuffle ever carries gram
    * text. */
  private def gramIndex(docs: DataFrame, idCol: String, textCol: String,
                        minRun: Int): DataFrame =
    docs
      .select(col(idCol),
        posexplode(graft.functions.word_ngrams(col(textCol), minRun)))
      .toDF(idCol, "pos", "g")
      .select(
        conv(substring(md5(col("g")), 1, 12), 16, 10).cast("long").as("fp"),
        col(idCol), col("pos").cast("long").as("pos"))

  /** Gaps-and-islands over (a_id, b_id, a_pos, b_pos) gram matches:
    * consecutive positions on one alignment diagonal collapse into a
    * maximal extent of islandSize + minRun − 1 tokens. */
  private def extentsFromMatches(m: DataFrame, minRun: Int): DataFrame = {
    val diagW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id"), col("b_id"), col("__diag")).orderBy(col("a_pos"))
    m.withColumn("__diag", col("a_pos") - col("b_pos"))
      .withColumn("__isl", col("a_pos") - row_number().over(diagW))
      .groupBy("a_id", "b_id", "__diag", "__isl")
      .agg(min("a_pos").as("a_start"), min("b_pos").as("b_start"),
        (count(lit(1)) + lit(minRun - 1).cast("long")).as("run_tokens"))
      .select("a_id", "b_id", "a_start", "b_start", "run_tokens")
  }

  /**
   * Mixture allocation for a dataset build: split a total token
   * `budget` across groups (languages, sources) proportionally to
   * their EXACT token counts, with largest-remainder rounding so the
   * allocations sum to exactly `budget` — the "how many tokens of
   * each language go in the mix" step, all-integer so two engines
   * can never disagree. floor(budget·n/total) leaves
   * `budget − Σfloor < #groups` tokens; they go to the groups with
   * the largest remainders (ties broken on the group key). The
   * per-group totals are one map-side-combined aggregate over the
   * corpus; the allocation windows then run over #groups rows —
   * group-cardinality bounded, nothing at corpus scale.
   */
  def mixAllocate(docs: DataFrame, groupCol: String, textCol: String,
                  budget: Long): DataFrame = {
    val totals = docs
      .groupBy(col(groupCol))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col(groupCol))
    totals
      .withColumn("total", sum("n_tokens").over(all))
      // `div`/`pmod` keep the split all-integer (`/` would go double)
      .withColumn("fl", expr(s"($budget * n_tokens) div total"))
      .withColumn("rem", pmod(lit(budget) * col("n_tokens"), col("total")))
      .withColumn("rk", row_number().over(byRem))
      .withColumn("short", lit(budget) - sum("fl").over(all))
      .select(col(groupCol), col("n_tokens"),
        (col("fl") + when(col("rk") <= col("short"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /**
   * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
   * SIGMOD 2003 — the MOSS algorithm): word `k`-gram hashes, then in
   * every window of `w` consecutive hashes select the RIGHTMOST
   * minimum; the distinct (position, hash) pairs are the document's
   * fingerprints. Guarantees: any shared run of w+k-1 words between
   * two documents yields at least one shared fingerprint (the
   * winnowing guarantee), and within-doc density is ~2/(w+1) —
   * position-bearing span matching at a fraction of all-gram cost.
   *
   * Hashes are the first 48 md5 bits of the gram (portable: both
   * engines md5 identically, so the SQL oracle recomputes them
   * bit-for-bit). Docs shorter than k words have no grams and drop;
   * docs with fewer than w grams winnow a single full-width window.
   * All arithmetic is integer-exact.
   *
   * At scale: ONE native kernel call per doc (`winnow_fps` — the
   * gram-hash pass and the monotonic-deque window minimum fused into
   * a single O(m) scan, selections deduped in the kernel), no shuffle
   * at all until the caller aggregates fingerprints; the output is
   * ~2/(w+1) of the gram count, so downstream joins carry a 4-5×
   * lighter payload than exact-substring shingling. The previous HOF
   * pipeline (transform/slice/array_min over a derived hash array)
   * collapsed into O(m²) md5 work once Catalyst inlined the array
   * projection into every window slice — 630 s at sf0.1 against ~1 s
   * through the kernel, same rows.
   */
  def winnowing(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 4, w: Int = 8): DataFrame =
    docs
      .select(col(idCol),
        explode(graft.functions.winnow_fps(col(textCol), k, w)).as("__f"))
      .select(col(idCol), col("__f.pos").as("pos"), col("__f.fp").as("fp"))

  /**
   * RAG-ingestion chunking: fixed `size`-token windows at `stride`
   * overlap per doc — chunk k starts at k·stride, the last chunk ends
   * exactly at the doc tail, every token covered. Emits (chunk_idx,
   * start_token, n_tokens, fp) with fp = 48-bit md5 of the chunk
   * text: the split an embedding indexer runs before encoding, with
   * the fingerprint standing in for the payload so downstream joins
   * (chunk-level dedup, chunk→doc lineage) carry 8 bytes, not text.
   * ONE fused `chunk_fps` kernel call per doc (SURVEY §5 rule).
   */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int = 64, stride: Int = 48): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.chunk_fps(col(textCol), size, stride)).as("__c"))
      .select(col(idCol), col("__c.chunk_idx").as("chunk_idx"),
        col("__c.start_token").as("start_token"),
        col("__c.n_tokens").as("n_tokens"), col("__c.fp").as("fp"))

  /**
   * Chunk-level duplication profile: which of a doc's RAG chunks
   * already exist elsewhere (another doc OR another offset of the same
   * doc) — the signal an embedding indexer uses to skip re-encoding
   * and re-indexing duplicate chunks. Same two-hash-aggregate +
   * fp-keyed shuffle-join shape as [[spanDedup]] (the fp-total side is
   * vocabulary-sized — broadcasting it is the anti-pattern); emits
   * per-doc chunk counts and an integer milli dup fraction.
   */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 size: Int = 64, stride: Int = 48): DataFrame = {
    val ch = chunk(docs, idCol, textCol, size, stride)
    val tot = ch.groupBy("fp").agg(count(lit(1)).as("__tot"))
    ch.join(tot, Seq("fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__tot") > 1, 1L).otherwise(0L)).as("dup_chunks"))
      .withColumn("dup_milli", expr("dup_chunks * 1000 div n_chunks"))
  }

  /**
   * Winnowing-fingerprint near-dup candidates: doc pairs sharing at
   * least `minShared` distinct fingerprints. Each shared fp is a
   * shared k-gram BOTH docs' windows selected, and the winnowing
   * guarantee makes every shared run of w+k−1 words contribute at
   * least one — so the pair evidence is span-level (copied passages),
   * cheaper and more targeted than whole-set Jaccard: the inverted
   * index carries ~2/(w+1) of the gram count.
   *
   * Shape is the standard scale-safe inversion: distinct (doc, fp) →
   * hot-fp cap (fingerprints in more than `maxDf` docs are boilerplate
   * spans — pairing them is O(df²) noise, so they drop, mirroring the
   * decontaminate hot-gram cap; the oracle applies the identical cap)
   * → fp-blocked self-join → per-pair distinct-fp count. Shuffles are
   * linear in fingerprint count plus candidate pairs.
   */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 4, w: Int = 8, minShared: Long = 5L,
                  maxDf: Long = 50L): DataFrame =
    winnowPairsFps(winnowing(docs, idCol, textCol, k, w), idCol,
      minShared, maxDf)

  /** [[winnowPairs]] over a PRE-PUBLISHED [[winnowing]] fingerprint
    * table — the per-corpus form, mirroring the containment postings
    * contract ([[Dedup.postings]]): the text scan + winnow kernel is
    * the once-per-corpus ingest cost (the fp table is ~2/(w+1) of the
    * gram count, tens of bytes/row ≪ the text), and only the
    * distinct → df-cap → fp-blocked inversion runs per query — every
    * shuffle linear in fingerprint count plus candidate pairs, never
    * the corpus text. The artifact also serves the span queries (it
    * keeps `pos`), so one publish feeds both surfaces. */
  def winnowPairsFps(fps: DataFrame, idCol: String,
                     minShared: Long = 5L, maxDf: Long = 50L): DataFrame = {
    val d = fps.select(col(idCol).as("__wid"), col("fp")).distinct()
    val keep = d.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("fp")
    val f = d.join(keep, Seq("fp")).select("fp", "__wid")
    f.toDF("fp", "a_id").join(f.toDF("fp", "b_id"), "fp")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * Temperature-scaled mixture allocation (the multilingual-sampling
   * α-temperature from XLM-R / mT5: weight ∝ count^α with α = 0.5, so
   * low-resource groups are up-sampled relative to proportional): the
   * budget splits by largest-remainder over integer micro-weights
   * `floor(sqrt(n_tokens)·10⁶)`. sqrt is IEEE-correctly-rounded in
   * every engine and the ×10⁶ is one double multiply, so the
   * quantized weights are bit-identical across engines and the whole
   * allocation stays in exact BIGINT arithmetic afterwards —
   * Σalloc == budget exactly, like [[mixAllocate]]. Windows run over
   * #groups rows only.
   */
  def mixTemperature(docs: DataFrame, groupCol: String, textCol: String,
                     budget: Long): DataFrame = {
    val totals = docs
      .groupBy(col(groupCol))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
      .withColumn("wq", floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col(groupCol))
    totals
      .withColumn("total", sum("wq").over(all))
      .withColumn("fl", expr(s"($budget * wq) div total"))
      .withColumn("rem", pmod(lit(budget) * col("wq"), col("total")))
      .withColumn("rk", row_number().over(byRem))
      .withColumn("short", lit(budget) - sum("fl").over(all))
      .select(col(groupCol), col("n_tokens"), col("wq"),
        (col("fl") + when(col("rk") <= col("short"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /**
   * Deterministic per-stratum k-sample — the reproducible equivalent
   * of reservoir sampling: each stratum keeps its k smallest
   * `md5(id:salt)` hex values (uniform over the stratum, stable
   * across runs / engines / layouts / corpus growth of OTHER strata).
   * Exact without a whole-stratum rank window: hex-prefix shards
   * (first 2 md5 chars — prefix order IS string order) rank locally
   * first, so the per-stratum merge ranks ≤ 256·k survivor rows
   * instead of the stratum's full row count; any stratum-global
   * top-k row is also top-k in its own shard, so the two-stage
   * selection is lossless.
   */
  def sampleReservoir(df: DataFrame, idCol: String, stratumCol: String,
                      k: Int, salt: Long = 42L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val h = md5(concat(col(idCol).cast("string"), lit(":res:" + salt)))
    val local = w.partitionBy(col(stratumCol), col("__shard"))
      .orderBy(col("__h"), col(idCol))
    val global = w.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("__shard", substring(col("__h"), 1, 2))
      .withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= k)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
      .select(col(idCol), col(stratumCol), col("rank").cast("long").as("rank"))
  }

  /**
   * Corpus-wide top-k most frequent word n-grams. The groupBy count is
   * the canonical map-side-combine shape (partial counts per partition,
   * one shuffle of the combined vocabulary); top-k runs as a
   * TakeOrdered, never a full sort. Ties break on the gram itself, so
   * the result is deterministic.
   */
  def ngramTopK(docs: DataFrame, textCol: String, n: Int = 2, k: Int = 20): DataFrame =
    // word_ngrams is a fused native kernel (one byte-scan per doc,
    // zero-copy gram views) — the transform/slice/concat_ws lambda
    // chain it replaces evaluates interpreted (higher-order functions
    // are a codegen barrier) and re-concatenates every gram
    docs.select(explode(graft.functions.word_ngrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /**
   * Gopher-style within-doc repetition signals: the fraction of word
   * n-grams that are repeats (any gram occurring ≥ 2 times counts all
   * its occurrences) and the share of the single most frequent gram.
   * All counts are exact integers; each ratio is ONE double division
   * at the end, so both engines agree bitwise. Docs with < n words
   * have no grams and drop out (same as the SQL unnest of an empty
   * list).
   *
   * At scale: one (doc, gram) shuffle with partial counts, then a
   * per-doc aggregate — linear in corpus token count, no windows.
   */
  def repetition(docs: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame =
    docs.select(col(idCol), explode(graft.functions.word_ngrams(col(textCol), n)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum("c").as("n_grams"),
        count(lit(1)).as("n_uniq_grams"),
        max("c").as("top_gram_n"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_rep_grams"))
      .withColumn("dup_gram_frac", col("n_rep_grams") / col("n_grams").cast("double"))
      .withColumn("top_gram_frac", col("top_gram_n") / col("n_grams").cast("double"))

  /**
   * Top-k characteristic terms per document, ranked by (term frequency
   * desc, document frequency asc, term asc) — the tf-idf ordering on
   * exact integers only, so both engines agree bitwise (a float
   * tf·log(N/df) score could differ in the last ulp between libms).
   *
   * At scale: tf is one (doc, term) shuffle with partial counts; df is
   * a vocabulary-sized aggregate. The tf⋈df join is left unhinted — a
   * clean natural-language vocabulary broadcasts (AQE picks that up),
   * but a noisy web corpus's vocabulary is O(corpus) (urls, ids), so
   * forcing a broadcast would OOM; the shuffle join is the safe
   * default. The final per-doc top-k is a window over the doc
   * partition.
   */
  def keyTerms(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // document frequency as a partial-aggregating groupBy joined back,
    // NOT a whole-partition window over term: a window buffers every
    // doc containing a hot stopword in ONE task with no map-side
    // combine, while the groupBy collapses a hot term to one partial
    // per partition and the join-back is a shape AQE can skew-split.
    // df counts docs-containing-term off its own array_distinct scan
    // rather than re-aggregating tf — the second scan shuffles only
    // vocab-sized partial counts, never a second corpus-sized
    // (doc, term) exchange (pinned in ExplainAllSpec).
    val dfx = docs
      .select(explode(array_distinct(split(col(textCol), " "))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol).orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(dfx, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }

  /**
   * Deterministic uniform subsample: the k rows with the smallest
   * md5(id) — order-free, engine-agnostic (md5 is standardized, unlike
   * engine hash functions), reproducible across runs and layouts, and
   * executed as a distributed TakeOrdered (per-partition top-k, no
   * full sort or shuffle of the corpus).
   */
  def sampleTopKByHash(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.select(col(idCol), md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col(idCol))
      .limit(k)

  /** Content fingerprint of whitespace-normalized lowercase text. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    docs.select(col(idCol), md5(norm).as("fp_md5"),
      graft.functions.simhash_text(norm).as("fp_sim"))
  }

  /** Email pattern shared by the scrub and its oracle (RE2-compatible:
    * no backrefs/lookarounds, so Java and RE2 engines agree). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** International-format phone pattern (+CC-XXX-XXXX). */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /**
   * Benchmark decontamination: flag every training doc that shares at
   * least one word n-gram with the held-out set. The scale shape is a
   * shuffle keyed on the n-gram itself (explode → distinct bench
   * grams → left-semi → distinct ids), never a doc×doc comparison —
   * decontaminating against a fixed benchmark stays linear in corpus
   * size, and the bench-gram side is benchmark-sized, not corpus-sized.
   */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 5,
                    maxGramDf: Long = 100000L): DataFrame = {
    val t = train.select(col(idCol),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
    // hot-gram guard (the LSH maxBucket treatment): a boilerplate
    // n-gram carried by >maxGramDf train docs would land every carrier
    // row on ONE reducer of the gram-keyed shuffle. The doc-frequency
    // pass has map-side partials (no skew), its survivors are a tiny
    // set, and dropping them is semantically the right call for
    // decontamination — a gram shared by 10^6 docs is boilerplate, not
    // benchmark leakage. Flags below the cap are untouched.
    val hot = t.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxGramDf).select("g")
    val b = bench.select(explode(Dedup.shingles(col(textCol), n)).as("g")).distinct()
    val hit = t.join(broadcast(hot), Seq("g"), "left_anti")
      .join(b, Seq("g"), "left_semi").select(idCol).distinct()
      .withColumn("is_contaminated", lit(true))
    train.select(col(idCol)).join(hit, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("is_contaminated"), lit(false)).as("is_contaminated"))
  }

  /**
   * Bloom-prefiltered decontamination — [[decontaminate]]'s semantics
   * at [[decontaminate]]'s exactness, with the 100 TB join shape: the
   * held-out set's shingles fold into ONE broadcastable Bloom filter
   * (`bloom_agg`, mergeable bit-array partials), the corpus-sized
   * train-gram stream is prefiltered by `bloom_might_contain` BEFORE
   * any shuffle, and only the survivors (true hits + the fpp tail)
   * enter the exact gram semi-join. A Bloom filter has zero false
   * negatives, and the exact verify removes the false positives, so
   * the output is identical to the unfiltered operator — same DuckDB
   * oracle — while the gram-keyed shuffle shrinks from |corpus grams|
   * to |contaminated grams| / fpp·|corpus|, the difference between
   * shuffling 100 TB and shuffling a few hundred GB.
   *
   * The one non-lazy action is `bGrams.count()` for filter sizing —
   * an O(bench) aggregate over the SMALL side (the held-out set is
   * bounded by construction; it is what fits in an eval harness).
   */
  def decontaminateBloom(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 5,
                         maxGramDf: Long = 100000L,
                         fpp: Double = 0.01): DataFrame = {
    val t = train.select(col(idCol),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
    // identical hot-gram boilerplate guard as the exact operator (its
    // doc explains why dropping >maxGramDf grams is semantically right)
    val hot = t.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxGramDf).select("g")
    // the held-out gram set feeds THREE consumers (filter sizing,
    // bloom build, exact verify) — persist it so the explode+distinct
    // shuffle runs once; the bench side is the small one by
    // construction (it is what fits in an eval harness)
    val bGrams = bench.select(explode(Dedup.shingles(col(textCol), n)).as("g")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (bits, k) = graft.functions.BloomUtil.size(bGrams.count(), fpp)
    val bloomDf = bGrams.agg(graft.functions.bloom_agg(
      xxhash64(col("g")), bits, k).as("__bf"))
    val cand = t.join(broadcast(hot), Seq("g"), "left_anti")
      .crossJoin(broadcast(bloomDf))
      .filter(graft.functions.bloom_might_contain(col("__bf"), xxhash64(col("g"))))
      .select(col(idCol), col("g"))
    val hit = cand.join(bGrams, Seq("g"), "left_semi").select(idCol).distinct()
      .withColumn("is_contaminated", lit(true))
    train.select(col(idCol)).join(hit, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("is_contaminated"), lit(false)).as("is_contaminated"))
  }

  /**
   * PII scrubbing for training-data pipelines: count and redact email
   * addresses and international-format phone numbers. Pure codegen'd
   * regexp ops — no UDF — and the returned md5 of the scrubbed text
   * lets an oracle verify the complete rewrite, not just the counts.
   */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")).as("scrub_md5"))

  /**
   * Token-distribution DRIFT between two corpus snapshots — the
   * "did this month's crawl change under me" check a training-data
   * pipeline runs before mixing corpora. The drift score per token is
   * the cross-multiplied count difference |c0·n1 − c1·n0| (the
   * numerator of |c0/n0 − c1/n1| over the common denominator), so the
   * WHOLE ranking is exact BIGINT arithmetic — no float ever, both
   * engines agree bitwise, and the total-variation distance is
   * Σ drift / (2·n0·n1) if a caller wants the scalar. Exact while
   * snapshot token counts stay under ~2·10⁹ (drift ≤ 2·n0·n1 < 2⁶³).
   *
   * Shape at scale: one vocab-sized shuffle (groupBy token), a
   * 1-row totals broadcast, and a TakeOrdered top-k — never a global
   * sort, nothing driver-side. Here the two snapshots are the
   * doc_id-parity halves; a real pipeline passes its own snapshot
   * predicate via `snapCol`.
   */
  def snapshotDrift(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 10,
                    snapCol: (DataFrame, String) => Column =
                      (_, id) => pmod(col(id), lit(2L))): DataFrame = {
    val toks = docs
      .select(snapCol(docs, idCol).as("__snap"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok")
      .agg(sum(when(col("__snap") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("__snap") === 1, 1L).otherwise(0L)).as("c1"))
    val totals = counts.agg(sum("c0").as("n0"), sum("c1").as("n1"))
    counts.crossJoin(broadcast(totals))
      .withColumn("drift", abs(col("c0") * col("n1") - col("c1") * col("n0")))
      .select("tok", "c0", "c1", "drift")
      .orderBy(col("drift").desc, col("tok"))
      .limit(k)
  }

  /**
   * Reference-LM QUALITY score without a neural model: train bigram /
   * unigram counts on a REFERENCE corpus slice, then score every
   * target doc by how well its bigrams are attested there — the
   * KenLM-shaped "does this read like in-domain text" filter a
   * training-data pipeline runs before mixing a new crawl in, kept
   * EXACT end-to-end: n_bigrams / n_hits (bigram seen in reference) /
   * n_oov (first word unseen even as a unigram) / evidence (Σ reference
   * count of the doc's attested bigrams) are all BIGINT, and
   * `hit_ratio` is ONE division of exact longs — no transcendental, no
   * order-dependent float fold, so engines agree bit-for-bit (a
   * log-prob perplexity would differ by libm ulps per bigram and by
   * summation order per doc; the hit-rate family ranks quality almost
   * identically and stays hash-exact).
   *
   * Shape at scale: bigram extraction is one pass (an in-row transform
   * + explode, no window); the reference bigram/unigram tables are
   * vocabulary-sized, so the planner broadcasts them only while they
   * fit the threshold (tiny reference corpora) and falls back to
   * shuffle joins at corpus scale — measured 53 s / 2M docs with zero
   * spill on the shuffle path. Every aggregate is a
   * partial-aggregating groupBy. Docs with fewer than two words score
   * no row (no bigram evidence either way).
   */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              refPred: (DataFrame, String) => Column =
                (_, id) => pmod(col(id), lit(2L)) === 0): DataFrame = {
    val w = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("ws"),
        refPred(docs, idCol).as("__ref"))
      .filter(size(col("ws")) >= 2)
    val big = w.select(col("id"), col("__ref"), explode(
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("bg"))
      .select(col("id"), col("__ref"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val refBig = big.filter(col("__ref"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val refUni = w.filter(col("__ref"))
      .select(explode(col("ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    big.filter(!col("__ref"))
      .join(refBig, Seq("w1", "w2"), "left")
      .join(refUni, Seq("w1"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("c12"), lit(0L))).as("evidence"))
      .withColumn("hit_ratio",
        col("n_hits").cast("double") / col("n_bigrams").cast("double"))
  }
}
