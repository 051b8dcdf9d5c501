package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic 64-bit string hashing for the dedup operators.
 * FNV-1a over UTF-8 bytes, then splitmix64 finalization; the k MinHash
 * "permutations" are splitmix64 re-mixes of the base hash — no stored
 * coefficient tables, identical on every JVM.
 */
object TextHash {
  final val Gold = 0x9E3779B97F4A7C15L

  def splitmix64(x0: Long): Long = {
    var x = x0 + Gold
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= 0x100000001B3L; i += 1 }
    h
  }

  /** k min-hashes over the shingle set. Empty input => Long.MaxValue rows. */
  def minHash(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val base = fnv64(shingles.getUTF8String(i))
      var j = 0
      while (j < k) {
        val h = splitmix64(base + j * Gold)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Classic 64-bit SimHash over the token multiset. */
  def simHash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      accumulate(acc, splitmix64(fnv64(tokens.getUTF8String(i))))
      i += 1
    }
    finish(acc)
  }

  /** SimHash over whitespace tokens without materializing a token
    * array: split + FNV + accumulate fused in one byte scan. */
  def simHashText(text: UTF8String): Long = {
    val bytes = text.getBytes
    val acc = new Array[Int](64)
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') {
        accumulate(acc, splitmix64(h))
        h = 0xCBF29CE484222325L
      } else {
        h ^= b & 0xFFL; h *= 0x100000001B3L
      }
      i += 1
    }
    accumulate(acc, splitmix64(h)) // final token (split(text,' ') always yields >= 1)
    finish(acc)
  }

  private def accumulate(acc: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
      b += 1
    }
  }

  private def finish(acc: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /**
   * FNV-1a hashes of all word n-gram shingles of a text, distinct and
   * sorted — fused split+shingle+hash so no shingle strings are ever
   * materialized. The hash of a shingle equals fnv64("w1 w2 .. wn"),
   * so signatures are interchangeable with the string-shingle path.
   */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // word boundaries (split on single spaces, like split(text, ' '))
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(words) = bytes.length + 1
    val nShingles = math.max(words - n + 1, 1)
    val hs = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      val from = starts(s)
      val until = starts(math.min(s + n, words)) - 1 // end of last word in shingle
      var h = 0xCBF29CE484222325L
      var j = from
      while (j < until) { h ^= bytes(j) & 0xFFL; h *= 0x100000001B3L; j += 1 }
      hs(s) = h
      s += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 0
    var k = 0
    while (k < nShingles) {
      if (k == 0 || hs(k) != hs(k - 1)) { hs(uniq) = hs(k); uniq += 1 }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, uniq))
  }

  /**
   * All word n-grams of a text as strings, in document order WITH
   * duplicates (frequency counting needs multiplicity — unlike
   * [[shingleHashes]]' distinct sets). One pass over the bytes; each
   * gram is a zero-copy byte-span view (consecutive words already sit
   * space-joined in the source), so nothing is re-concatenated.
   * Texts with fewer than n words yield an empty array.
   */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(words) = bytes.length + 1
    val nGrams = math.max(words - n + 1, 0)
    val out = new Array[Any](nGrams)
    var s = 0
    while (s < nGrams) {
      val from = starts(s)
      val until = starts(s + n) - 1
      out(s) = UTF8String.fromBytes(bytes, from, until - from)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003) in
   * ONE pass per row: word k-gram hashes (first 48 md5 bits of the
   * gram text — portable, the SQL oracle recomputes the identical
   * value from md5 hex), then the rightmost minimum of every w-window
   * via a monotonic deque — O(m) total, consecutive re-selections
   * deduped (winnowing selections are monotone in position, so
   * adjacent-dedup equals global (pos, fp) distinct per doc).
   *
   * Grams are byte ranges of the original text (split on single
   * spaces, empty tokens kept, rejoined with the same spaces), so no
   * per-gram string materializes. Replaces a HOF pipeline whose gram-
   * hash array was re-inlined into every window slice by project
   * collapse — O(m²) md5 work, measured 630 s over the sf0.1 corpus
   * against ~1 s through this kernel.
   *
   * Returns array<struct<pos:long, fp:long>>, pos = 1-based gram
   * position of the selected (rightmost-min) gram.
   */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    // guard up front: k <= 0 would MessageDigest over a negative span
    // (obscure exception) and w <= 0 would read an uninitialized deque
    // slot (garbage fingerprints, no error) — fail loudly instead
    require(k >= 1 && w >= 1, s"winnow_fps needs k >= 1 and w >= 1 (got k=$k, w=$w)")
    val bytes = text.getBytes
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    val m = words - k + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](words + 1)
    var wi = 1
    i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') { starts(wi) = i + 1; wi += 1 }; i += 1 }
    starts(words) = bytes.length + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, starts(i), starts(i + k) - 1 - starts(i))
      val d = md.digest()
      hs(i) = ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
        ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
        ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
      i += 1
    }
    val wl = math.min(w, m)
    // monotonic deque of indices: popping `>=` keeps the LATEST among
    // equal minima at the front => front is the rightmost window min
    val idx = new Array[Int](m)
    var head = 0
    var tail = 0
    val out = new scala.collection.mutable.ArrayBuffer[Any](2 * m / (w + 1) + 2)
    var last = -1
    i = 0
    while (i < m) {
      while (tail > head && hs(idx(tail - 1)) >= hs(i)) tail -= 1
      idx(tail) = i; tail += 1
      if (idx(head) <= i - wl) head += 1
      if (i >= wl - 1) {
        val p = idx(head)
        if (p != last) {
          out += org.apache.spark.sql.catalyst.InternalRow((p + 1).toLong, hs(p))
          last = p
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /**
   * Fixed-size overlapping token chunks (RAG-ingestion splitting):
   * chunk starts at k·stride for k = 0 .. nChunks−1 with
   * nChunks = 1 if n ≤ size else ceil((n − size)/stride) + 1 — every
   * token covered, the last chunk ending exactly at the doc tail.
   * Emits (chunk_idx, start_token, n_tokens, fp) where fp is the
   * first 48 md5 bits of the chunk text (the original byte range:
   * words split on single spaces, empties kept — so the SQL oracle
   * recomputes it from array_to_string identically). One fused kernel
   * call per row, O(total chunk bytes).
   */
  def chunkFingerprints(text: UTF8String, size: Int, stride: Int): ArrayData = {
    val bytes = text.getBytes
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    var wi = 1
    i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') { starts(wi) = i + 1; wi += 1 }; i += 1 }
    starts(words) = bytes.length + 1
    val nChunks =
      if (words <= size) 1 else ((words - size + stride - 1) / stride) + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val s = k * stride
      val len = math.min(size, words - s)
      md.reset()
      md.update(bytes, starts(s), starts(s + len) - 1 - starts(s))
      val d = md.digest()
      val fp = ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
        ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
        ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        k.toLong, s.toLong, len.toLong, fp)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** k min-hashes over pre-hashed shingles (same permutations as
    * [[minHash]], so signatures are interchangeable). */
  def minHashFromHashes(hashes: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val h = splitmix64(base + j * Gold)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /**
   * In-bucket simhash pair scan over array<struct<id, sig>>: all
   * (a, b) with a.id < b.id and popcount(a.sig XOR b.sig) <= maxDist,
   * as array<struct<a_id, b_id, dist>>. One native double loop over
   * primitive arrays replaces the nested higher-order-function
   * expression tree (transform/filter/flatten) that paid ~75 ns of
   * interpretive struct machinery per pair-check — the k² scan is the
   * simhash blocker's hot loop (Σk² ≈ 17 M checks at bench scale), so
   * the per-check constant IS the query cost. Semantics identical to
   * the SQL-expression form, including duplicate-id behavior
   * (identical ids never pair: a.id < b.id fails both ways).
   */
  def simhashBucketPairs(xs: ArrayData, maxDist: Int): ArrayData = {
    val n = xs.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = xs.getStruct(i, 2)
      ids(i) = r.getLong(0)
      sigs(i) = r.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (ids(i) < ids(j)) {
          val d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
          if (d <= maxDist)
            out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](ids(i), ids(j), d))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** simhash_bucket_pairs(array<struct<id,sig>>, maxDist) ->
  * array<struct<a_id,b_id,dist>> — the in-bucket k² scan as one
  * native kernel call per bucket row. */
case class SimhashBucketPairsExpr(child: Expression, maxDist: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName arg 1 expects array<struct<long, long>>, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("dist", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_bucket_pairs"
  protected override def nullSafeEval(xs: Any): Any =
    TextHash.simhashBucketPairs(xs.asInstanceOf[ArrayData], maxDist)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      xs => s"graft.functions.TextHash.simhashBucketPairs($xs, $maxDist)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash_text(text) -> long (== simhash(split(text, ' '))) */
case class SimHashTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, StringType, s"$prettyName arg 1")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_text"
  protected override def nullSafeEval(t: Any): Any =
    TextHash.simHashText(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHash.simHashText($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** shingle_hashes(text, n) -> array<long> (distinct, ascending) */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, StringType, s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  protected override def nullSafeEval(t: Any): Any =
    TextHash.shingleHashes(t.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHash.shingleHashes($t, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_ngrams(text, n) -> array<string> (in order, with duplicates) */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, StringType, s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"
  protected override def nullSafeEval(t: Any): Any =
    TextHash.wordNgrams(t.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHash.wordNgrams($t, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_fps(text, k, w) -> array<struct<pos:long, fp:long>> */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, StringType, s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"
  protected override def nullSafeEval(t: Any): Any =
    TextHash.winnowFingerprints(t.asInstanceOf[UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHash.winnowFingerprints($t, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** chunk_fps(text, size, stride) ->
  * array<struct<chunk_idx:long, start_token:long, n_tokens:long, fp:long>> */
case class ChunkFingerprintsExpr(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {
  require(size > 0 && stride > 0 && stride <= size,
    "chunk_fps needs 0 < stride <= size")
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, StringType, s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("chunk_idx", LongType, nullable = false),
      StructField("start_token", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chunk_fps"
  protected override def nullSafeEval(t: Any): Any =
    TextHash.chunkFingerprints(t.asInstanceOf[UTF8String], size, stride)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextHash.chunkFingerprints($t, $size, $stride)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_hashes(hashes array<long>, k) -> array<long> */
case class MinHashFromHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(LongType), s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_hashes"
  protected override def nullSafeEval(a: Any): Any =
    TextHash.minHashFromHashes(a.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.minHashFromHashes($a, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash(shingles array<string>, k) -> array<long> (k fixed at plan time) */
case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(StringType), s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash"
  protected override def nullSafeEval(a: Any): Any =
    TextHash.minHash(a.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.minHash($a, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash(tokens array<string>) -> long */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(StringType), s"$prettyName arg 1")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"
  protected override def nullSafeEval(a: Any): Any =
    TextHash.simHash(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHash.simHash($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
