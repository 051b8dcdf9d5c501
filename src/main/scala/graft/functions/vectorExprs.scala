package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * One-pass vector/set kernels for the similarity and dedup operators.
 * These replace interpreted higher-order-function chains (zip_with +
 * aggregate lambdas) in the hot inner loops of all-pairs work: one
 * JVM loop per row pair instead of per-element lambda dispatch.
 */
object VectorKernels {

  /** Mismatched vector lengths must fail loudly: UnsafeArrayData.getFloat
    * does no bounds check, so iterating past the shorter array would
    * silently read out-of-bounds memory and return garbage scores. */
  private def sameLength(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Cosine similarity, float inputs widened to double, accumulated in
    * index order — numerically identical to the three-sum SQL form. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = sameLength(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = sameLength(a, b)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  def l2sqFloat(a: ArrayData, b: ArrayData): Double = {
    val n = sameLength(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  /** Full PQ encode of one vector: per subspace j the code of the
    * nearest codeword by l2 (ties → smallest code; codewords arrive
    * sorted by code ascending and strictly-less keeps the first, so
    * the result is bit-identical to `min(struct(l2sq, code))` over the
    * exploded join it replaces). Subspace slicing matches
    * Similarity.subspaces: dsub = dim/m, the LAST subspace absorbs the
    * `dim % m` trailing dims. One kernel call per corpus row — the
    * encode pass is map-only (the exploded ×ksub join + per-(id, j)
    * hash aggregate + pack shuffle it replaces spilled at 2M vectors). */
  def pqEncodeAll(vec: ArrayData, codes: Array[Array[Int]],
                  books: Array[Array[Array[Float]]]): ArrayData = {
    val m = books.length
    val dim = vec.numElements()
    val dsub = dim / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val start = j * dsub
      val len = if (j == m - 1) dim - (m - 1) * dsub else dsub
      val cws = books(j)
      var best = Double.PositiveInfinity
      var bestCode = -1
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var s = 0.0
        var i = 0
        while (i < len) {
          val d = vec.getFloat(start + i).toDouble - cw(i).toDouble
          s += d * d
          i += 1
        }
        if (s < best) { best = s; bestCode = codes(j)(c) }
        c += 1
      }
      out(j) = bestCode
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Deterministic hyperplane component for (table, plane, dim) in [-1, 1). */
  private def component(t: Int, p: Int, d: Int): Double =
    TextHash.splitmix64(((t.toLong << 40) + (p.toLong << 20) + d) * TextHash.Gold)
      .toDouble / Long.MaxValue.toDouble

  /** One bucket id per hash table: sign-bit signature of nBits
    * hyperplane dots. Replaces per-component string hashing. */
  def hyperplaneBuckets(vec: ArrayData, nBits: Int, tables: Int): ArrayData = {
    val dims = vec.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) { v(i) = vec.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < nBits) {
        var dot = 0.0
        var d = 0
        while (d < dims) { dot += v(d) * component(t, p, d); d += 1 }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct FNV-64 hashes of a string array, sorted ascending. */
  def hashSetSorted(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = TextHash.fnv64(xs.getUTF8String(i)); i += 1 }
    java.util.Arrays.sort(hs)
    var uniq = 0
    var j = 0
    while (j < n) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(uniq) = hs(j); uniq += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, uniq))
  }

  /** Symmetric int8 scalar quantization: one byte per dimension,
    * code_i = clamp(round(v_i · invScale), −127, 127). With a single
    * per-corpus scale the quantized dot product ranks identically to
    * the dequantized approximate dot (the scale is a global constant
    * factor), so scoring can stay in exact integer arithmetic. */
  def sq8Encode(vec: ArrayData, invScale: Double): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = Math.round(vec.getFloat(i) * invScale)
      out(i) = (if (q > 127) 127 else if (q < -127) -127 else q.toInt).toByte
      i += 1
    }
    out
  }

  /** Integer dot product of two int8 code arrays — exact and
    * order-independent, so approximate ANN scores are bit-stable
    * across partitionings (unlike float accumulation). */
  /** ADC score of one PQ-coded vector against a query's dense lookup
    * table: Σ_j lut[j·ksub + codes[j]], summed in subspace order —
    * deterministic, unlike the exploded join+sum it replaces. ksub
    * derives from the shapes (lut carries m·ksub entries). */
  def adcScore(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    val lutLen = lut.numElements()
    if (m == 0 || lutLen % m != 0)
      throw new IllegalArgumentException(
        s"adc_score: lut length $lutLen not a multiple of m=$m")
    val ksub = lutLen / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(
          s"adc_score: code $c out of range [0, $ksub) at subspace $j")
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  def sq8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"code length mismatch: ${a.length} vs ${b.length}")
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }

  /** Spark's nan-safe "greater than" for doubles (NaN sorts above
    * everything), so centroid argmax ties resolve exactly as the
    * max(struct(cos, -cluster)) aggregate this kernel replaces. */
  @inline private def gtD(a: Double, b: Double): Boolean =
    (java.lang.Double.isNaN(a) && !java.lang.Double.isNaN(b)) || a > b
  @inline private def eqD(a: Double, b: Double): Boolean =
    a == b || (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b))

  /**
   * The `nprobe` nearest centroid ids for one vector, ordered by
   * cosine desc then centroid id asc — ONE row in, one array out.
   * Replaces the crossJoin(broadcast(centroids)) + argmax-aggregate
   * shape, which amplified a corpus scan ×nlist (at nlist=4096, 4096
   * rows through the hash aggregate per input row). Cosine math is
   * bit-identical to [[cosineFloat]]: double-widened, index order.
   */
  def nearestCentroids(vec: ArrayData, ids: Array[Int],
                       mat: Array[Array[Float]], nprobe: Int): ArrayData = {
    val dims = vec.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) { v(i) = vec.getFloat(i).toDouble; i += 1 }
    val k = math.min(nprobe, ids.length)
    val topC = new Array[Double](k)
    val topI = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < ids.length) {
      val cw = mat(c)
      if (cw.length != dims)
        throw new IllegalArgumentException(
          s"vector length mismatch: $dims vs ${cw.length}")
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < dims) {
        val x = v(d); val y = cw(d).toDouble
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      val id = ids(c)
      if (filled < k || gtD(cos, topC(k - 1)) ||
          (eqD(cos, topC(k - 1)) && id < topI(k - 1))) {
        var pos = if (filled < k) filled else k - 1
        while (pos > 0 && (gtD(cos, topC(pos - 1)) ||
            (eqD(cos, topC(pos - 1)) && id < topI(pos - 1)))) {
          topC(pos) = topC(pos - 1); topI(pos) = topI(pos - 1)
          pos -= 1
        }
        topC(pos) = cos; topI(pos) = id
        if (filled < k) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topI, filled))
  }

  /** |A ∩ B| of two ascending long arrays by linear merge. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** cosine_sim(a array<float>, b array<float>) -> double */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, ArrayType(FloatType), s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(right, ArrayType(FloatType), s"$prettyName arg 2")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosineFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_dot(array<float>, array<float>) -> double (index-order sum). */
case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, ArrayType(FloatType), s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(right, ArrayType(FloatType), s"$prettyName arg 2")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dotFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_l2sq(array<float>, array<float>) -> double (squared L2). */
case class VecL2SqExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, ArrayType(FloatType), s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(right, ArrayType(FloatType), s"$prettyName arg 2")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_l2sq"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2sqFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.l2sqFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hyperplane_buckets(vec array<float>, nBits, tables) -> array<long> */
case class HyperplaneBucketsExpr(child: Expression, nBits: Int, tables: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(FloatType), s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_buckets"
  protected override def nullSafeEval(a: Any): Any =
    VectorKernels.hyperplaneBuckets(a.asInstanceOf[ArrayData], nBits, tables)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.hyperplaneBuckets($a, $nBits, $tables)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nearest_centroids(vec array<float>) -> array<int>: the `nprobe`
  * nearest centroid ids by cosine (desc, ties by smaller id). The
  * centroid model rides the expression itself (serialized with the
  * plan, referenced once per codegen'd stage — the broadcast-literal
  * treatment for a bounded model table), so the corpus scan stays
  * 1-row-in/1-row-out instead of crossJoining ×nlist. */
case class NearestCentroidsExpr(child: Expression, ids: Array[Int],
                                mat: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(FloatType), s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"
  def kernel(v: ArrayData): ArrayData =
    VectorKernels.nearestCentroids(v, ids, mat, nprobe)
  protected override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroidsExpr].getName)
    defineCodeGen(ctx, ev, a => s"$ref.kernel($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_encode_all(vec array<float>) -> array<int>: the full m-subspace
  * PQ code of one vector. The codebook model rides the expression
  * (same broadcast-literal treatment as [[NearestCentroidsExpr]] — a
  * bounded ≤ m·ksub-codeword table), so corpus encoding is a MAP-ONLY
  * pass: 1 row in, 1 packed code row out — no ×ksub join, no
  * per-(id, j) aggregate, no pack shuffle. */
case class PqEncodeAllExpr(child: Expression, codes: Array[Array[Int]],
                           books: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(FloatType), s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode_all"
  def kernel(v: ArrayData): ArrayData =
    VectorKernels.pqEncodeAll(v, codes, books)
  protected override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeAll", this,
      classOf[PqEncodeAllExpr].getName)
    defineCodeGen(ctx, ev, a => s"$ref.kernel($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hash_set_sorted(array<string>) -> array<long> (distinct, ascending) */
case class HashSetSortedExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(StringType), s"$prettyName arg 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_set_sorted"
  protected override def nullSafeEval(a: Any): Any =
    VectorKernels.hashSetSorted(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.hashSetSorted($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sorted_intersect_count(array<long>, array<long>) -> int */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, ArrayType(LongType), s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(right, ArrayType(LongType), s"$prettyName arg 2")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sq8_encode(vec array<float>, invScale double) -> binary (int8 codes) */
case class Sq8EncodeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, ArrayType(FloatType), s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(right, DoubleType, s"$prettyName arg 2")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sq8Encode(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.sq8Encode($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** adc_score(codes array<int>, lut array<double>) -> double — PQ
  * asymmetric-distance score of one coded vector against a query's
  * dense LUT (see VectorKernels.adcScore). One codegen'd kernel call
  * per (query, vector) pair; replaces the exploded (n_id, j, code) ×
  * LUT join + re-grouping hash aggregate, which shuffled candidate×m
  * rows per query batch. */
case class AdcScoreExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, ArrayType(IntegerType), s"$prettyName arg 1")
    if (r.isFailure) r
    else GorillaExprs.expect(right, ArrayType(DoubleType), s"$prettyName arg 2")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_score"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.adcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.adcScore($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sq8_dot(binary, binary) -> long (exact integer dot of int8 codes) */
case class Sq8DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(left, BinaryType, s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(right, BinaryType, s"$prettyName arg 2")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sq8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.sq8Dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
