package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, the
 * Grafana default) on the exact integer grid — the perceptual
 * companion to M4: M4 preserves per-pixel extremes, LTTB preserves
 * the visual SHAPE of a line by keeping, per bucket, the point that
 * spans the largest triangle with the previously kept point and the
 * next bucket's centroid.
 *
 * All-integer selection: with ts in seconds and values in cents, the
 * doubled-and-count-scaled triangle area
 *   |(prev_t·n − Σx)·(c − prev_c) − (prev_t − t)·(Σy − n·prev_c)|
 * is an exact Long (the classic formulation's /n average and /2 area
 * scale every candidate in a bucket equally, so dropping them keeps
 * the argmax). Ties break to the earliest (ts, cents) — matched by
 * the oracle's max(struct(area, −ts, −cents)). The whole selection is
 * therefore bit-exactly reproducible by the recursive-CTE oracle.
 *
 * ONE fused kernel call per series (sort + bucket scan, O(n log n))
 * per the SURVEY §5 rule — per-row multi-pass array algorithms never
 * ride HOF pipelines where project collapse can re-inline them.
 */
object Lttb {
  val pointType: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))
  val pointArrayType: ArrayType = ArrayType(pointType, containsNull = false)

  /** Select `nOut` LTTB points from (ts, cents) pairs; input order is
    * irrelevant (sorted internally by (ts, cents)); if n <= nOut every
    * point is kept. Returns the selected points in ts order. */
  def select(points: ArrayData, nOut: Int): ArrayData = {
    val n = points.numElements()
    val ts = new Array[Long](n)
    val cs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = points.getStruct(i, 2)
      ts(i) = r.getLong(0); cs(i) = r.getLong(1)
      i += 1
    }
    // sort by (ts, cents) — deterministic under duplicate timestamps
    val order = Array.range(0, n).sortBy(j => (ts(j), cs(j)))
    val st = order.map(ts); val sc = order.map(cs)
    def row(j: Int): Any = InternalRow(st(j), sc(j))
    if (n <= nOut)
      return new GenericArrayData(Array.tabulate[Any](n)(row))
    val b = nOut - 2 // middle buckets over points 1..n-2
    // nOut=2 selects only the endpoints — no area math runs at all,
    // so skip the bound check (whose nnMax term would divide by b=0)
    if (b == 0)
      return new GenericArrayData(Array[Any](row(0), row(n - 1)))
    // Magnitude precondition: the all-Long area product below is exact
    // only while 2·bucketSize·tsRange·centsRange < 2⁶³ — comfortably
    // true on the seconds/cents grid this engine uses, but nanosecond
    // timestamps or astronomic values would silently wrap and select
    // wrong points. One O(n) BigInt bound check per call catches that
    // loudly instead (the oracle CTE would error rather than wrap, so
    // a wrap here would otherwise surface only as a verify mismatch).
    var cMin = sc(0); var cMax = sc(0)
    i = 1
    while (i < n) {
      if (sc(i) < cMin) cMin = sc(i)
      if (sc(i) > cMax) cMax = sc(i)
      i += 1
    }
    val nnMax = BigInt((n - 2).toLong / b + 2)
    val bound = 2 * nnMax * (BigInt(st(n - 1)) - BigInt(st(0))) * (BigInt(cMax) - BigInt(cMin))
    if (bound > Long.MaxValue)
      throw new ArithmeticException(
        s"lttb_select: inputs exceed the exact-Long area bound " +
          s"(2*bucket*tsRange*centsRange = $bound > 2^63-1); rescale ts to " +
          s"seconds / values to a coarser integer grid")
    val out = new Array[Any](nOut)
    out(0) = row(0)
    var prevT = st(0); var prevC = sc(0)
    var k = 0
    while (k < b) {
      // middle bucket k covers sorted indices [bs, be); 0-based over
      // the n-2 interior points starting at index 1
      val bs = 1 + (k.toLong * (n - 2) / b).toInt
      val be = 1 + ((k + 1).toLong * (n - 2) / b).toInt
      // next anchor: bucket k+1's sums, or the final point
      var sx = 0L; var sy = 0L; var nn = 0L
      if (k == b - 1) { sx = st(n - 1); sy = sc(n - 1); nn = 1L }
      else {
        val ns = 1 + ((k + 1).toLong * (n - 2) / b).toInt
        val ne = 1 + ((k + 2).toLong * (n - 2) / b).toInt
        var j = ns
        while (j < ne) { sx += st(j); sy += sc(j); nn += 1; j += 1 }
      }
      var bestA = -1L; var bestJ = -1
      var j = bs
      while (j < be) {
        val a = math.abs((prevT * nn - sx) * (sc(j) - prevC) -
          (prevT - st(j)) * (sy - nn * prevC))
        if (a > bestA) { bestA = a; bestJ = j } // strict: earliest wins ties
        j += 1
      }
      out(k + 1) = row(bestJ)
      prevT = st(bestJ); prevC = sc(bestJ)
      k += 1
    }
    out(nOut - 1) = row(n - 1)
    new GenericArrayData(out)
  }
}

/** lttb_select(points array<struct<ts:long, cents:long>>, nOut) ->
  * array<struct<ts:long, cents:long>> */
case class LttbSelectExpr(child: Expression, nOut: Int) extends UnaryExpression {
  require(nOut >= 2, "lttb_select needs nOut >= 2 (first + last point)")
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, Lttb.pointArrayType, s"$prettyName arg 1")
  override def dataType: DataType = Lttb.pointArrayType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lttb_select"
  protected override def nullSafeEval(p: Any): Any =
    Lttb.select(p.asInstanceOf[ArrayData], nOut)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.Lttb.select($p, $nOut)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
