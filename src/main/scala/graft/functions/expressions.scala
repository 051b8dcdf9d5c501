package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the Gorilla codec. All implement
 * `doGenCode` by invoking [[GorillaSql]] static forwarders, so they stay
 * inside whole-stage codegen (no UDF/serialization overhead) while the
 * bit-twiddling lives in plain JVM code.
 */
object GorillaExprs {
  val pointType: StructType =
    StructType(Seq(StructField("ts", LongType, nullable = false),
                   StructField("v", DoubleType, nullable = false)))
  val pointArrayType: ArrayType = ArrayType(pointType, containsNull = false)
  val aggType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min_ts", LongType, nullable = false),
    StructField("max_ts", LongType, nullable = false),
    StructField("min_v", DoubleType, nullable = false),
    StructField("max_v", DoubleType, nullable = false),
    StructField("sum_v", DoubleType, nullable = false),
    StructField("sum_fixed", LongType, nullable = false),
    StructField("sumsq_fixed", LongType, nullable = false)))
  val rangeAggType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min_ts", LongType, nullable = false),
    StructField("max_ts", LongType, nullable = false),
    StructField("min_v", DoubleType, nullable = false),
    StructField("max_v", DoubleType, nullable = false),
    StructField("sum_cents", LongType, nullable = false),
    StructField("sumsq_cents", LongType, nullable = false)))
  val bucketAggType: ArrayType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("min_v", DoubleType, nullable = false),
    StructField("max_v", DoubleType, nullable = false),
    StructField("sum_fixed", LongType, nullable = false),
    StructField("sumsq_fixed", LongType, nullable = false))), containsNull = false)

  /** AbstractDataType is private[sql] in Spark 4, so graft expressions
    * type-check inputs explicitly instead of via ExpectsInputTypes. */
  def expect(e: Expression, expected: DataType, pos: String): TypeCheckResult =
    if (DataType.equalsIgnoreCaseAndNullability(e.dataType, expected)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$pos must be ${expected.simpleString}, got ${e.dataType.simpleString}")
}

/** gorilla_encode(points array<struct<ts,v>>, header_time long) -> binary */
case class GorillaEncode(points: Expression, headerTime: Expression, leadTrail: Boolean)
    extends BinaryExpression {
  override def left: Expression = points
  override def right: Expression = headerTime
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(points, GorillaExprs.pointArrayType, s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(headerTime, LongType, s"$prettyName arg 2")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (leadTrail) "gorilla_encode_lt" else "gorilla_encode"

  protected override def nullSafeEval(pts: Any, ht: Any): Any =
    GorillaSql.encode(pts.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      ht.asInstanceOf[Long], leadTrail)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, h) => s"graft.functions.GorillaSql.encode($p, $h, $leadTrail)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(points = l, headerTime = r)
}

/** gorilla_encode_values(values array<double>) -> binary */
case class GorillaEncodeValues(child: Expression, leadTrail: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, ArrayType(DoubleType), s"$prettyName arg 1")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gorilla_encode_values"

  protected override def nullSafeEval(vs: Any): Any =
    GorillaSql.encodeValues(vs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], leadTrail)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.GorillaSql.encodeValues($v, $leadTrail)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

abstract class GorillaDecodeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, BinaryType, s"$prettyName arg 1")
  override def nullIntolerant: Boolean = true
  protected def method: String

  protected override def nullSafeEval(bytes: Any): Any = evalBytes(bytes.asInstanceOf[Array[Byte]])
  protected def evalBytes(bytes: Array[Byte]): Any

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.GorillaSql.$method($b)")
}

/** gorilla_decode(binary) -> array<struct<ts: long, v: double>> */
case class GorillaDecode(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = GorillaExprs.pointArrayType
  override def prettyName: String = "gorilla_decode"
  protected def method: String = "decode"
  protected def evalBytes(bytes: Array[Byte]): Any = GorillaSql.decode(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** gorilla_decode_values(binary) -> array<double> */
case class GorillaDecodeValues(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gorilla_decode_values"
  protected def method: String = "decodeValues"
  protected def evalBytes(bytes: Array[Byte]): Any = GorillaSql.decodeValues(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** gorilla_decode_ts(binary) -> array<long> */
case class GorillaDecodeTimestamps(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gorilla_decode_ts"
  protected def method: String = "decodeTimestamps"
  protected def evalBytes(bytes: Array[Byte]): Any = GorillaSql.decodeTimestamps(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** gorilla_chunk_agg(binary) ->
  * struct<n,min_ts,max_ts,min_v,max_v,sum_v,sum_fixed,sumsq_fixed>
  * Aggregates by streaming the decoder — never materializes point
  * arrays. `fixedScale` (set by [[graft.plans.ChunkAggRule]] when it
  * pushes a fixed-point sum through the codec) makes `sum_fixed` carry
  * Σ round(v·scale) and `sumsq_fixed` Σ round(v·scale)² as longs;
  * absent, the fields are 0 and the per-point rounding work is
  * skipped. */
case class GorillaChunkAgg(child: Expression, fixedScale: Option[Double] = None,
                           fixedAnsi: Boolean = false)
    extends GorillaDecodeBase {
  override def dataType: DataType = GorillaExprs.aggType
  override def prettyName: String = "gorilla_chunk_agg"
  protected def method: String = "chunkAgg"
  protected def evalBytes(bytes: Array[Byte]): Any =
    GorillaSql.chunkAgg(bytes, fixedScale.getOrElse(0.0), fixedScale.isDefined, fixedAnsi)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.GorillaSql.chunkAgg($b, " +
      s"${fixedScale.getOrElse(0.0)}, ${fixedScale.isDefined}, $fixedAnsi)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** gorilla_chunk_agg_range(binary, from long, to long) ->
  * struct<n,min_ts,max_ts,min_v,max_v,sum_cents,sumsq_cents> —
  * streaming aggregate
  * over ONLY the points with from <= ts <= to; never materializes point
  * arrays. sum_cents is a fixed-point (1e-2) long sum, so chunk partials
  * re-aggregate exactly across shuffles. */
case class GorillaChunkAggRange(chunk: Expression, fromSec: Expression, toSec: Expression)
    extends TernaryExpression {
  override def first: Expression = chunk
  override def second: Expression = fromSec
  override def third: Expression = toSec
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(chunk, BinaryType, s"$prettyName arg 1")
    val r2 = if (r.isFailure) r else GorillaExprs.expect(fromSec, LongType, s"$prettyName arg 2")
    if (r2.isFailure) r2 else GorillaExprs.expect(toSec, LongType, s"$prettyName arg 3")
  }
  override def dataType: DataType = GorillaExprs.rangeAggType
  override def nullIntolerant: Boolean = true
  // NULL when the chunk has no point in [from, to] (see GorillaSql)
  override def nullable: Boolean = true
  override def prettyName: String = "gorilla_chunk_agg_range"

  protected override def nullSafeEval(b: Any, lo: Any, hi: Any): Any =
    GorillaSql.chunkAggRange(b.asInstanceOf[Array[Byte]],
      lo.asInstanceOf[Long], hi.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, lo, hi) => s"""
      ${ev.value} = graft.functions.GorillaSql.chunkAggRange($b, $lo, $hi);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(chunk = f, fromSec = s, toSec = t)
}

/** gorilla_chunk_bucket_agg(binary, bucketSec, scale) ->
  * array<struct<bucket,n,min_v,max_v,sum_fixed>> — compressed-domain
  * DOWNSAMPLE partials: one streaming decode folds a chunk into
  * per-bucket (count, nan-safe min/max, HALF_UP fixed sum) rows —
  * ≤ windowSec/bucketSec rows per chunk instead of one per point. */
case class GorillaChunkBucketAgg(child: Expression, bucketSec: Long, scale: Double,
                                 ansi: Boolean = false)
    extends GorillaDecodeBase {
  override def dataType: DataType = GorillaExprs.bucketAggType
  override def prettyName: String = "gorilla_chunk_bucket_agg"
  protected def method: String = "chunkBucketAgg"
  protected def evalBytes(bytes: Array[Byte]): Any =
    GorillaSql.chunkBucketAgg(bytes, bucketSec, scale, ansi)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.GorillaSql.chunkBucketAgg($b, ${bucketSec}L, $scale, $ansi)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** gorilla_is_valid(binary) -> boolean — O(1) header sanity probe;
  * `filter(gorilla_is_valid(chunk))` lets a 100 TB scan skip bit-rot
  * rows instead of failing the job. */
case class GorillaIsValid(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "gorilla_is_valid"
  protected def method: String = "isValid"
  protected def evalBytes(bytes: Array[Byte]): Any = GorillaSql.isValid(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** gorilla_num_points(binary) -> int — O(1), header-only read. */
case class GorillaNumPoints(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "gorilla_num_points"
  protected def method: String = "numPoints"
  protected def evalBytes(bytes: Array[Byte]): Any = GorillaSql.numPoints(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
