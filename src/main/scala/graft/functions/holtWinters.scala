package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Double exponential smoothing (PromQL holt_winters) as ONE fused
 * kernel call per series — the SURVEY §5 fuse-to-native rule applied
 * to the last HOF fold in the repo (r8 verdict "Next round" #4): the
 * previous `aggregate(slice(transform(...)))` spelling referenced the
 * derived value array at 4 positions, and Catalyst's project collapse
 * inlined the `transform` into each consumer (a constant-factor ~4x
 * re-evaluation). Here the (ts, cents)-sorted point array folds once,
 * in registration order, with the EXACT IEEE expression tree the
 * DuckDB recursive-CTE oracle evaluates:
 *
 *   x_i = cents_i / 100.0
 *   l_1 = x_1;  t_1 = x_1 - x_0
 *   l_i = sf*x_i + (1-sf)*(l + t)
 *   t_i = tf*(l_i - l) + (1-tf)*t
 *
 * (the `l_i` subterm is computed once — the same VALUE the oracle's
 * verbatim-duplicated subterm yields, so the emitted doubles stay
 * bit-identical). Input order is irrelevant: the kernel sorts by
 * (ts, cents) internally, exactly like the sort_array the query used.
 * Arrays with < 2 points yield null (the query's n >= 2 filter).
 */
object HoltWinters {
  val outType: StructType = StructType(Seq(
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false)))

  def fold(points: ArrayData, sf: Double, tf: Double): InternalRow = {
    val n = points.numElements()
    if (n < 2) return null
    val ts = new Array[Long](n)
    val cs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = points.getStruct(i, 2)
      ts(i) = r.getLong(0); cs(i) = r.getLong(1)
      i += 1
    }
    val order = Array.range(0, n).sortBy(j => (ts(j), cs(j)))
    def x(j: Int): Double = cs(order(j)).toDouble / 100.0
    var l = x(1)
    var t = x(1) - x(0)
    i = 2
    while (i < n) {
      val v = x(i)
      val nl = sf * v + (1.0 - sf) * (l + t)
      val nt = tf * (nl - l) + (1.0 - tf) * t
      l = nl; t = nt
      i += 1
    }
    InternalRow(l, t)
  }
}

/** hw_fold(points array<struct<ts:long, cents:long>>, sf, tf) ->
  * struct<level:double, trend:double> (null when < 2 points). */
case class HoltWintersFoldExpr(child: Expression, sf: Double, tf: Double)
    extends UnaryExpression {
  require(sf > 0 && sf < 1 && tf > 0 && tf < 1,
    "hw_fold needs smoothing factors in (0, 1)")
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, graft.functions.Lttb.pointArrayType, s"$prettyName arg 1")
  override def dataType: DataType = HoltWinters.outType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hw_fold"
  protected override def nullSafeEval(p: Any): Any =
    HoltWinters.fold(p.asInstanceOf[ArrayData], sf, tf)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => s"""
      ${ev.value} = graft.functions.HoltWinters.fold($p, ${sf}D, ${tf}D);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
