package graft.plans

import graft.functions.{GorillaDecode, GorillaDecodeTimestamps, GorillaDecodeValues}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Optimizer rule: narrow a full-point decode to a single-side decode
 * when the query consumes only one side of the point struct.
 *
 *   Project(.. __p.v .., Generate(explode(gorilla_decode(chunk))))
 *     ==> Project(.. v ..,  Generate(explode(gorilla_decode_values(chunk))))
 *
 * (and symmetrically `__p.ts` ==> `gorilla_decode_ts`). A full decode
 * materializes an array<struct<ts,v>> — one InternalRow per point;
 * the narrowed decode returns a primitive long/double array, so a
 * values-only scan (histograms, quality filters, value aggregates)
 * never allocates point structs at all. This is projection pushdown
 * through the codec, the column-pruning analogue of what
 * [[ChunkPruneRule]] does for filters; the two compose — the narrowed
 * shape is one ChunkPruneRule already recognizes for stat guards.
 *
 * Matched shapes: a Project directly over the Generate, or over one
 * interposed point-level Filter (CollapseProject/ColumnPruning run in
 * the same fixpoint batch, so stacked Projects have already merged by
 * the time this rule sees the plan). The rewrite only fires when every
 * reference to the point struct is a GetStructField of the SAME
 * ordinal and the struct itself never escapes whole.
 */
object DecodeNarrowRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, g @ Generate(e: Explode, _, false, _, Seq(pt), _))
        if decodeChild(e.child).isDefined =>
      narrow(projList, None, g, e, pt).getOrElse(p)
    case p @ Project(projList,
        f @ Filter(cond, g @ Generate(e: Explode, _, false, _, Seq(pt), _)))
        if decodeChild(e.child).isDefined =>
      narrow(projList, Some(cond), g, e, pt).map { case Project(pl, ng) =>
        Project(pl, Filter(rewriteRefs(cond, pt, ng.asInstanceOf[Generate].generatorOutput.head), ng))
      }.getOrElse(p)
  }

  /** The chunk expression beneath gorilla_decode, if this is one. */
  private def decodeChild(e: Expression): Option[Expression] = e match {
    case GorillaDecode(c) => Some(c)
    case Alias(GorillaDecode(c), _) => Some(c)
    case _ => None
  }

  /** Ordinals referenced via GetStructField, and whether the struct
    * attribute is ever used whole (which blocks the rewrite). */
  private def refs(exprs: Seq[Expression], pt: Attribute): (Set[Int], Boolean) = {
    var ords = Set.empty[Int]
    var whole = false
    def visit(x: Expression): Unit = x match {
      case GetStructField(a: Attribute, o, _) if a.exprId == pt.exprId => ords += o
      case a: Attribute if a.exprId == pt.exprId => whole = true
      case other => other.children.foreach(visit)
    }
    exprs.foreach(visit)
    (ords, whole)
  }

  private def rewriteRefs(e: Expression, pt: Attribute, to: Attribute): Expression =
    e.transform {
      case GetStructField(a: Attribute, _, _) if a.exprId == pt.exprId => to
    }

  private def narrow(projList: Seq[NamedExpression], cond: Option[Expression],
                     g: Generate, e: Explode, pt: Attribute): Option[Project] = {
    val (ords, whole) = refs(projList ++ cond.toSeq, pt)
    if (whole || ords.size != 1) return None
    val chunk = decodeChild(e.child).get
    val (newDec, attr) = ords.head match {
      case 0 => (GorillaDecodeTimestamps(chunk), AttributeReference("ts", LongType, nullable = false)())
      case 1 => (GorillaDecodeValues(chunk), AttributeReference("v", DoubleType, nullable = false)())
      case _ => return None
    }
    val newG = g.copy(generator = Explode(newDec), generatorOutput = Seq(attr))
    newG.copyTagsFrom(g)
    Some(Project(
      projList.map(ne => rewriteRefs(ne, pt, attr).asInstanceOf[NamedExpression]),
      newG))
  }
}
