package graft.plans

import graft.functions.GorillaDecode
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.LongType

/**
 * Optimizer rule: chunk-level pruning for decoded time filters.
 *
 * A query that filters on the decoded timestamp —
 * `unpack(chunks).filter($"ts" >= lo && $"ts" <= hi)` — would decode
 * every chunk and then drop points. Chunk rows carry (min_ts, max_ts)
 * stats, so the same bounds can eliminate whole chunks *before*
 * `gorilla_decode` runs. `Ts.rangeQuery` does this by hand; this rule
 * does it for any plan of the shape
 *
 *   Filter( p.ts >= lo / <= hi [, ...] , Generate(explode(gorilla_decode(chunk)), child) )
 *
 * by injecting `Filter(max_ts >= lo AND min_ts <= hi, child)` beneath
 * the Generate (the stat conjuncts then push further down to the
 * parquet scan). The point-level filter is left untouched — stats
 * pruning is a superset guard, not a replacement.
 */
object ChunkPruneRule extends Rule[LogicalPlan] {
  private val Applied = TreeNodeTag[Boolean]("graft.chunkPruned")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, g @ Generate(e: Explode, _, _, _, _, gChild))
        if g.getTagValue(Applied).isEmpty && isDecode(e.child) =>
      val pointAttr = g.generatorOutput.headOption
      val bounds = pointAttr.map(a => tsBounds(cond, a)).getOrElse((None, None))
      val rewritten = bounds match {
        case (None, None) => None
        case (lo, hi) =>
          // stats may already be pruned from the Generate's direct
          // child; look through one Project to the plan that still
          // carries them (the chunk store scan)
          gChild match {
            case stats if hasStats(stats) =>
              Some(Filter(guards(stats, lo, hi), stats))
            case p @ Project(_, inner) if hasStats(inner) =>
              Some(p.copy(child = Filter(guards(inner, lo, hi), inner)))
            case _ => None
          }
      }
      rewritten match {
        case None => f
        case Some(pruned) =>
          val newG = g.copy(child = pruned)
          newG.setTagValue(Applied, true)
          Filter(cond, newG)
      }
  }

  private def guards(p: LogicalPlan, lo: Option[Long], hi: Option[Long]): Expression = {
    val minTs = p.output.find(_.name == "min_ts").get
    val maxTs = p.output.find(_.name == "max_ts").get
    val gs = lo.map(l => GreaterThanOrEqual(maxTs, Literal(l)).asInstanceOf[Expression]).toSeq ++
      hi.map(h => LessThanOrEqual(minTs, Literal(h)).asInstanceOf[Expression]).toSeq
    gs.reduce(And)
  }

  private def isDecode(e: Expression): Boolean = e match {
    case _: GorillaDecode => true
    case Alias(c, _) => isDecode(c)
    case _ => false
  }

  private def hasStats(p: LogicalPlan): Boolean = {
    val names = p.output.map(_.name).toSet
    names.contains("min_ts") && names.contains("max_ts") &&
      p.output.filter(a => a.name == "min_ts" || a.name == "max_ts")
        .forall(_.dataType == LongType)
  }

  /** (lower, upper) literal bounds on the decoded ts field (struct
    * ordinal 0 of the generator output) among the filter's conjuncts. */
  private def tsBounds(cond: Expression, point: Attribute): (Option[Long], Option[Long]) = {
    def isTs(e: Expression): Boolean = e match {
      case GetStructField(a: Attribute, 0, _) => a.exprId == point.exprId
      case _ => false
    }
    def longOf(l: Literal): Option[Long] = l.value match {
      case x: Long => Some(x)
      case x: Int => Some(x.toLong)
      case _ => None
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(t, l: Literal) if isTs(t) => lo = maxOpt(lo, longOf(l))
      case GreaterThan(t, l: Literal) if isTs(t) => lo = maxOpt(lo, longOf(l).map(_ + 1))
      case LessThanOrEqual(t, l: Literal) if isTs(t) => hi = minOpt(hi, longOf(l))
      case LessThan(t, l: Literal) if isTs(t) => hi = minOpt(hi, longOf(l).map(_ - 1))
      case GreaterThanOrEqual(l: Literal, t) if isTs(t) => hi = minOpt(hi, longOf(l))
      case LessThanOrEqual(l: Literal, t) if isTs(t) => lo = maxOpt(lo, longOf(l))
      case EqualTo(t, l: Literal) if isTs(t) =>
        lo = maxOpt(lo, longOf(l)); hi = minOpt(hi, longOf(l))
      case _ => ()
    }
    visit(cond)
    (lo, hi)
  }

  private def maxOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a.toSeq ++ b.toSeq).maxOption
  private def minOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a.toSeq ++ b.toSeq).minOption
}
