package graft.plans

import graft.functions.{GorillaChunkAgg, GorillaDecode, GorillaDecodeTimestamps, GorillaDecodeValues, GorillaNumPoints}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Optimizer rule: aggregate pushdown THROUGH the codec. A
 * count/min/max aggregate over exploded decoded points
 *
 *   Aggregate(keys, [count(1), min(ts), max(v)],
 *     Project(.., Generate(explode(gorilla_decode(chunk)), .., pt, child)))
 *
 * never needs per-point rows: every aggregate it computes is
 * derivable from the per-chunk partials `gorilla_chunk_agg` streams
 * out of the compressed bytes (count == Σn, min over points == min
 * over per-chunk minima). Rewrite to
 *
 *   Aggregate(keys, [sum(__ca.n), min(__ca.min_ts), max(__ca.max_v)],
 *     Filter(__ca.n > 0, Project(.. :+ gorilla_chunk_agg(chunk) AS __ca, child)))
 *
 * which decodes each chunk ONCE in a fused streaming kernel and feeds
 * the hash aggregate ONE row per chunk instead of one per point — at
 * 7200 points/chunk that is a 7200× cut in rows through the
 * aggregate, with no point structs or arrays materialized at all.
 * The `n > 0` filter keeps group-presence semantics exact for empty
 * chunks (explode of an empty chunk produces no rows, so a group with
 * only empty chunks must stay absent).
 *
 * Only order-independent aggregates rewrite. Count/Min/Max map onto
 * chunk-header stats (bit-exact under any regrouping), and the
 * fixed-point sum shape `sum(cast(round(v * c) as long))` maps onto a
 * per-chunk long partial (`__ca.sum_fixed`, computed with Spark's
 * exact round/cast semantics inside the streaming decode) — long
 * addition is associative, so regrouping the partials cannot change
 * the result. Sum over raw double stays on the explode path:
 * reassociating a float sum would change the result.
 * Composes with [[DecodeNarrowRule]] (narrowed single-side decodes are
 * matched too) and [[ChunkPruneRule]] (same fixpoint batch).
 *
 * Reference counterpart: the reference example decodes every point to
 * aggregate (examples/csv_to_packed.rs:90-118); this rule answers the
 * same aggregates from one streaming pass per chunk.
 */
object ChunkAggRule extends Rule[LogicalPlan] {

  private sealed trait Side
  private case object TsSide extends Side
  private case object VSide extends Side

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(group, aggExprs,
        Project(plist, Generate(e: Explode, _, false, _, Seq(pt), child)), _) =>
      rewrite(agg, group, aggExprs, plist, e.child, pt, child).getOrElse(agg)
    case agg @ Aggregate(group, aggExprs,
        Generate(e: Explode, _, false, _, Seq(pt), child), _) =>
      rewrite(agg, group, aggExprs, Nil, e.child, pt, child).getOrElse(agg)
  }

  /** The chunk expression and what the generator element is: a full
    * point struct (None) or a single side (Some). */
  private def decodeOf(e: Expression): Option[(Expression, Option[Side])] = e match {
    case GorillaDecode(c) => Some((c, None))
    case GetStructField(GorillaDecode(c), 0, _) => Some((c, Some(TsSide)))
    case GetStructField(GorillaDecode(c), 1, _) => Some((c, Some(VSide)))
    case GorillaDecodeTimestamps(c) => Some((c, Some(TsSide)))
    case GorillaDecodeValues(c) => Some((c, Some(VSide)))
    case Alias(inner, _) => decodeOf(inner)
    case _ => None
  }

  private def rewrite(agg: Aggregate, group: Seq[Expression],
                      aggExprs: Seq[NamedExpression], plist: Seq[NamedExpression],
                      dec: Expression, pt: Attribute,
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (chunk, elemSide) = decodeOf(dec).getOrElse(return None)
    // inline the interposed Project so aggregate args are expressed
    // over pt and child attributes directly
    val sub: Map[ExprId, Expression] =
      plist.collect { case a @ Alias(c, _) => a.exprId -> c }.toMap
    def inline(x: Expression): Expression = x.transformUp {
      case a: Attribute if sub.contains(a.exprId) => sub(a.exprId)
    }
    def sideOf(x: Expression): Option[Side] = inline(x) match {
      case a: Attribute if a.exprId == pt.exprId => elemSide
      case GetStructField(a: Attribute, 0, _)
        if a.exprId == pt.exprId && elemSide.isEmpty => Some(TsSide)
      case GetStructField(a: Attribute, 1, _)
        if a.exprId == pt.exprId && elemSide.isEmpty => Some(VSide)
      case _ => None
    }
    def touchesPt(x: Expression): Boolean =
      inline(x).exists { case a: Attribute => a.exprId == pt.exprId; case _ => false }

    if (group.exists(touchesPt)) return None

    // fixed-point sum pushdown: sum(cast(round(v * c, 0) as long)) has
    // a per-chunk long partial. All such sums in one aggregate must
    // share the scale c AND the cast's eval mode (the kernel computes
    // one fixed sum): ANSI casts throw on NaN/Inf/overflow and the
    // rewrite must error exactly where the un-rewritten query would,
    // so the mode rides into the kernel; TRY casts (null on overflow)
    // are not replicated — bail.
    def fixedScaleOf(x: Expression): Option[(Double, Boolean)] = inline(x) match {
      case Cast(r: Round, LongType, _, mode)
          if mode != EvalMode.TRY && r.scale.foldable && r.scale.eval() == 0 =>
        r.child match {
          case Multiply(a, Literal(c: Double, DoubleType), _)
            if sideOf(a).contains(VSide) => Some((c, mode == EvalMode.ANSI))
          case Multiply(Literal(c: Double, DoubleType), b, _)
            if sideOf(b).contains(VSide) => Some((c, mode == EvalMode.ANSI))
          case _ => None
        }
      case _ => None
    }
    // second-moment pushdown: sum(cents * cents) where both factors are
    // the same fixed-point shape maps onto the per-chunk sumsq_fixed
    // long partial — variance/stddev/3-sigma aggregates then need no
    // point rows (long addition is associative, so regrouping the
    // partials cannot change the result).
    def fixedSqScaleOf(x: Expression): Option[(Double, Boolean)] = inline(x) match {
      case Multiply(a, b, _) =>
        (fixedScaleOf(a), fixedScaleOf(b)) match {
          case (sa @ Some(_), sb) if sa == sb => sa
          case _ => None
        }
      case _ => None
    }
    var scale: Option[(Double, Boolean)] = None
    aggExprs.foreach(_.foreach {
      case AggregateExpression(s: Sum, _, false, None, _) =>
        fixedScaleOf(s.child).orElse(fixedSqScaleOf(s.child)) match {
          case Some(c) =>
            if (scale.exists(_ != c)) return None else scale = Some(c)
          case None => ()
        }
      case _ => ()
    })

    val ca = Alias(GorillaChunkAgg(chunk, scale.map(_._1),
      scale.exists(_._2)), "__ca")()
    val caAttr = ca.toAttribute
    def field(i: Int, name: String) =
      GetStructField(caAttr, i, Some(name))

    // every aggregate function must map onto a chunk-header stat;
    // top-down so the AggregateExpression is replaced wholesale before
    // its point-referencing argument would trip the attribute guard
    val rewritten = aggExprs.map { ne =>
      val t = ne.transformDown {
        case ae @ AggregateExpression(fn, _, false, None, _) =>
          val newFn: AggregateFunction = fn match {
            case Count(cs) if cs.forall(c => c.foldable || sideOf(c).isDefined) =>
              Sum(field(0, "n"))
            case Min(x) => sideOf(x) match {
              case Some(TsSide) => Min(field(1, "min_ts"))
              case Some(VSide) => Min(field(3, "min_v"))
              case None => return None
            }
            case Max(x) => sideOf(x) match {
              case Some(TsSide) => Max(field(2, "max_ts"))
              case Some(VSide) => Max(field(4, "max_v"))
              case None => return None
            }
            case s: Sum if scale.isDefined && fixedScaleOf(s.child) == scale =>
              Sum(field(6, "sum_fixed"))
            case s: Sum if scale.isDefined && fixedSqScaleOf(s.child) == scale =>
              Sum(field(7, "sumsq_fixed"))
            case _ => return None
          }
          ae.copy(aggregateFunction = newFn)
        case other: AggregateExpression => return None
        case a: Attribute if sub.contains(a.exprId) =>
          if (touchesPt(a)) return None else inline(a)
      }
      // keep top-level names AND exprIds stable: when the root itself
      // was substituted (a bare attribute resolving to a Project alias,
      // e.g. a withColumn-derived group key echoed in the output list),
      // the inlined expression is no longer the same NamedExpression —
      // re-wrap it so parent operators' references still resolve
      t match {
        case n: NamedExpression if n.exprId == ne.exprId => n
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    val newGroup = group.map(inline)
    if ((rewritten ++ newGroup).exists(_.exists(
      { case a: Attribute => a.exprId == pt.exprId || sub.contains(a.exprId); case _ => false })))
      return None

    // the empty-chunk guard uses the O(1) header probe, NOT __ca.n:
    // predicate pushdown moves this filter below the Project, and a
    // __ca-based guard would then re-evaluate the full chunk decode
    Some(agg.copy(groupingExpressions = newGroup, aggregateExpressions = rewritten,
      child = Project(child.output :+ ca,
        Filter(GreaterThan(GorillaNumPoints(chunk), Literal(0)), child))))
  }
}
