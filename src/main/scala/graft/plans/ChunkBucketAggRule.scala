package graft.plans

import graft.functions.{GorillaChunkBucketAgg, GorillaDecode, GorillaDecodeTimestamps, GorillaExprs}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Optimizer rule: DOWNSAMPLE pushdown through the codec — the
 * bucket-keyed sibling of [[ChunkAggRule]]. A time-bucketed aggregate
 * over exploded decoded points
 *
 *   Aggregate(keys :+ floor(p.ts / B) * B,
 *     [count(1), min(p.v), max(p.v), sum(cast(round(p.v*c) as long))],
 *     Project(.., Generate(explode(gorilla_decode(chunk)), .., pt, child)))
 *
 * never needs per-point rows: `gorilla_chunk_bucket_agg` folds each
 * chunk into per-bucket partials (count, nan-safe min/max, HALF_UP
 * fixed sums) in ONE streaming decode — ≤ windowSec/B rows per chunk
 * instead of one per point (a 2-h 1 Hz chunk: ≤ 8 rows vs 7200), and
 * the partials merge exactly across chunks/shuffles (counts and long
 * sums add, min/max compose). This is `Ts.downsampleCompressed`'s
 * plan, rebuilt for a SQL client who wrote the naive decode-explode
 * GROUP BY — the engine's highest-frequency dashboard query shape.
 *
 * The bucket key must be the FLOOR-DIVISION shape
 * `floor(ts / B) * B` (B a positive integer literal): the kernel
 * buckets by `Math.floorDiv(t, B) * B`, and floor of the IEEE
 * quotient equals floorDiv for every |ts| a double holds exactly
 * (epoch seconds are < 2^35; divergence needs |ts| ≳ 2^52·B ulp
 * territory). Truncating shapes (`ts div B * B` — toward-zero) are
 * deliberately NOT matched: they disagree with floorDiv on negative
 * timestamps, and a rewrite must be an identity, not an
 * interpretation.
 *
 * Aggregates map like [[ChunkAggRule]]: count → Σn, min/max over v →
 * min/max of bucket minima/maxima, the fixed-point sum shape
 * `sum(cast(round(v * c) as long))` (and its second moment
 * `sum(cents*cents)`) onto the exact long partials, with the cast's
 * eval mode riding into the kernel (ANSI throws exactly where the
 * un-rewritten query would; TRY bails). Min/max over ts inside a
 * bucket have no partial — bail.
 */
object ChunkBucketAggRule extends Rule[LogicalPlan] {

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

  private def decodeOf(e: Expression): Option[(Expression, Option[Side])] = e match {
    case GorillaDecode(c) => Some((c, None))
    case GetStructField(GorillaDecode(c), 0, _) => Some((c, Some(TsSide)))
    case GorillaDecodeTimestamps(c) => Some((c, Some(TsSide)))
    case Alias(inner, _) => decodeOf(inner)
    case _ => None
  }

  /** Numeric literal value, looking through foldable casts (the
    * fixpoint folds them eventually; matching early costs nothing). */
  private def litNum(e: Expression): Option[Double] = e match {
    case Literal(v: Double, DoubleType) => Some(v)
    case Literal(v: Long, LongType) => Some(v.toDouble)
    case Literal(v: Int, _) => Some(v.toDouble)
    case Literal(v: Short, _) => Some(v.toDouble)
    case Cast(c, _, _, _) if c.foldable => litNum(c)
    case _ => None
  }

  private def rewrite(agg: Aggregate, group: Seq[Expression],
                      aggExprs: Seq[NamedExpression], plist: Seq[NamedExpression],
                      dec: Expression, pt: Attribute,
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (chunk, elemSide) = decodeOf(dec).getOrElse(return None)
    val sub: Map[ExprId, Expression] =
      plist.collect { case a @ Alias(c, _) => a.exprId -> c }.toMap
    def inline(x: Expression): Expression = x.transformUp {
      case a: Attribute if sub.contains(a.exprId) => sub(a.exprId)
    }
    def sideOf(x: Expression): Option[Side] = x match {
      case a: Attribute if a.exprId == pt.exprId => elemSide
      case GetStructField(a: Attribute, 0, _)
        if a.exprId == pt.exprId && elemSide.isEmpty => Some(TsSide)
      case GetStructField(a: Attribute, 1, _)
        if a.exprId == pt.exprId && elemSide.isEmpty => Some(VSide)
      case Cast(c, DoubleType, _, mode) if mode != EvalMode.TRY => sideOf(c)
      case Cast(c, LongType, _, mode) if mode != EvalMode.TRY => sideOf(c)
      case _ => None
    }
    def touchesPt(x: Expression): Boolean =
      inline(x).exists { case a: Attribute => a.exprId == pt.exprId; case _ => false }

    // the bucket key: floor(ts / B) * B, inlined form
    def bucketSecOf(x: Expression): Option[Long] = inline(x) match {
      case Multiply(f, lit, _) => bucketHalf(f, lit)
      case _ => None
    }
    def bucketHalf(a: Expression, b: Expression): Option[Long] =
      (a, b) match {
        case (Floor(Divide(t, d, ctx)), l) if ctx.evalMode != EvalMode.TRY =>
          (litNum(d), litNum(l)) match {
            case (Some(dv), Some(lv))
                if dv == lv && dv > 0 && dv == dv.toLong.toDouble &&
                  sideOf(t).contains(TsSide) =>
              Some(dv.toLong)
            case _ => None
          }
        case (l, f: Floor) => bucketHalf(f, l)
        case (Cast(c, LongType, _, m), l) if m != EvalMode.TRY => bucketHalf(c, l)
        case _ => None
      }

    // exactly ONE group key is the bucket; no other key touches points
    val inlinedGroup = group.map(inline)
    val bucketSec = {
      val touching = inlinedGroup.filter(g => g.exists {
        case a: Attribute => a.exprId == pt.exprId; case _ => false })
      if (touching.size != 1) return None
      bucketSecOf(touching.head).getOrElse(return None)
    }
    def isBucketKey(x: Expression): Boolean = bucketSecOf(x).contains(bucketSec)

    // fixed-point sum shape; ANSI casts ride into the kernel (it must
    // throw exactly where the un-rewritten query would), TRY casts
    // (null-on-overflow) are not replicated — bail
    def fixedScaleOf(x: Expression): Option[(Double, Boolean)] = inline(x) match {
      case Cast(r: Round, LongType, _, mode)
          if mode != EvalMode.TRY && r.scale.foldable && r.scale.eval() == 0 =>
        r.child match {
          case Multiply(a, Literal(c: Double, DoubleType), _)
            if sideOf(inline(a)).contains(VSide) => Some((c, mode == EvalMode.ANSI))
          case Multiply(Literal(c: Double, DoubleType), b, _)
            if sideOf(inline(b)).contains(VSide) => Some((c, mode == EvalMode.ANSI))
          case _ => None
        }
      case _ => None
    }
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

    val elemType = GorillaExprs.bucketAggType.elementType
    val bAttr = AttributeReference("__b", elemType, nullable = false)()
    def field(i: Int, name: String) = GetStructField(bAttr, i, Some(name))

    val rewritten = aggExprs.map { ne =>
      val t = ne.transformDown {
        case e if isBucketKey(e) && !e.isInstanceOf[Alias] => field(0, "bucket")
        case ae @ AggregateExpression(fn, _, false, None, _) =>
          val newFn: AggregateFunction = fn match {
            case Count(cs) if cs.forall(c =>
                c.foldable || sideOf(inline(c)).isDefined) =>
              Sum(field(1, "n"))
            case Min(x) if sideOf(inline(x)).contains(VSide) =>
              Min(field(2, "min_v"))
            case Max(x) if sideOf(inline(x)).contains(VSide) =>
              Max(field(3, "max_v"))
            case s: Sum if scale.isDefined && fixedScaleOf(s.child) == scale =>
              Sum(field(4, "sum_fixed"))
            case s: Sum if scale.isDefined && fixedSqScaleOf(s.child) == scale =>
              Sum(field(5, "sumsq_fixed"))
            case _ => return None
          }
          ae.copy(aggregateFunction = newFn)
        case other: AggregateExpression => return None
        case a: Attribute if sub.contains(a.exprId) =>
          if (touchesPt(a)) return None else inline(a)
      }
      t match {
        case n: NamedExpression if n.exprId == ne.exprId => n
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    val newGroup = inlinedGroup.map(g =>
      if (isBucketKey(g)) field(0, "bucket") else g)
    if ((rewritten ++ newGroup).exists(_.exists(
      { case a: Attribute => a.exprId == pt.exprId || sub.contains(a.exprId); case _ => false })))
      return None

    // no empty-chunk guard needed: an empty chunk folds to an EMPTY
    // partial array, so explode emits nothing for it — exactly like
    // the point explode it replaces
    val gen = Generate(
      Explode(GorillaChunkBucketAgg(chunk, bucketSec,
        scale.map(_._1).getOrElse(100.0), scale.exists(_._2))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bAttr), child = child)
    Some(agg.copy(groupingExpressions = newGroup,
      aggregateExpressions = rewritten, child = gen))
  }
}
