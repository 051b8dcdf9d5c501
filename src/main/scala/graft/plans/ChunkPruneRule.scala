package graft.plans

import graft.functions.{GorillaDecode, GorillaDecodeTimestamps, GorillaDecodeValues}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Optimizer rule: chunk-level pruning for decoded time/value filters.
 *
 * A query that filters on a decoded field —
 * `unpack(chunks).filter($"ts" >= lo && $"v" >= x)` — would decode
 * every chunk and then drop points. Chunk rows carry (min_ts, max_ts,
 * min_v, max_v) stats, so the same bounds can eliminate whole chunks
 * *before* the decode runs. `Ts.rangeQuery` does this by hand; this
 * rule does it for any plan of the shape
 *
 *   Filter( bounds on decoded fields ,
 *           Generate(explode(gorilla_decode*(chunk)), child) )
 *
 * covering all three decode forms (`gorilla_decode` structs — ts at
 * ordinal 0, v at ordinal 1; `gorilla_decode_ts` bare timestamps;
 * `gorilla_decode_values` bare values), by injecting
 * `Filter(stat guards, …)` beneath the Generate at the nearest
 * descendant that still carries the stat columns (looking through any
 * number of interposed Projects — column pruning routinely stacks
 * them). The stat conjuncts then push further down to the parquet
 * scan. The point-level filter is left untouched — stats pruning is a
 * superset guard, not a replacement. `between` needs no special case:
 * both the Column DSL and the SQL parser have rewritten it to
 * >= AND <= conjuncts before the optimizer runs.
 */
object ChunkPruneRule extends Rule[LogicalPlan] {
  private val Applied = TreeNodeTag[Boolean]("graft.chunkPruned")

  private sealed trait DecodeKind
  private case object FullPoints extends DecodeKind // struct<ts,v>
  private case object TsOnly extends DecodeKind     // bare long ts
  private case object ValuesOnly extends DecodeKind // bare double v

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, g @ Generate(e: Explode, _, _, _, _, gChild))
        if g.getTagValue(Applied).isEmpty && kindOf(e.child).isDefined =>
      val kind = kindOf(e.child).get
      val out = g.generatorOutput.headOption
      val guardsOpt = out.flatMap { a =>
        val (tsLo, tsHi) = kind match {
          case FullPoints => longBounds(cond, isStructField(a, 0))
          case TsOnly => longBounds(cond, isAttr(a))
          case ValuesOnly => (None, None)
        }
        val (vLo, vHi) = kind match {
          case FullPoints => doubleBounds(cond, isStructField(a, 1))
          case TsOnly => (None, None)
          case ValuesOnly => doubleBounds(cond, isAttr(a))
        }
        if (tsLo.isEmpty && tsHi.isEmpty && vLo.isEmpty && vHi.isEmpty) None
        else Some((tsLo, tsHi, vLo, vHi))
      }
      val rewritten = guardsOpt.flatMap { case (tsLo, tsHi, vLo, vHi) =>
        injectThroughProjects(gChild, tsLo, tsHi, vLo, vHi)
      }
      rewritten match {
        case None => f
        case Some(pruned) =>
          val newG = g.copy(child = pruned)
          newG.setTagValue(Applied, true)
          Filter(cond, newG)
      }
  }

  /** Inject the stat-guard Filter at the nearest descendant that still
    * carries the stat columns the guards need, rebuilding any Projects
    * above it (stats are often column-pruned out of upper Projects). */
  private def injectThroughProjects(p: LogicalPlan,
      tsLo: Option[Long], tsHi: Option[Long],
      vLo: Option[Double], vHi: Option[Double]): Option[LogicalPlan] = {
    val needTs = tsLo.isDefined || tsHi.isDefined
    val needV = vLo.isDefined || vHi.isDefined
    def tryHere(stats: LogicalPlan): Option[Expression] = {
      def stat(name: String, dt: org.apache.spark.sql.types.DataType): Option[Attribute] =
        stats.output.find(a => a.name == name && a.dataType == dt)
      val tsGuards: Seq[Expression] =
        if (!needTs) Seq.empty
        else (stat("min_ts", LongType), stat("max_ts", LongType)) match {
          case (Some(minTs), Some(maxTs)) =>
            tsLo.map(l => GreaterThanOrEqual(maxTs, Literal(l)).asInstanceOf[Expression]).toSeq ++
              tsHi.map(h => LessThanOrEqual(minTs, Literal(h)).asInstanceOf[Expression]).toSeq
          case _ => Seq.empty
        }
      val vGuards: Seq[Expression] =
        if (!needV) Seq.empty
        else (stat("min_v", DoubleType), stat("max_v", DoubleType)) match {
          case (Some(minV), Some(maxV)) =>
            vLo.map(l => GreaterThanOrEqual(maxV, Literal(l)).asInstanceOf[Expression]).toSeq ++
              vHi.map(h => LessThanOrEqual(minV, Literal(h)).asInstanceOf[Expression]).toSeq
          case _ => Seq.empty
        }
      val all = tsGuards ++ vGuards
      if (all.isEmpty) None else Some(all.reduce(And))
    }
    p match {
      case stats if tryHere(stats).isDefined =>
        Some(Filter(tryHere(stats).get, stats))
      case pr @ Project(_, inner) =>
        injectThroughProjects(inner, tsLo, tsHi, vLo, vHi).map(f => pr.copy(child = f))
      case _ => None
    }
  }

  private def kindOf(e: Expression): Option[DecodeKind] = e match {
    case _: GorillaDecode => Some(FullPoints)
    case _: GorillaDecodeTimestamps => Some(TsOnly)
    case _: GorillaDecodeValues => Some(ValuesOnly)
    case Alias(c, _) => kindOf(c)
    case _ => None
  }

  private def isStructField(point: Attribute, ordinal: Int)(e: Expression): Boolean =
    e match {
      case GetStructField(a: Attribute, o, _) => o == ordinal && a.exprId == point.exprId
      case _ => false
    }

  private def isAttr(point: Attribute)(e: Expression): Boolean = e match {
    case a: Attribute => a.exprId == point.exprId
    case _ => false
  }

  /** (lower, upper) long literal bounds on the target expression among
    * the filter's conjuncts. Exclusive bounds tighten by one — exact
    * on the integer grid. */
  private def longBounds(cond: Expression,
                         isT: Expression => Boolean): (Option[Long], Option[Long]) = {
    def longOf(l: Literal): Option[Long] = l.value match {
      case x: Long => Some(x)
      case x: Int => Some(x.toLong)
      case _ => None
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(t, l: Literal) if isT(t) => lo = maxOpt(lo, longOf(l))
      case GreaterThan(t, l: Literal) if isT(t) => lo = maxOpt(lo, longOf(l).map(_ + 1))
      case LessThanOrEqual(t, l: Literal) if isT(t) => hi = minOpt(hi, longOf(l))
      case LessThan(t, l: Literal) if isT(t) => hi = minOpt(hi, longOf(l).map(_ - 1))
      case GreaterThanOrEqual(l: Literal, t) if isT(t) => hi = minOpt(hi, longOf(l))
      case GreaterThan(l: Literal, t) if isT(t) => hi = minOpt(hi, longOf(l).map(_ - 1))
      case LessThanOrEqual(l: Literal, t) if isT(t) => lo = maxOpt(lo, longOf(l))
      case LessThan(l: Literal, t) if isT(t) => lo = maxOpt(lo, longOf(l).map(_ + 1))
      case EqualTo(t, l: Literal) if isT(t) =>
        lo = maxOpt(lo, longOf(l)); hi = minOpt(hi, longOf(l))
      case EqualTo(l: Literal, t) if isT(t) =>
        lo = maxOpt(lo, longOf(l)); hi = minOpt(hi, longOf(l))
      case _ => ()
    }
    visit(cond)
    (lo, hi)
  }

  /** (lower, upper) double literal bounds on the target expression.
    * Strict inequalities keep the literal as a (safe, superset) bound. */
  private def doubleBounds(cond: Expression,
                           isT: Expression => Boolean): (Option[Double], Option[Double]) = {
    def dblOf(l: Literal): Option[Double] = l.value match {
      case x: Double => Some(x)
      case x: Float => Some(x.toDouble)
      case x: Long => Some(x.toDouble)
      case x: Int => Some(x.toDouble)
      case _ => None
    }
    var lo: Option[Double] = None
    var hi: Option[Double] = None
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(t, l: Literal) if isT(t) => lo = maxOptD(lo, dblOf(l))
      case GreaterThan(t, l: Literal) if isT(t) => lo = maxOptD(lo, dblOf(l))
      case LessThanOrEqual(t, l: Literal) if isT(t) => hi = minOptD(hi, dblOf(l))
      case LessThan(t, l: Literal) if isT(t) => hi = minOptD(hi, dblOf(l))
      case GreaterThanOrEqual(l: Literal, t) if isT(t) => hi = minOptD(hi, dblOf(l))
      case GreaterThan(l: Literal, t) if isT(t) => hi = minOptD(hi, dblOf(l))
      case LessThanOrEqual(l: Literal, t) if isT(t) => lo = maxOptD(lo, dblOf(l))
      case LessThan(l: Literal, t) if isT(t) => lo = maxOptD(lo, dblOf(l))
      case EqualTo(t, l: Literal) if isT(t) =>
        lo = maxOptD(lo, dblOf(l)); hi = minOptD(hi, dblOf(l))
      case EqualTo(l: Literal, t) if isT(t) =>
        lo = maxOptD(lo, dblOf(l)); hi = minOptD(hi, dblOf(l))
      case _ => ()
    }
    visit(cond)
    (lo, hi)
  }

  private def maxOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a.toSeq ++ b.toSeq).maxOption
  private def minOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a.toSeq ++ b.toSeq).minOption
  private def maxOptD(a: Option[Double], b: Option[Double]): Option[Double] =
    (a.toSeq ++ b.toSeq).maxOption
  private def minOptD(a: Option[Double], b: Option[Double]): Option[Double] =
    (a.toSeq ++ b.toSeq).minOption
}
