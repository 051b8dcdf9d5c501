package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Prometheus RULE evaluation on the labeled chunk store — the
 * operational layer that turns the PromQL front-end ([[Promql]]) into
 * a recording/alerting engine:
 *
 *  - a RECORDING rule evaluates a PromQL expression on a step grid
 *    (the same compressed-domain stepped machinery `query_range`
 *    uses) and materializes the result back into Gorilla chunks, so
 *    ingest-once/query-many extends to DERIVED series: the recorded
 *    store is a first-class query substrate — selectors prune on the
 *    rule name at the chunk-metadata scan and `_over_time` functions
 *    answer from its header stats with zero decode, exactly like raw
 *    series. At 100 TB this is THE dashboard pattern: a 300-step
 *    panel over a recorded series reads |series|·|window buckets|
 *    chunk headers, never the raw corpus the rule folded.
 *
 *  - an ALERTING rule evaluates a filter expression (comparison =
 *    PromQL filter semantics) on the grid and applies the `for`
 *    clause's continuity requirement as one range window per series:
 *    a series is `firing` at step t iff the condition held at EVERY
 *    step in [t − for, t], `pending` otherwise. No driver-side loop —
 *    state assembly is a single window aggregate over the (sparse)
 *    condition-true rows, grid-uniform so presence-count == coverage.
 *
 * Semantics follow the public Prometheus rule model; like Prometheus,
 * continuity is judged from the evaluation range's own start (a
 * condition already true before `startTs` counts from `startTs`).
 */
object Rules {

  /** `record: <name>  expr: <promql>` evaluated at every `stepSec`
    * instant of [startTs, endTs]. The result series carry the rule
    * name as their metric (the store's FIRST label column); grouped-
    * away label columns are recorded as "" (the fixed-column store's
    * spelling of an absent Prometheus label). */
  final case class Recording(record: String, expr: String,
                             startTs: Long, endTs: Long, stepSec: Long)

  /** `alert: <name>  expr: <filter expr>  for: <forSec>` on the same
    * grid. `expr` must FILTER (a PromQL comparison), so each emitted
    * step row means "condition true at this instant". */
  final case class Alert(alert: String, expr: String, forSec: Long,
                         startTs: Long, endTs: Long, stepSec: Long)

  /** Evaluate a recording rule → rows in the labeled-ingest shape:
    * every store label column present, plus (ts, value) with ts in the
    * raw-ingest convention (nanos-as-long, what [[Ts.epochSec]] expects
    * of a LONG column). Feed straight into [[Ts.chunkify]] (see
    * [[materialize]]). */
  def record(chunks: DataFrame, labelCols: Seq[String],
             rule: Recording): DataFrame = {
    require(labelCols.nonEmpty, "need at least the metric label column")
    val out = Promql.evalRange(chunks, labelCols, rule.expr,
      rule.startTs, rule.endTs, rule.stepSec)
    val present = out.columns.toSet
    val cols = labelCols.map { l =>
      if (l == labelCols.head) lit(rule.record).as(l) // metric name
      else if (present(l)) col(l) else lit("").as(l)
    }
    out.select(cols :+ (col("ts") * lit(1000000000L)).as("ts") :+ col("value"): _*)
  }

  /** Evaluate recording rules and encode the derived series into
    * Gorilla chunks (same windowing as raw ingest) — union-ready with
    * a base store or writable via [[Ts.writeStore]]. */
  def materialize(chunks: DataFrame, labelCols: Seq[String],
                  rules: Seq[Recording]): DataFrame = {
    require(rules.nonEmpty, "no recording rules")
    rules.map(r => Ts.chunkify(record(chunks, labelCols, r), labelCols, "ts", "value"))
      .reduce(_ unionByName _)
  }

  /** Alert states over the grid: (labels…, ts, state) with state ∈
    * {"pending", "firing"}; rows exist only where the condition is
    * true (Prometheus emits no sample for an inactive alert). */
  def alert(chunks: DataFrame, labelCols: Seq[String], rule: Alert): DataFrame = {
    require(rule.forSec >= 0 && rule.forSec % rule.stepSec == 0,
      s"for ${rule.forSec}s must be a multiple of the ${rule.stepSec}s step")
    val need = rule.forSec / rule.stepSec + 1 // steps of continuous truth
    val v = Promql.evalRange(chunks, labelCols, rule.expr,
      rule.startTs, rule.endTs, rule.stepSec)
    val labels = v.columns.filterNot(c => c == "ts" || c == "value").toSeq
    val w = Window.partitionBy(labels.map(col): _*).orderBy(col("ts"))
      .rangeBetween(-rule.forSec, 0)
    v.withColumn("__n", count(lit(1)).over(w))
      .withColumn("state", when(col("__n") >= need, lit("firing"))
        .otherwise(lit("pending")))
      .drop("__n")
  }
}
