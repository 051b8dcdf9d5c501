package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tsdb.{Rules, Ts}

/**
 * CONTINUOUS rule evaluation — Prometheus's rule-manager loop
 * (evaluate every rule of a group each interval, append the results)
 * re-expressed as a Structured Streaming job over the Gorilla chunk
 * store:
 *
 *  - each micro-batch of raw points seals into chunks and APPENDS to
 *    the raw store (the [[StreamIngest.writeChunksPerBatch]] path);
 *  - the engine then advances a persisted EVENT-TIME watermark
 *    (max event second seen, minus an allowed lateness) and evaluates
 *    EVERY rule of the group on exactly the grid steps the watermark
 *    newly covers — [[graft.tsdb.Promql.evalRange]] over the raw
 *    store, chunk-pruned to the new steps' lookback horizon;
 *  - recording results seal back into Gorilla chunks and append to
 *    the DERIVED store; alert states append to a parquet state log.
 *
 * Unlike wall-clock Prometheus, step completeness is judged by EVENT
 * time: a step t is evaluated only once `watermark >= t`, so
 * out-of-order arrivals within the lateness bound land in the raw
 * store BEFORE any step that can see them is folded — the streamed
 * derivation equals the batch [[Rules]] evaluation over the same
 * grid (parity pinned in StreamRulesSpec), and a rule is never
 * evaluated against a half-arrived window.
 *
 * Scale shape: per batch the engine pays (a) the batch's own encode
 * (linear in batch points) and (b) one rule-group fold over the NEWLY
 * covered steps only — the raw-store read is `window_date`-pruned to
 * `[firstNewStep − horizon, lastNewStep]`, so a standing group over a
 * 100 TB store touches the trailing horizon, never the history. The
 * derived store accretes append-only; like raw ingest, a window's
 * chunks may arrive as several partials across batches (readers are
 * partial-agnostic; `ts_store_compact` re-seals).
 *
 * Exactly-once under foreachBatch's at-least-once replay, in two
 * layers: (1) the (batchId, lastStep, maxSeen) cursor persists
 * ATOMICALLY (tmp + rename) next to the output and a replayed,
 * fully-committed batchId is skipped whole; (2) every append is
 * IDEMPOTENT — raw chunks, derived chunks, and alert rows land in a
 * `batch_id=<id>` sub-partition via dynamic partition overwrite, so a
 * crash BETWEEN any append and the cursor move replays the batch and
 * each re-append REPLACES exactly the crashed attempt's partitions
 * instead of duplicating beside them (the fold is deterministic given
 * the same cursor + batch, so the replacement is byte-equivalent).
 * Within one batch, every recording's rows (and every alert's states)
 * union into ONE write per store — per-rule writes under dynamic
 * overwrite would clobber each other's shared partitions.
 *
 * Retention: with `retentionDays >= 0` each fold finishes by aging
 * out `window_date` partitions of the raw and derived stores and
 * `state_date` partitions of the alert log older than the retention
 * window behind the event-time watermark — metadata-only directory
 * deletes ([[Ts.expirePartitions]]), so the standing job's footprint
 * is bounded by retention, not runtime.
 */
object StreamRules {

  /** A standing recording rule: `record: <name>  expr: <promql>`. */
  final case class Recording(record: String, expr: String)

  /** A standing alerting rule; `expr` must FILTER (a PromQL
    * comparison), `forSec` the continuity requirement,
    * `keepFiringForSec` the un-fire hysteresis (both multiples of the
    * group's step). */
  final case class Alert(alert: String, expr: String, forSec: Long,
                         keepFiringForSec: Long = 0L)

  /**
   * A Prometheus rule group: one evaluation interval (`stepSec`),
   * evaluated together over one shared raw-store ingest.
   *
   * `horizonSec` is the largest lookback any member expression needs
   * (max range selector + offset + staleness lookback); it bounds the
   * raw-store read per fold. Negative = unpruned (correct but reads
   * the whole store each fold — fine for tests, wrong at scale).
   */
  final case class RuleGroup(stepSec: Long,
                             recordings: Seq[Recording] = Nil,
                             alerts: Seq[Alert] = Nil,
                             latenessSec: Long = 0L,
                             horizonSec: Long = -1L,
                             retentionDays: Int = -1) {
    require(stepSec > 0, "stepSec must be positive")
    require(alerts.forall(a => a.forSec >= 0 && a.forSec % stepSec == 0),
      "every alert's forSec must be a non-negative multiple of stepSec")
    require(alerts.forall(a =>
        a.keepFiringForSec >= 0 && a.keepFiringForSec % stepSec == 0),
      "every alert's keepFiringForSec must be a non-negative multiple of stepSec")
  }

  /** Persisted evaluation cursor: last folded batch, last evaluated
    * grid step, max event second seen, first grid step ever (alert
    * continuity never reaches before it). */
  private final case class Cursor(batchId: Long, lastStep: Long,
                                  maxSeen: Long, firstStep: Long)
  private val NoSec = Long.MinValue

  private def readCursor(path: String): Cursor = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Cursor(-1L, NoSec, NoSec, NoSec)
    else {
      val a = new String(java.nio.file.Files.readAllBytes(p)).trim.split("\\s+")
      Cursor(a(0).toLong, a(1).toLong, a(2).toLong, a(3).toLong)
    }
  }

  private def writeCursor(path: String, c: Cursor): Unit = {
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      s"${c.batchId} ${c.lastStep} ${c.maxSeen} ${c.firstStep}".getBytes)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Idempotent per-batch append: the batch's rows land under a
    * `batch_id=<id>` sub-partition via dynamic partition overwrite, so
    * a replay after a mid-batch crash REPLACES the crashed attempt's
    * partitions instead of appending duplicates beside them. Readers
    * ignore the extra partition column; `window_date` stays the
    * top-level directory so pruning and retention are untouched.
    *
    * FORMAT NOTE: the store layout is `window_date=<d>/batch_id=<id>/`
    * since the idempotent-replay change; earlier stores wrote parquet
    * files DIRECTLY under `window_date=<d>/`. Mixing the two depths in
    * one directory breaks Spark's partition discovery (conflicting
    * directory structures), so a legacy single-level store is detected
    * here and REFUSED with a migration recipe (move each partition's
    * files under a `batch_id=-1` subdirectory — `-1` can never collide
    * with a real micro-batch id and dynamic overwrite never rewrites
    * it) rather than corrupted by the first new append. */
  private def appendIdempotent(chunks: DataFrame, path: String,
                               batchId: Long): Unit = {
    requireBatchLayout(path,
      chunks.sparkSession.sparkContext.hadoopConfiguration)
    // an all-empty append must not CREATE the store: a directory
    // holding only _SUCCESS breaks every reader's parquet schema
    // inference, so a standing rule whose expr legitimately yields
    // nothing on its first batches (e.g. a binary op against a
    // not-yet-scraped metric) would wedge the whole group. Found by
    // the r18 streaming-rule conformance sweep.
    if (chunks.isEmpty) return
    chunks
      .withColumn("window_date", to_date(to_timestamp(col("window_start"))))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("window_date", "batch_id")
      .parquet(path)
  }

  /** Fail loud on a pre-`batch_id` store: any `window_date=` partition
    * holding data files (instead of `batch_id=` subdirectories) is the
    * legacy layout. Two directory listings, no data read. Listed via
    * the Hadoop FileSystem API so the guard holds on EVERY filesystem
    * the store can live on (HDFS, S3A, local) — a java.io.File check
    * would silently pass on distributed storage and let the first new
    * append corrupt partition discovery. */
  private def requireBatchLayout(path: String,
                                 conf: org.apache.hadoop.conf.Configuration): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return
    val legacy = fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("window_date="))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter { f =>
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .filterNot(f => f.isDirectory && f.getPath.getName.startsWith("batch_id="))
    require(legacy.isEmpty,
      s"$path uses the legacy single-level window_date layout " +
        s"(e.g. ${legacy.headOption.map(_.getPath).getOrElse("")}); " +
        "appending the (window_date, batch_id) " +
        "layout beside it would break partition discovery. Migrate once by " +
        "moving each window_date=<d>/'s files into window_date=<d>/" +
        "batch_id=-1/ (shell: for d in window_date=*; do mkdir \"$d/" +
        "batch_id=-1\" && mv \"$d\"/*.parquet \"$d/batch_id=-1/\"; done), " +
        "then re-run")
  }

  /** Ingest the batch into the raw store and advance the cursor's
    * watermark; returns the updated cursor (not yet persisted). */
  private def ingestBatch(batch: DataFrame, labelCols: Seq[String],
                          tsCol: String, valCol: String, rawPath: String,
                          stepSec: Long, cur: Cursor, batchId: Long): Cursor = {
    if (batch.isEmpty) return cur
    appendIdempotent(Ts.chunkify(batch, labelCols, tsCol, valCol),
      rawPath, batchId)
    val sec = Ts.epochSec(batch, tsCol)
    val mm = batch.agg(min(sec).as("lo"), max(sec).as("hi")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // the grid starts at the first step that can see any data: rules
    // evaluate from when data begins (Prometheus: from rule start)
    val first =
      if (cur.firstStep != NoSec) cur.firstStep
      else Math.floorDiv(lo + stepSec - 1, stepSec) * stepSec // align up
    val last = if (cur.lastStep != NoSec) cur.lastStep else first - stepSec
    Cursor(cur.batchId, last, math.max(cur.maxSeen, hi), first)
  }

  /** Grid steps the watermark newly covers: (firstNew, lastNew), or
    * None when the watermark hasn't crossed a new step yet. */
  private def newSteps(cur: Cursor, g: RuleGroup): Option[(Long, Long)] = {
    if (cur.maxSeen == NoSec || cur.lastStep == NoSec) return None
    val wm = cur.maxSeen - g.latenessSec
    val lastNew = Math.floorDiv(wm, g.stepSec) * g.stepSec // align down
    if (lastNew > cur.lastStep) Some((cur.lastStep + g.stepSec, lastNew)) else None
  }

  /**
   * One micro-batch of the continuous loop (exposed so the
   * replay-skip and stream==batch contracts are testable without a
   * second stream run): append raw chunks, advance the watermark,
   * evaluate every rule of the group on the newly covered steps;
   * recordings append derived chunks to `recPath`, alert states
   * append to `alertPath`.
   */
  def foldGroupBatch(batch: DataFrame, batchId: Long, labelCols: Seq[String],
                     tsCol: String, valCol: String, group: RuleGroup,
                     rawPath: String, recPath: String,
                     alertPath: String = null): Unit = {
    require(group.alerts.isEmpty || alertPath != null,
      "rule group has alerting rules but no alertPath")
    val marker = recPath + "_rules_batch"
    val cur0 = readCursor(marker)
    if (batchId <= cur0.batchId) return // replayed batch: already folded
    var cur = ingestBatch(batch, labelCols, tsCol, valCol, rawPath,
      group.stepSec, cur0, batchId)
    newSteps(cur, group).foreach { case (from, to) =>
      val s = batch.sparkSession
      def raw(evalFrom: Long, extraBack: Long): DataFrame =
        Ts.readStore(s, rawPath,
          if (group.horizonSec < 0) Long.MinValue
          else evalFrom - group.horizonSec - extraBack, to)
      // ONE idempotent write per store per batch: per-rule writes
      // under dynamic overwrite would clobber each other's shared
      // (window_date, batch_id) partitions
      group.recordings.map { r =>
        Rules.record(raw(from, 0L), labelCols,
          Rules.Recording(r.record, r.expr, from, to, group.stepSec))
      }.reduceOption(_ unionByName _).foreach { rows =>
        appendIdempotent(Ts.chunkify(rows, labelCols, "ts", "value"),
          recPath, batchId)
      }
      group.alerts.map { a =>
        // continuity at step t needs the condition over [t − for, t],
        // and keep_firing_for hysteresis additionally reaches back a
        // keep window: start the evaluation for+keep earlier (floored
        // at the grid's own first step — the batch semantics of one
        // continuous run), keep only the new steps' states. Chains
        // whose for-continuity predates even that window are
        // recovered from the persisted STATE LOG (firingSeedFor) —
        // the alert-state analog of the for-clause's store-recovered
        // lookback, bounded by the keep window
        val evalFrom = math.max(from - a.forSec - a.keepFiringForSec,
          cur.firstStep)
        val seed =
          if (a.keepFiringForSec > 0 && alertPath != null)
            firingSeedFor(batch.sparkSession, alertPath, a, from)
          else None
        val st0 = Rules.alert(raw(evalFrom, a.forSec), labelCols,
          Rules.Alert(a.alert, a.expr, a.forSec, evalFrom, to,
            group.stepSec, a.keepFiringForSec), seed)
        // keep-less alerts carry cond = true so every rule of the
        // group unions into ONE state-log schema
        val st = if (a.keepFiringForSec == 0)
          st0.withColumn("cond", lit(true)) else st0
        st.filter(col("ts") >= from)
          .withColumn("alert", lit(a.alert))
      }.reduceOption(_ unionByName _).foreach { states =>
        states
          .withColumn("state_date", to_date(to_timestamp(col("ts"))))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("state_date", "batch_id")
          .parquet(alertPath)
      }
      cur = cur.copy(lastStep = to)
    }
    writeCursor(marker, cur.copy(batchId = batchId))
    // age out partitions behind the event-time watermark — the
    // standing job's footprint is retention-bounded, not unbounded
    if (group.retentionDays >= 0 && cur.maxSeen != NoSec) {
      val s = batch.sparkSession
      Ts.expireStore(s, rawPath, group.retentionDays, cur.maxSeen)
      Ts.expireStore(s, recPath, group.retentionDays, cur.maxSeen)
      if (alertPath != null)
        Ts.expirePartitions(s, alertPath, "state_date",
          group.retentionDays, cur.maxSeen)
    }
  }

  /** Chains alive at the batch boundary, recovered from the persisted
    * state log: per series, the LAST condition-true log row within
    * keep_firing_for behind `from` that was FIRING. The new fold's
    * re-derivation force-marks the matching condition rows as
    * continuity-satisfied, so a chain whose `for`-continuity predates
    * the re-evaluated window survives a restart exactly like the
    * for-clause does. Bounded reads: `state_date`-pruned to the keep
    * window, never the log's history. */
  private def firingSeedFor(spark: org.apache.spark.sql.SparkSession,
                            alertPath: String,
                            a: Alert, from: Long): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(alertPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val log = spark.read.parquet(alertPath)
    if (!log.columns.contains("cond")) return None
    val lo = from - a.keepFiringForSec
    val labels = log.columns.filterNot(Set("ts", "value", "state", "alert",
      "cond", "state_date", "batch_id")).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(labels.map(col): _*).orderBy(col("ts").desc)
    Some(log
      .filter(col("state_date") >= to_date(to_timestamp(lit(lo))) &&
        col("alert") === a.alert && col("cond") &&
        col("ts") >= lo && col("ts") < from)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("state") === "firing")
      .select((labels.map(col) :+ col("ts")): _*))
  }

  /** The last grid step the group evaluated (from the persisted
    * cursor next to `recPath`) — None before the first fold crosses a
    * step. The anchor for [[currentAlerts]]. */
  def lastEvaluatedStep(recPath: String): Option[Long] = {
    val c = readCursor(recPath + "_rules_batch")
    if (c.lastStep == NoSec) None else Some(c.lastStep)
  }

  /** The CURRENT alert table (what a Prometheus /alerts page shows):
    * the state-log rows at exactly `atStep` — an alert with no row
    * there is inactive (the log is sparse by design). Anchor `atStep`
    * at [[lastEvaluatedStep]] for "now". */
  def currentAlerts(spark: org.apache.spark.sql.SparkSession,
                    alertPath: String, atStep: Long): DataFrame =
    spark.read.parquet(alertPath).filter(col("ts") === atStep)

  /** The standing streaming job for a rule group: events stream →
    * raw store + continuously materialized derived series + alert
    * state log. */
  def groupStream(events: DataFrame, labelCols: Seq[String], tsCol: String,
                  valCol: String, group: RuleGroup,
                  rawPath: String, recPath: String, alertPath: String,
                  checkpoint: String) =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        foldGroupBatch(b, id, labelCols, tsCol, valCol, group,
          rawPath, recPath, alertPath)
      }
}
