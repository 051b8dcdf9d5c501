package graft.streaming

import graft.SparkTestSession
import graft.tsdb.{Rules, Ts}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Continuous rule evaluation (StreamRules): the streamed derivation
 * must EQUAL the batch [[Rules]] evaluation over the same grid —
 * recording chunks and alert states alike — under out-of-order
 * arrival within the lateness bound, and replayed batches must fold
 * exactly once.
 */
class StreamRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val labelCols = Seq("type", "host")
  private val T0 = 1700000400L // multiple of the 600s step grid
  private val Step = 600L

  /** Two hosts' click series, one point per minute over 40 min;
    * values vary so per-step sums differ across steps and hosts. */
  private def allEvents: Seq[(String, String, Long, Double)] =
    for {
      host <- Seq("h1", "h2")
      i <- 0 until 40
    } yield ("click", host, T0 + i * 60L,
      (i % 7) + (if (host == "h1") 0.25 else 10.0))

  private def toDf(rows: Seq[(String, String, Long, Double)]): DataFrame = {
    import spark.implicits._
    // ts in the raw-ingest nanos-as-long convention
    rows.toDF("type", "host", "sec", "v")
      .select(col("type"), col("host"),
        (col("sec") * 1000000000L).as("ts"), col("v"))
  }

  /** Batch slices: rows at T0+420 and T0+600 (both hosts) arrive one
    * batch LATE but within the 300s lateness bound — their covering
    * step (T0+600, watermark-gated) is not yet evaluated when they
    * land. */
  private def slices: Seq[Seq[(String, String, Long, Double)]] = {
    val ev = allEvents
    val late = ev.filter(e => e._3 == T0 + 420 || e._3 == T0 + 600)
    val b1 = ev.filter(e => e._3 < T0 + 900 && !late.contains(e))
    val b2 = late ++ ev.filter(e => e._3 >= T0 + 900 && e._3 < T0 + 1800)
    val b3 = ev.filter(_._3 >= T0 + 1800)
    Seq(b1, b2, b3)
  }

  private val group = StreamRules.RuleGroup(
    stepSec = Step,
    recordings = Seq(StreamRules.Recording("host:click:sum10m",
      "sum by (host) (sum_over_time(click[10m]))")),
    alerts = Seq(StreamRules.Alert("HighClicks",
      "sum by (host) (sum_over_time(click[10m])) > 100", forSec = 1200L)),
    latenessSec = 300L)

  /** The grid the stream must have evaluated once all slices folded:
    * watermark = maxSeen − lateness, floored to the step. */
  private val FirstStep = T0
  private val LastStep = {
    val maxSeen = allEvents.map(_._3).max
    Math.floorDiv(maxSeen - 300L, Step) * Step
  }

  private def freshDirs(tag: String): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory(s"graft_rules_$tag")
      .toString
    (s"$base/raw", s"$base/rec", s"$base/alerts")
  }

  private def recordedPoints(recPath: String): Set[(String, String, Long, Double)] =
    Ts.unpack(Ts.readStore(spark, recPath), labelCols)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet

  private def expectedRecording: Set[(String, String, Long, Double)] =
    Rules.record(
        Ts.chunkify(toDf(allEvents), labelCols, "ts", "v"), labelCols,
        Rules.Recording("host:click:sum10m",
          "sum by (host) (sum_over_time(click[10m]))",
          FirstStep, LastStep, Step))
      .collect().map(r => (r.getString(0), r.getString(1),
        Math.floorDiv(r.getLong(2), 1000000000L), r.getDouble(3))).toSet

  private def expectedAlerts: Set[(String, Long, String)] =
    Rules.alert(
        Ts.chunkify(toDf(allEvents), labelCols, "ts", "v"), labelCols,
        Rules.Alert("HighClicks",
          "sum by (host) (sum_over_time(click[10m])) > 100", 1200L,
          FirstStep, LastStep, Step))
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Long]("ts"),
        r.getAs[String]("state"))).toSet

  test("streamed rule group == batch Rules over the same grid " +
       "(out-of-order within lateness)") {
    val (raw, rec, al) = freshDirs("fold")
    slices.zipWithIndex.foreach { case (rows, id) =>
      StreamRules.foldGroupBatch(toDf(rows), id, labelCols, "ts", "v",
        group, raw, rec, al)
    }
    assert(LastStep == T0 + 1800) // the grid the watermark must reach
    assert(recordedPoints(rec) == expectedRecording)
    val got = spark.read.parquet(al)
      .select("host", "ts", "state").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expectedAlerts)
    assert(expectedAlerts.nonEmpty) // the threshold actually fires
    assert(expectedAlerts.exists(_._3 == "firing") &&
      expectedAlerts.exists(_._3 == "pending"))
    // the operational "what's firing now" view: the log rows at the
    // cursor's last evaluated step
    assert(StreamRules.lastEvaluatedStep(rec).contains(LastStep))
    val now = StreamRules.currentAlerts(spark, al, LastStep)
      .select("host", "ts", "state").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(now == expectedAlerts.filter(_._2 == LastStep))
    assert(now.nonEmpty)
  }

  test("replayed batchId folds exactly once") {
    val (raw, rec, al) = freshDirs("replay")
    val ss = slices
    StreamRules.foldGroupBatch(toDf(ss(0)), 0, labelCols, "ts", "v",
      group, raw, rec, al)
    StreamRules.foldGroupBatch(toDf(ss(1)), 1, labelCols, "ts", "v",
      group, raw, rec, al)
    val once = recordedPoints(rec)
    val rawOnce = Ts.readStore(spark, raw).count()
    // at-least-once delivery: batch 1 re-fires
    StreamRules.foldGroupBatch(toDf(ss(1)), 1, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(recordedPoints(rec) == once)
    assert(Ts.readStore(spark, raw).count() == rawOnce)
    StreamRules.foldGroupBatch(toDf(ss(2)), 2, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(recordedPoints(rec) == expectedRecording)
  }

  test("derived store accretes PARTIAL chunks; compaction re-seals " +
       "without changing answers") {
    val (raw, rec, al) = freshDirs("compact")
    slices.zipWithIndex.foreach { case (rows, id) =>
      StreamRules.foldGroupBatch(toDf(rows), id, labelCols, "ts", "v",
        group, raw, rec, al)
    }
    // per-batch appends leave several chunks per (series, window)
    val perWindow = Ts.readStore(spark, rec)
      .groupBy((labelCols :+ "window_start").map(org.apache.spark.sql.functions.col): _*)
      .count().agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(perWindow > 1, "expected partial chunks from incremental appends")
    val resealed = rec + "_sealed"
    Ts.compactStore(spark, rec, resealed)
    assert(recordedPoints(resealed) == expectedRecording)
    val sealedPerWindow = Ts.readStore(spark, resealed)
      .groupBy((labelCols :+ "window_start").map(org.apache.spark.sql.functions.col): _*)
      .count().agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(sealedPerWindow == 1L)
  }

  test("empty batches are cursor-only no-ops; beyond-lateness arrivals " +
       "land in raw but never re-fold an evaluated step") {
    import spark.implicits._
    val (raw, rec, al) = freshDirs("edge")
    val ss = slices
    val empty = Seq.empty[(String, String, Long, Double)]
    // an empty batch mid-stream: the cursor advances its batchId, the
    // grid does not move, and the final parity is unaffected
    StreamRules.foldGroupBatch(toDf(ss(0)), 0, labelCols, "ts", "v",
      group, raw, rec, al)
    StreamRules.foldGroupBatch(toDf(empty), 1, labelCols, "ts", "v",
      group, raw, rec, al)
    StreamRules.foldGroupBatch(toDf(ss(1)), 2, labelCols, "ts", "v",
      group, raw, rec, al)
    StreamRules.foldGroupBatch(toDf(ss(2)), 3, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(recordedPoints(rec) == expectedRecording)
    // a point LATER than the lateness bound (its covering step already
    // folded): the raw store accepts it — future steps and ad-hoc raw
    // queries see it — but the evaluated step stays as-folded
    // (documented at-most-once staleness, never a re-fold or a crash)
    val before = recordedPoints(rec)
    val rawBefore = Ts.readStore(spark, raw).agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    StreamRules.foldGroupBatch(
      toDf(Seq(("click", "h1", T0 + 300L, 99.0))), 4, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(recordedPoints(rec) == before)
    val rawAfter = Ts.readStore(spark, raw).agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(rawAfter == rawBefore + 1)
  }

  test("end-to-end over a real stream: groupStream materializes the " +
       "batch-identical derived store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (raw, rec, al) = freshDirs("e2e")
    val ck = java.nio.file.Files.createTempDirectory("graft_rules_ck").toString
    val input = MemoryStream[(String, String, Long, Double)]
    val events = input.toDF().toDF("type", "host", "sec", "v")
      .select(col("type"), col("host"),
        (col("sec") * 1000000000L).as("ts"), col("v"))
    val q = StreamRules.groupStream(events, labelCols, "ts", "v",
      group, raw, rec, al, ck).start()
    try {
      slices.foreach { rows => input.addData(rows); q.processAllAvailable() }
    } finally q.stop()
    assert(recordedPoints(rec) == expectedRecording)
  }

  test("crash between appends and cursor move: replay replaces, never duplicates") {
    val (raw, rec, al) = freshDirs("crash")
    val ss = slices
    val marker = java.nio.file.Paths.get(rec + "_rules_batch")
    StreamRules.foldGroupBatch(toDf(ss(0)), 0, labelCols, "ts", "v",
      group, raw, rec, al)
    val cursorAfter0 = java.nio.file.Files.readAllBytes(marker)
    StreamRules.foldGroupBatch(toDf(ss(1)), 1, labelCols, "ts", "v",
      group, raw, rec, al)
    val rawRows = Ts.readStore(spark, raw).count()
    val recRows = Ts.readStore(spark, rec).count()
    val alRows = spark.read.parquet(al).count()
    // crash simulation: every append of batch 1 landed, but the cursor
    // move didn't — foreachBatch replays batch 1 against this state
    java.nio.file.Files.write(marker, cursorAfter0)
    StreamRules.foldGroupBatch(toDf(ss(1)), 1, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(Ts.readStore(spark, raw).count() == rawRows, "raw duplicated")
    assert(Ts.readStore(spark, rec).count() == recRows, "derived duplicated")
    assert(spark.read.parquet(al).count() == alRows, "alert log duplicated")
    // and the stream still equals batch after the crash-replay
    StreamRules.foldGroupBatch(toDf(ss(2)), 2, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(recordedPoints(rec) == expectedRecording)
    assert(spark.read.parquet(al)
      .select("host", "ts", "state").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      == expectedAlerts)
  }

  test("retention bounds the raw/derived stores and the alert state log") {
    val (raw, rec, al) = freshDirs("retention")
    // three batches, each a day apart: with retentionDays = 1 the
    // oldest day's partitions must age out behind the watermark
    val days = (0 until 3).map { d =>
      allEvents.map { case (t, h, sec, v) => (t, h, sec + d * 86400L, v) }
    }
    val g = group.copy(retentionDays = 1)
    days.zipWithIndex.foreach { case (rows, id) =>
      StreamRules.foldGroupBatch(toDf(rows), id, labelCols, "ts", "v",
        g, raw, rec, al)
    }
    def dates(path: String, prefix: String): Seq[String] =
      new java.io.File(path).listFiles().toSeq.map(_.getName)
        .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix)).sorted
    val cutoff = java.time.LocalDate.ofEpochDay(
      Math.floorDiv(days.last.map(_._3).max, 86400L) - 1).toString
    assert(dates(raw, "window_date=").nonEmpty &&
      dates(raw, "window_date=").forall(_ >= cutoff), dates(raw, "window_date="))
    assert(dates(rec, "window_date=").forall(_ >= cutoff))
    assert(dates(al, "state_date=").nonEmpty &&
      dates(al, "state_date=").forall(_ >= cutoff))
    // the surviving window still answers: current alerts at the last
    // evaluated step come straight off the bounded log
    val last = StreamRules.lastEvaluatedStep(rec).get
    assert(StreamRules.currentAlerts(spark, al, last).count() >= 0)
  }

  // ===== round-16: keep_firing_for (un-fire hysteresis) =====

  /** One event per 600-s step window (at step−300), so the per-step
    * condition `sum_over_time(m[10m]) > 5` is exactly v_i > 5:
    * true/true/true/false/true/false/false/false/true/true/true —
    * with for=1200 (3 steps) and keep_firing_for=1200 (2 steps) this
    * exercises: pending ramp, firing, a kept-alive false step, re-arm
    * WITHOUT re-entering pending, hysteresis tails, chain death after
    * a > keep gap, and a fresh pending ramp. Trailing false event
    * moves the watermark past step 11. */
  private val keepVals =
    Seq(10.0, 10.0, 10.0, 1.0, 10.0, 1.0, 1.0, 1.0, 10.0, 10.0, 10.0, 1.0)
  private def keepEvents: Seq[(String, String, Long, Double)] =
    keepVals.zipWithIndex.map { case (v, i) => ("m", "h1", T0 + i * 600L + 300L, v) }
  private val KeepExpr = "sum by (host) (sum_over_time(m[10m])) > 5"

  /** The hand-derived state machine (step# relative to T0). */
  private val keepExpected: Set[(Long, String, Boolean, Double)] = Set(
    (1L, "pending", true, 10.0), (2L, "pending", true, 10.0),
    (3L, "firing", true, 10.0),  // for-continuity earned
    (4L, "firing", false, 10.0), // kept alive, value carried forward
    (5L, "firing", true, 10.0),  // re-armed: NO pending re-entry
    (6L, "firing", false, 10.0), (7L, "firing", false, 10.0), // tails
    // step 8: > keep gap -> chain dead, no row
    (9L, "pending", true, 10.0), (10L, "pending", true, 10.0), // re-earn
    (11L, "firing", true, 10.0))

  test("keep_firing_for: hysteresis state machine, hand-pinned (batch)") {
    val ch = Ts.chunkify(toDf(keepEvents), labelCols, "ts", "v")
    val got = Rules.alert(ch, labelCols,
        Rules.Alert("Flappy", KeepExpr, 1200L,
          T0 + 600L, T0 + 11 * 600L, 600L, keepFiringForSec = 1200L))
      .collect().map(r => (Math.floorDiv(r.getAs[Long]("ts") - T0, 600L),
        r.getAs[String]("state"), r.getAs[Boolean]("cond"),
        r.getAs[Double]("value"))).toSet
    assert(got == keepExpected)
    // keepFiringForSec = 0 keeps the original sparse schema (no cond
    // column, no hysteresis rows)
    val plain = Rules.alert(ch, labelCols,
      Rules.Alert("Flappy", KeepExpr, 1200L,
        T0 + 600L, T0 + 11 * 600L, 600L))
    assert(!plain.columns.contains("cond"))
    assert(plain.count() == keepExpected.count(_._3))
  }

  test("keep_firing_for stream == batch across a chain-splitting boundary") {
    val (raw, rec, al) = freshDirs("keep")
    val g = StreamRules.RuleGroup(stepSec = 600L,
      alerts = Seq(StreamRules.Alert("Flappy", KeepExpr,
        forSec = 1200L, keepFiringForSec = 1200L)),
      latenessSec = 0L)
    // boundary BETWEEN step 5 and step 6: fold 2's local lookback
    // (for+keep = steps 2..) cannot re-derive that step 3 earned
    // for-continuity (step 1 is outside it), so step 5's firing — and
    // the step-6/7 tails — are recoverable ONLY through the state-log
    // seed; a lost seed shows up as pending/missing rows here
    val ev = keepEvents
    StreamRules.foldGroupBatch(toDf(ev.take(6)), 0, labelCols, "ts", "v",
      g, raw, rec, al)
    StreamRules.foldGroupBatch(toDf(ev.drop(6)), 1, labelCols, "ts", "v",
      g, raw, rec, al)
    val got = spark.read.parquet(al)
      .collect().map(r => (Math.floorDiv(r.getAs[Long]("ts") - T0, 600L),
        r.getAs[String]("state"), r.getAs[Boolean]("cond"),
        r.getAs[Double]("value"))).toSet
    assert(got == keepExpected)
    // and a crash-replay of the second fold neither duplicates nor
    // re-resolves the kept-alive rows
    StreamRules.foldGroupBatch(toDf(ev.drop(6)), 1, labelCols, "ts", "v",
      g, raw, rec, al)
    assert(spark.read.parquet(al).count() == keepExpected.size)
  }

  test("legacy single-level store layout is refused with a migration recipe") {
    val (raw, rec, al) = freshDirs("legacy")
    val ss = slices
    // a real pre-upgrade deployment: fold one batch, then down-convert
    // the raw store to the legacy window_date=<d>/*.parquet layout
    // (files directly under the date partition, no batch_id level)
    StreamRules.foldGroupBatch(toDf(ss(0)), 0, labelCols, "ts", "v",
      group, raw, rec, al)
    val root = new java.io.File(raw)
    root.listFiles().filter(_.getName.startsWith("window_date=")).foreach { d =>
      d.listFiles().filter(_.getName.startsWith("batch_id=")).foreach { b =>
        b.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          assert(f.renameTo(new java.io.File(d, f.getName)))
        }
        b.listFiles().foreach(_.delete()); b.delete()
      }
    }
    // the next fold must REFUSE before writing anything beside it
    val e = intercept[IllegalArgumentException] {
      StreamRules.foldGroupBatch(toDf(ss(1)), 1, labelCols, "ts", "v",
        group, raw, rec, al)
    }
    assert(e.getMessage.contains("legacy single-level window_date layout"))
    assert(e.getMessage.contains("batch_id=-1"), "migration recipe missing")
    // nothing was appended by the refused fold
    assert(!root.listFiles().filter(_.getName.startsWith("window_date="))
      .flatMap(_.listFiles()).exists(_.getName.startsWith("batch_id=")))
    // apply the recipe: window_date=<d>/* -> window_date=<d>/batch_id=-1/
    root.listFiles().filter(_.getName.startsWith("window_date=")).foreach { d =>
      val tgt = new java.io.File(d, "batch_id=-1")
      assert(tgt.mkdir())
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        assert(f.renameTo(new java.io.File(tgt, f.getName)))
      }
    }
    // the stream continues: remaining batches fold and the final
    // derivation still equals the one-shot batch evaluation, so the
    // migrated legacy partitions read together with the new ones
    StreamRules.foldGroupBatch(toDf(ss(1)), 1, labelCols, "ts", "v",
      group, raw, rec, al)
    StreamRules.foldGroupBatch(toDf(ss(2)), 2, labelCols, "ts", "v",
      group, raw, rec, al)
    assert(recordedPoints(rec) == expectedRecording)
  }

  // ===== round-18: streaming-rule conformance sweep =====

  /** Representative recording-rule shapes over the (type, host) store
    * — the stepped surface's composition space as RULE bodies: the
    * `_over_time` family, rate/counter functions, aggregations,
    * binary/label/math composition, offset/@/subquery modifiers.
    * Window durations are multiples of the 600 s step grid. */
  private def ruleShapes: Seq[String] = Seq(
    "sum by (host) (sum_over_time(click[10m]))",
    "sum_over_time(click[10m])",
    "count_over_time(click[10m])",
    "min_over_time(click[10m])",
    "max_over_time(click[10m])",
    "avg_over_time(click[10m])",
    "last_over_time(click[10m])",
    "present_over_time(click[10m])",
    "stddev_over_time(click[10m])",
    "stdvar_over_time(click[10m])",
    "mad_over_time(click[10m])",
    "quantile_over_time(0.9, click[10m])",
    "rate(click[10m])",
    "increase(click[10m])",
    "delta(click[10m])",
    "idelta(click[10m])",
    "irate(click[10m])",
    "changes(click[10m])",
    "resets(click[10m])",
    "deriv(click[10m])",
    "predict_linear(click[10m], 600)",
    "holt_winters(click[20m], 0.3, 0.1)",
    "avg by (host) (sum_over_time(click[10m]))",
    "max without (host) (sum_over_time(click[10m]))",
    """count_values("bucket", sum_over_time(click[10m]))""",
    "topk(1, sum_over_time(click[10m]))",
    "bottomk(1, sum_over_time(click[10m]))",
    "quantile(0.5, sum_over_time(click[10m]))",
    "group(sum_over_time(click[10m]))",
    "sum_over_time(click[10m]) + sum_over_time(view[10m])",
    "sum_over_time(click[10m]) > 50",
    "sum_over_time(click[10m]) > bool 50",
    "clamp(sum_over_time(click[10m]), 0, 100)",
    "abs(sum_over_time(click[10m]) - 10)",
    "round(sum_over_time(click[10m]), 1)",
    "sqrt(sum_over_time(click[10m]))",
    "exp(ln(sum_over_time(click[10m]) + 1))",
    "sgn(sum_over_time(click[10m]) - 10)",
    """label_replace(sum_over_time(click[10m]), "dc", "$1", "host", "h(.*)")""",
    """label_join(sum_over_time(click[10m]), "th", "-", "type", "host")""",
    "sort_desc(sum_over_time(click[10m]))",
    "absent_over_time(click[10m])",
    "timestamp(last_over_time(click[10m]))",
    "sum_over_time(click[10m] offset 10m)",
    "sum_over_time(click[20m:10m])",
    "sum_over_time(click[10m]) or sum_over_time(view[10m])",
    "sum_over_time(click[10m]) unless sum_over_time(view[10m])",
    "histogram_quantile(0.9, sum by (le) (rate(click[10m])))",
    "click") // bare selector: the documented wrap-in-_over_time rejection

  test("conformance sweep: every rule shape folds through ONE stream " +
       "micro-batch or rejects with a documented error") {
    // r18 (VERDICT r17 ask #8): the parse/eval/evalRange sweeps gate
    // the stepped surface; the streaming rule loop composes evalRange
    // with ingest, cursor, chunkify and the idempotent append — a
    // crash HERE is a stream-lowering composition bug those sweeps
    // cannot see (a standing rule group would wedge instead of
    // rejecting the one bad rule). Every shape must either fold into
    // a readable derived store or raise the engine's own documented
    // IllegalArgumentException.
    val documented = Seq(
      "bare instant selector in a range query", // wrap-in-_over_time rule
      "must be a positive multiple",            // window vs step grid
      "needs an 'le'",                          // histogram member, non-bucket store
      "order-dependent",                        // float-sum ordering guards
      "not in result labels",                   // by(le) on the non-bucket store
      "timestamp() expects an instant selector") // documented composition limit
    var folded = 0
    var rejected = Vector.empty[String]
    val crashes = ruleShapes.zipWithIndex.flatMap { case (expr, i) =>
      val (raw, rec, al) = freshDirs(s"sweep$i")
      val g = StreamRules.RuleGroup(stepSec = Step,
        recordings = Seq(StreamRules.Recording(s"sweep:r$i", expr)),
        alerts = Nil, latenessSec = 300L)
      try {
        StreamRules.foldGroupBatch(toDf(allEvents), 0, labelCols, "ts", "v",
          g, raw, rec, al)
        // the derived store must be READABLE after the fold (an empty
        // result legitimately writes no store — absent/unless shapes)
        if (new java.io.File(rec).exists()) recordedPoints(rec)
        folded += 1; None
      } catch {
        case e: IllegalArgumentException =>
          rejected :+= s"$expr -> ${e.getMessage}"; None
        case e: Throwable => Some(s"$expr -> ${e.getClass.getName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
      }
    }
    assert(crashes.isEmpty, s"stream-rule lowering CRASHES:\n  ${crashes.mkString("\n  ")}")
    val undocumented = rejected.filterNot(r => documented.exists(r.contains))
    assert(undocumented.isEmpty,
      s"UNDOCUMENTED stream-rule rejections:\n  ${undocumented.mkString("\n  ")}")
    // the sweep must not vacuously pass by rejecting everything
    assert(folded >= ruleShapes.size - 6,
      s"only $folded/${ruleShapes.size} folded; rejections:\n  " +
        rejected.mkString("\n  "))
  }
}
