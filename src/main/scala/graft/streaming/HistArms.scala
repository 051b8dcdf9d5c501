package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/**
 * Per-event ARM DERIVATION for the streaming native-histogram ingest
 * path: maps raw events to the (series-key, event-time, weight)
 * increments [[StreamIngest.cumulativeGridStream]] folds into dense
 * cumulative grids — the stateless half of the batch builders
 * ([[graft.queries.TsQueries]]'s `buildNativeHistStoreFrom` /
 * `buildNhcbStoreFrom`), kept semantically identical so the streamed
 * samples chunkify into the SAME store the batch path writes
 * (batch-twin parity per shape pinned in StreamIngestSpec; the r17
 * plain shape priced at 200M events in ScaleBench).
 *
 * The series key packs the label columns with "|" (store labels carry
 * no pipes); weights are exact integer cent units — the bucket and
 * count arms weigh 1 per observation, the sum arm weighs the SIGNED
 * cents, so the downstream cumulative is the store's integer grid and
 * the sum arm recovers dollars by one /100 at chunkify time.
 *
 * Scale: one broadcast bound-table join + one ×3 explode per event —
 * no self-union (the batch builders' three-way union reads the events
 * once per arm; a stream cannot re-read its source), no state, no
 * shuffle of its own.
 */
object HistArms {
  private val tupleEnc = Encoders.product[(String, java.sql.Timestamp, Long)]

  /** Exponential-bucket shapes — plain (`schemaExpr = None`), mixed /
    * wide (a per-series schema expression keys the broadcast bucket
    * table and rides the series key), signed (`centsOffset`
    * re-centers observations: negative cents land in the MIRRORED
    * "n"+i arms, zero in the zero arm, and the sum-arm weight keeps
    * its sign). Mirrors `buildNativeHistStoreFrom` arm-for-arm. */
  def nativeArms(ev0: DataFrame, schemaExpr: Option[Column],
                 schemas: Seq[Int], centsOffset: Long)
      : Dataset[(String, java.sql.Timestamp, Long)] = {
    val s = ev0.sparkSession
    val hasSchema = schemaExpr.isDefined
    val base = ev0.select(Seq(
      col("event_type"),
      concat(lit("h"), pmod(col("user_id"), lit(100L))).as("__host"),
      (round(col("value") * 100).cast("long") - centsOffset).as("cents"),
      to_timestamp(graft.tsdb.Ts.epochSec(ev0, "ts")).as("tts")) ++
      schemaExpr.map(_.as("schema")): _*)
    val b = broadcast(
      if (hasSchema) s.createDataFrame(schemas.flatMap(sc =>
          graft.tsdb.NativeHist.bucketsFor(sc)
            .map(t => (sc.toString, t._1.toString, t._2, t._3))))
        .toDF("bsch", "bnb", "lo_c", "hi_c")
      else s.createDataFrame(graft.tsdb.NativeHist.bucketsFor(schemas.head)
          .map(t => (t._1.toString, t._2, t._3)))
        .toDF("bnb", "lo_c", "hi_c"))
    val joinCond = (if (hasSchema) col("schema") === col("bsch") else lit(true)) &&
      abs(col("cents")) > col("lo_c") && abs(col("cents")) <= col("hi_c")
    val keyCols = Seq(col("event_type"), col("__host")) ++
      (if (hasSchema) Seq(col("schema")) else Nil)
    base.join(b, joinCond, "left")
      .withColumn("bnb", when(col("cents") === 0, lit("zero"))
        .when(col("cents") < 0, concat(lit("n"), col("bnb")))
        .otherwise(col("bnb")))
      .withColumn("x", explode(array(
        struct(col("bnb").as("arm"), lit(1L).as("w")),
        struct(lit("count").as("arm"), lit(1L).as("w")),
        struct(lit("sum").as("arm"), col("cents").as("w")))))
      .select(concat_ws("|", keyCols :+ col("x.arm"): _*).as("_1"),
        col("tts").as("_2"), col("x.w").as("_3"))
      .as(tupleEnc)
  }

  /** The NHCB (custom-bucket) shape: every scrape carries the FULL
    * bound layout (the NHCB wire model — and what the bound-lag
    * quantile interpolation needs: an empty bucket must still exist
    * as a zero row, exactly like `buildNhcbStoreFrom`'s full-layout
    * crossJoin), so each observation explodes onto ALL bounds with a
    * conditional weight (1 in its bucket, 0 elsewhere — the zero
    * increments force series existence from the host's first scrape)
    * plus the count/sum arms. The bound list `(label, hiCents)` is
    * compile-time, so the whole derivation is one codegen'd explode —
    * no join, and no self-union (a stream cannot re-read its
    * source). */
  def nhcbArms(ev0: DataFrame, buckets: Seq[(String, Long)])
      : Dataset[(String, java.sql.Timestamp, Long)] = {
    val lays = buckets.map(_._2)
    val armStructs = buckets.zipWithIndex.map { case ((le, hi), i) =>
      val lo = if (i == 0) Long.MinValue else lays(i - 1)
      struct(lit(le).as("arm"),
        when(col("cents") > lo && col("cents") <= hi, lit(1L))
          .otherwise(lit(0L)).as("w"))
    } ++ Seq(
      struct(lit("count").as("arm"), lit(1L).as("w")),
      struct(lit("sum").as("arm"), col("cents").as("w")))
    ev0.select(
        col("event_type"),
        concat(lit("h"), pmod(col("user_id"), lit(100L))).as("__host"),
        round(col("value") * 100).cast("long").as("cents"),
        to_timestamp(graft.tsdb.Ts.epochSec(ev0, "ts")).as("tts"))
      .withColumn("x", explode(array(armStructs: _*)))
      .select(concat_ws("|", col("event_type"), col("__host"), col("x.arm")).as("_1"),
        col("tts").as("_2"), col("x.w").as("_3"))
      .as(tupleEnc)
  }
}
