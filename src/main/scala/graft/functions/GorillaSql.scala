package graft.functions

import graft.core.GorillaCodec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

/**
 * Runtime bridge between Catalyst internal types and [[graft.core.GorillaCodec]].
 *
 * Methods here are called from generated code (whole-stage codegen), so
 * they must be static-forwardable (plain object methods) and operate on
 * Spark internal representations directly — no Row/Encoder round-trips.
 */
object GorillaSql {

  /** points: array<struct<ts: long, v: double>> (pre-sorted by ts). */
  def encode(points: ArrayData, headerTime: Long, leadTrail: Boolean): Array[Byte] = {
    val n = points.numElements()
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = points.getStruct(i, 2)
      ts(i) = row.getLong(0)
      vs(i) = row.getDouble(1)
      i += 1
    }
    GorillaCodec.encode(ts, vs, headerTime, leadTrail)
  }

  def encodeValues(values: ArrayData, leadTrail: Boolean): Array[Byte] =
    GorillaCodec.encodeValues(values.toDoubleArray(), leadTrail)

  def decode(bytes: Array[Byte]): ArrayData = {
    val (ts, vs) = GorillaCodec.decode(bytes)
    val rows = new Array[Any](ts.length)
    var i = 0
    while (i < ts.length) {
      rows(i) = new GenericInternalRow(Array[Any](ts(i), vs(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def decodeValues(bytes: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(GorillaCodec.decodeValues(bytes))

  def decodeTimestamps(bytes: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(GorillaCodec.decodeTimestamps(bytes))

  /** struct<n: long, min_ts: long, max_ts: long, min_v: double,
    * max_v: double, sum_v: double, sum_fixed: long, sumsq_fixed: long>.
    * `sum_fixed` is Σ round(v·scale) as a long (Spark round/cast
    * semantics exactly) and `sumsq_fixed` is Σ round(v·scale)² — the
    * exact-integer second moment; both 0 when `hasScale` is false, so
    * the common no-fixed-sum path skips the per-point rounding work. */
  def chunkAgg(bytes: Array[Byte], scale: Double, hasScale: Boolean,
               ansi: Boolean): InternalRow = {
    val a = GorillaCodec.aggregate(bytes, scale, hasScale, ansi)
    new GenericInternalRow(Array[Any](
      a.n, a.minTs, a.maxTs, a.minV, a.maxV, a.sumV, a.sumFixed, a.sumSqFixed))
  }

  def chunkAgg(bytes: Array[Byte]): InternalRow =
    chunkAgg(bytes, 0.0, hasScale = false, ansi = false)

  /** struct<n, min_ts, max_ts, min_v, max_v: double, sum_cents: long,
    * sumsq_cents: long> over only the points with
    * fromSec <= ts <= toSec; NULL when no point falls in the range (so
    * aggregates skip the chunk without a per-row filter, which
    * Catalyst would push down and thereby evaluate this decode
    * twice). */
  def chunkAggRange(bytes: Array[Byte], fromSec: Long, toSec: Long): InternalRow = {
    val a = GorillaCodec.aggregateRange(bytes, fromSec, toSec)
    if (a.n == 0) null
    else new GenericInternalRow(Array[Any](
      a.n, a.minTs, a.maxTs, a.minV, a.maxV, a.sumFixed, a.sumSqFixed))
  }

  /** array<struct<bucket: long, n: long, min_v: double, max_v: double,
    * sum_fixed: long, sumsq_fixed: long>> — per-bucket downsample
    * partials of one chunk, from one streaming decode (see
    * GorillaCodec.aggregateBuckets). */
  def chunkBucketAgg(bytes: Array[Byte], bucketSec: Long, scale: Double,
                     ansi: Boolean = false): ArrayData = {
    val as = GorillaCodec.aggregateBuckets(bytes, bucketSec, scale, ansi)
    val rows = new Array[Any](as.length)
    var i = 0
    while (i < as.length) {
      val a = as(i)
      rows(i) = new GenericInternalRow(Array[Any](
        a.bucket, a.n, a.minV, a.maxV, a.sumFixed, a.sumSqFixed))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def numPoints(bytes: Array[Byte]): Int = GorillaCodec.numPoints(bytes)

  def isValid(bytes: Array[Byte]): Boolean = GorillaCodec.isValid(bytes)
}
