package graft.core

import java.nio.ByteBuffer

/**
 * Chunk-level Gorilla codec: a (timestamp, value) point stream packed
 * into one self-describing byte array.
 *
 * The stream interleaves one timestamp token and one value token per
 * point, exactly like the reference's compound stream (reference:
 * src/time_and_value_stream.rs:7-52). Unlike the reference — which
 * keeps the point count and header time external to the bit vector —
 * chunks here carry a fixed 17-byte header so they are self-describing
 * (required once chunks live in a distributed column store):
 *
 *   [0]    magic 'G'
 *   [1]    flags: bits 0-1 variant (1 = shrinking-window XOR,
 *          2 = lead/trail XOR); bit 2 set = value-only stream
 *          (no interleaved timestamp tokens)
 *   [2:6]  point count n          (big-endian int)
 *   [6:14] header time (epoch s)  (big-endian long)
 *   [14:18] payload bit length    (big-endian int)
 *   [18:]  bit-packed payload, 64-bit big-endian words
 */
object GorillaCodec {
  final val Magic: Byte = 'G'
  final val VariantXor: Byte = 1
  final val VariantLeadTrail: Byte = 2
  final val FlagValueOnly: Byte = 4
  private final val HeaderBytes = 18

  /** Align a timestamp down to a `windowSec` boundary (Gorilla uses 2 h). */
  def alignWindow(epochSec: Long, windowSec: Long): Long =
    Math.floorDiv(epochSec, windowSec) * windowSec

  /** Encode sorted timestamps + values into one chunk. */
  def encode(ts: Array[Long], vs: Array[Double], headerTime: Long,
             leadTrail: Boolean = false): Array[Byte] = {
    require(ts.length == vs.length, s"ts/vs length mismatch: ${ts.length} vs ${vs.length}")
    val w = new BitWriter(math.max(8, ts.length / 4))
    val tEnc = new TimestampCodec.Encoder(headerTime, w)
    val vEnc = new XorDoubleCodec.Encoder(w, leadTrail)
    var i = 0
    while (i < ts.length) { tEnc.push(ts(i)); vEnc.push(vs(i)); i += 1 }
    pack(w, ts.length, headerTime, if (leadTrail) VariantLeadTrail else VariantXor)
  }

  /** Encode a value-only stream (timestamps implicit/elsewhere). */
  def encodeValues(vs: Array[Double], leadTrail: Boolean = false): Array[Byte] = {
    val w = new BitWriter(math.max(8, vs.length / 4))
    val vEnc = new XorDoubleCodec.Encoder(w, leadTrail)
    var i = 0
    while (i < vs.length) { vEnc.push(vs(i)); i += 1 }
    val flags = (if (leadTrail) VariantLeadTrail else VariantXor) | FlagValueOnly
    pack(w, vs.length, 0L, flags.toByte)
  }

  private def pack(w: BitWriter, n: Int, headerTime: Long, variant: Byte): Array[Byte] = {
    val words = w.toWords
    val bb = ByteBuffer.allocate(HeaderBytes + words.length * 8)
    bb.put(Magic).put(variant).putInt(n).putLong(headerTime).putInt(w.bitLength.toInt)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  final case class Header(flags: Byte, n: Int, headerTime: Long, bitLength: Int) {
    def variant: Byte = (flags & 0x3).toByte
    def valueOnly: Boolean = (flags & FlagValueOnly) != 0
  }

  def readHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= HeaderBytes && bytes(0) == Magic, "not a graft gorilla chunk")
    val bb = ByteBuffer.wrap(bytes)
    bb.get()
    val h = Header(bb.get(), bb.getInt(), bb.getLong(), bb.getInt())
    // corrupt-header guards: a flipped n or bitLength must fail fast
    // HERE (or read as invalid via isValid), not as a multi-GB array
    // allocation or a garbage decode downstream. Every point costs at
    // least 1 bit (value repeat) — 2 interleaved — so n is bounded by
    // the payload bit budget; never rejects a chunk pack() produced.
    val payloadBits = (bytes.length - HeaderBytes).toLong * 8
    require(h.n >= 0 && h.bitLength >= 0 && h.bitLength <= payloadBits &&
      (h.n == 0 || h.n.toLong <= h.bitLength.toLong / (if (h.valueOnly) 1 else 2) + 1),
      s"corrupt gorilla chunk header: n=${h.n} bitLength=${h.bitLength} payload=$payloadBits bits")
    h
  }

  /** Cheap validity probe: does this blob carry a sane chunk header?
    * The scan-time guard for bit-rot at scale — `filter(gorilla_is_valid
    * (chunk))` skips corrupt rows instead of failing the job. */
  def isValid(bytes: Array[Byte]): Boolean =
    try { readHeader(bytes); true } catch { case _: IllegalArgumentException => false }

  /** O(1): point count from the chunk header alone. */
  def numPoints(bytes: Array[Byte]): Int = readHeader(bytes).n

  private def reader(bytes: Array[Byte], h: Header): BitReader = {
    val bb = ByteBuffer.wrap(bytes, HeaderBytes, bytes.length - HeaderBytes)
    val words = new Array[Long]((bytes.length - HeaderBytes) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    new BitReader(words, h.bitLength.toLong)
  }

  /** Decode a full chunk back to parallel (timestamps, values) arrays. */
  def decode(bytes: Array[Byte]): (Array[Long], Array[Double]) = {
    val h = readHeader(bytes)
    require(!h.valueOnly, "value-only chunk has no timestamps; use decodeValues")
    val r = reader(bytes, h)
    val lt = h.variant == VariantLeadTrail
    val tDec = new TimestampCodec.Decoder(h.headerTime, r)
    val vDec = new XorDoubleCodec.Decoder(r, lt)
    val ts = new Array[Long](h.n)
    val vs = new Array[Double](h.n)
    var i = 0
    while (i < h.n) { ts(i) = tDec.next(); vs(i) = vDec.next(); i += 1 }
    (ts, vs)
  }

  /** Decode just the values. Interleaved timestamp tokens must still
    * be CONSUMED to advance the bit stream, but no timestamp array is
    * ever materialized. */
  def decodeValues(bytes: Array[Byte]): Array[Double] = {
    val h = readHeader(bytes)
    val r = reader(bytes, h)
    val vDec = new XorDoubleCodec.Decoder(r, h.variant == VariantLeadTrail)
    val vs = new Array[Double](h.n)
    var i = 0
    if (h.valueOnly) {
      while (i < h.n) { vs(i) = vDec.next(); i += 1 }
    } else {
      val tDec = new TimestampCodec.Decoder(h.headerTime, r)
      while (i < h.n) { tDec.next(); vs(i) = vDec.next(); i += 1 }
    }
    vs
  }

  /** Decode just the timestamps of an interleaved chunk; value tokens
    * advance the stream but are never materialized. */
  def decodeTimestamps(bytes: Array[Byte]): Array[Long] = {
    val h = readHeader(bytes)
    require(!h.valueOnly, "value-only chunk has no timestamps; use decodeValues")
    val r = reader(bytes, h)
    val tDec = new TimestampCodec.Decoder(h.headerTime, r)
    val vDec = new XorDoubleCodec.Decoder(r, h.variant == VariantLeadTrail)
    val ts = new Array[Long](h.n)
    var i = 0
    while (i < h.n) { ts(i) = tDec.next(); vDec.next(); i += 1 }
    ts
  }

  /** Streaming aggregate over one compressed chunk — no array
    * materialization (the csv_to_packed example's query mode,
    * reference: examples/csv_to_packed.rs:40-78). `sumFixed` is the
    * fixed-point long sum Σ round(v·fixedScale) (0 unless `hasFixed`):
    * order-independent, so per-chunk partials re-aggregate exactly
    * across shuffles where a double sum would not. `sumSqFixed` is
    * Σ round(v·fixedScale)² — the second moment in the same exact
    * integer domain, so mean/variance (and 3-sigma tests) derive from
    * chunk headers alone with zero decode. */
  final case class ChunkAgg(n: Long, minTs: Long, maxTs: Long,
                            minV: Double, maxV: Double, sumV: Double,
                            sumFixed: Long, sumSqFixed: Long)

  /** Doubles at or above this magnitude have no fractional part, so
    * rounding is the identity and only cast saturation remains. */
  private final val IntegralThreshold = 4503599627370496.0 // 2^52

  /** Spark's round(x, 0) then cast to long, replicated exactly so a
    * chunk-level partial equals the per-point expression bit-for-bit:
    * NaN/±Infinity pass through round and saturate in the long cast;
    * finite values round HALF_UP on the shortest decimal repr (what
    * scala BigDecimal(d) — and Spark's RoundBase — use).
    *
    * Allocation-free: a shortest decimal repr reads exactly "k.5" iff
    * the double IS exactly k.5 (toString round-trips uniquely, and
    * every k.5 with |k| < 2^52 is itself a double), and it preserves
    * ordering against every k.5 boundary (the repr lies within the
    * double's rounding interval, which cannot straddle another
    * representable value). So HALF_UP-on-repr == round half away from
    * zero on the exact double. Math.round is exact integer-arithmetic
    * nearest-with-ties-toward-+inf (not floor(x+0.5) — JDK ≥ 7), which
    * matches away-from-zero for x ≥ 0; negation covers negative ties
    * (-2.5 → -3, where a bare Math.round would give -2). Equivalence
    * vs the BigDecimal reference is property-pinned in CodecSpec. */
  private[graft] def halfUpFixed(x: Double): Long =
    if (x >= 0.0) { // includes -0.0
      if (x < IntegralThreshold) Math.round(x) else x.toLong // toLong saturates +Inf/2^63+
    } else if (x > -IntegralThreshold) {
      -Math.round(-x)
    } else x.toLong // integral already; saturates -Inf and beyond-long
    // NaN: both comparisons false, falls to x.toLong == 0L

  /** ANSI-mode variant: Spark's `cast(double as long)` under
    * spark.sql.ansi.enabled THROWS on NaN/±Infinity/overflow instead
    * of saturating, and a rewrite must error exactly where the
    * un-rewritten query would. */
  private[graft] def halfUpFixedAnsi(x: Double): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(
        s"[CAST_OVERFLOW] The value $x of the type \"DOUBLE\" cannot be cast to \"BIGINT\"")
    if (x > -IntegralThreshold && x < IntegralThreshold) {
      if (x >= 0.0) Math.round(x) else -Math.round(-x)
    } else {
      // |x| ≥ 2^52: x is integral, rounding is the identity; only the
      // long-range check remains (x == -2^63 passes, as in Spark).
      if (x < Long.MinValue.toDouble || x > Long.MaxValue.toDouble)
        throw new ArithmeticException(
          s"[CAST_OVERFLOW] The value $x of the type \"DOUBLE\" cannot be cast to \"BIGINT\"")
      x.toLong
    }
  }

  def aggregate(bytes: Array[Byte], fixedScale: Double = 0.0,
                hasFixed: Boolean = false, fixedAnsi: Boolean = false): ChunkAgg = {
    // Fast path: plain IEEE comparisons, zero NaN bookkeeping in the
    // loop. Any NaN value forces `sum` to NaN (x + NaN = NaN), so a
    // non-NaN sum PROVES the chunk had no NaN and IEEE min/max equal
    // Spark's nan-safe total order. A NaN sum (a NaN value, or a
    // +Inf/-Inf mix) falls back to one careful re-decode — rare by
    // construction, and correctness never depends on rarity.
    val h = readHeader(bytes)
    val r = reader(bytes, h)
    val lt = h.variant == VariantLeadTrail
    val tDec = if (h.valueOnly) null else new TimestampCodec.Decoder(h.headerTime, r)
    val vDec = new XorDoubleCodec.Decoder(r, lt)
    var i = 0
    var minTs = Long.MaxValue; var maxTs = Long.MinValue
    var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
    var sum = 0.0
    var sumFixed = 0L
    var sumSqFixed = 0L
    if (hasFixed && !fixedAnsi) {
      // dedicated loop for the hot shape (every ChunkAggRule partial):
      // no per-point flag tests, halfUpFixed inlines monomorphically
      while (i < h.n) {
        if (tDec != null) {
          val t = tDec.next()
          if (t < minTs) minTs = t
          if (t > maxTs) maxTs = t
        }
        val v = vDec.next()
        if (v < minV) minV = v
        if (v > maxV) maxV = v
        sum += v
        val c = halfUpFixed(v * fixedScale)
        sumFixed += c
        sumSqFixed += c * c
        i += 1
      }
    } else while (i < h.n) {
      if (tDec != null) {
        val t = tDec.next()
        if (t < minTs) minTs = t
        if (t > maxTs) maxTs = t
      }
      val v = vDec.next()
      if (v < minV) minV = v
      if (v > maxV) maxV = v
      sum += v
      if (hasFixed) {
        val c = halfUpFixedAnsi(v * fixedScale)
        sumFixed += c
        sumSqFixed += c * c
      }
      i += 1
    }
    if (java.lang.Double.isNaN(sum))
      return aggregateNanSafe(bytes, fixedScale, hasFixed, fixedAnsi)
    if (tDec == null) { minTs = 0L; maxTs = 0L }
    ChunkAgg(h.n.toLong, minTs, maxTs, minV, maxV, sum, sumFixed, sumSqFixed)
  }

  /** Per-bucket partial of a compressed-domain downsample. */
  final case class BucketAgg(bucket: Long, n: Long, minV: Double,
                             maxV: Double, sumFixed: Long, sumSqFixed: Long)

  /**
   * Streaming DOWNSAMPLE of one compressed chunk: one decode pass
   * folds the points into per-`bucketSec` partials (count, nan-safe
   * min/max, HALF_UP fixed-point sum) — a 2-h chunk at 1 Hz becomes
   * ≤ 8 rows for 15-min buckets instead of 7200 exploded points, and
   * the partials re-aggregate exactly across chunks/shuffles (longs
   * and min/max are order-independent). Timestamps are encoded in
   * ascending order, so buckets close run-wise with O(1) state.
   */
  def aggregateBuckets(bytes: Array[Byte], bucketSec: Long,
                       fixedScale: Double,
                       fixedAnsi: Boolean = false): Array[BucketAgg] = {
    val h = readHeader(bytes)
    val r = reader(bytes, h)
    val lt = h.variant == VariantLeadTrail
    val tDec = if (h.valueOnly) null else new TimestampCodec.Decoder(h.headerTime, r)
    val vDec = new XorDoubleCodec.Decoder(r, lt)
    val out = scala.collection.mutable.ArrayBuffer.empty[BucketAgg]
    var curBucket = Long.MinValue
    var n = 0L; var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
    var sumFixed = 0L; var sumSqFixed = 0L
    var sawNaN = false; var sawNonNaN = false
    def flush(): Unit = if (n > 0) {
      var lo = minV; var hi = maxV
      if (sawNaN) { hi = Double.NaN; if (!sawNonNaN) lo = Double.NaN }
      out += BucketAgg(curBucket, n, lo, hi, sumFixed, sumSqFixed)
    }
    var i = 0
    while (i < h.n) {
      val t = if (tDec != null) tDec.next() else 0L
      val v = vDec.next()
      val b = Math.floorDiv(t, bucketSec) * bucketSec
      if (b != curBucket) {
        flush()
        curBucket = b; n = 0L
        minV = Double.PositiveInfinity; maxV = Double.NegativeInfinity
        sumFixed = 0L; sumSqFixed = 0L; sawNaN = false; sawNonNaN = false
      }
      n += 1
      if (v != v) sawNaN = true
      else {
        sawNonNaN = true
        if (v < minV) minV = v
        if (v > maxV) maxV = v
      }
      val c = if (fixedAnsi) halfUpFixedAnsi(v * fixedScale)
              else halfUpFixed(v * fixedScale)
      sumFixed += c
      sumSqFixed += c * c
      i += 1
    }
    flush()
    out.toArray
  }

  /** The careful variant behind [[aggregate]]'s NaN-sum fallback:
    * min/max follow Spark's nan-safe total order (max is NaN when ANY
    * value was NaN, min only when ALL were), so chunk partials agree
    * with Spark Min/Max over the exploded points. */
  private def aggregateNanSafe(bytes: Array[Byte], fixedScale: Double,
                               hasFixed: Boolean, fixedAnsi: Boolean): ChunkAgg = {
    val h = readHeader(bytes)
    val r = reader(bytes, h)
    val lt = h.variant == VariantLeadTrail
    val tDec = if (h.valueOnly) null else new TimestampCodec.Decoder(h.headerTime, r)
    val vDec = new XorDoubleCodec.Decoder(r, lt)
    var i = 0
    var minTs = Long.MaxValue; var maxTs = Long.MinValue
    var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
    var sum = 0.0
    var sumFixed = 0L
    var sumSqFixed = 0L
    var sawNaN = false; var sawNonNaN = false
    while (i < h.n) {
      if (tDec != null) {
        val t = tDec.next()
        if (t < minTs) minTs = t
        if (t > maxTs) maxTs = t
      }
      val v = vDec.next()
      if (v != v) sawNaN = true
      else {
        sawNonNaN = true
        if (v < minV) minV = v
        if (v > maxV) maxV = v
      }
      sum += v
      if (hasFixed) {
        val c = if (fixedAnsi) halfUpFixedAnsi(v * fixedScale) else halfUpFixed(v * fixedScale)
        sumFixed += c
        sumSqFixed += c * c
      }
      i += 1
    }
    if (sawNaN) { maxV = Double.NaN; if (!sawNonNaN) minV = Double.NaN }
    if (tDec == null) { minTs = 0L; maxTs = 0L }
    ChunkAgg(h.n.toLong, minTs, maxTs, minV, maxV, sum, sumFixed, sumSqFixed)
  }

  /** Range aggregate over one compressed chunk: only points with
    * fromSec <= ts <= toSec contribute. `sumFixed` accumulates
    * round(v * fixedScale) as a long — fixed-point sums are
    * order-independent, so they stay exact when chunk partials are
    * re-aggregated across a shuffle (double sums would not).
    * Value-only chunks carry no timestamps; their points count only
    * when 0 ∈ [fromSec, toSec] (decoded ts of a value-only chunk is 0). */
  final case class RangeAgg(n: Long, minTs: Long, maxTs: Long,
                            minV: Double, maxV: Double, sumFixed: Long,
                            sumSqFixed: Long)

  def aggregateRange(bytes: Array[Byte], fromSec: Long, toSec: Long,
                     fixedScale: Double = 100.0): RangeAgg = {
    val h = readHeader(bytes)
    val r = reader(bytes, h)
    val lt = h.variant == VariantLeadTrail
    val tDec = if (h.valueOnly) null else new TimestampCodec.Decoder(h.headerTime, r)
    val vDec = new XorDoubleCodec.Decoder(r, lt)
    var i = 0
    var n = 0L
    var minTs = Long.MaxValue; var maxTs = Long.MinValue
    var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
    var sumFixed = 0L
    var sumSqFixed = 0L
    while (i < h.n) {
      val t = if (tDec != null) tDec.next() else 0L
      val v = vDec.next()
      if (t >= fromSec && t <= toSec) {
        n += 1
        if (t < minTs) minTs = t
        if (t > maxTs) maxTs = t
        if (v < minV) minV = v
        if (v > maxV) maxV = v
        // HALF_UP like Spark round()/DuckDB round() on the shortest
        // decimal repr (see halfUpFixed); c and c² partials are exact
        // integers, order-independent across chunk re-aggregation
        val c = halfUpFixed(v * fixedScale)
        sumFixed += c
        sumSqFixed += c * c
      }
      i += 1
    }
    if (n == 0) RangeAgg(0L, 0L, 0L, 0.0, 0.0, 0L, 0L)
    else RangeAgg(n, minTs, maxTs, minV, maxV, sumFixed, sumSqFixed)
  }
}
