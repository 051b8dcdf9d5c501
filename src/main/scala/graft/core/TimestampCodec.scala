package graft.core

/**
 * Delta-of-delta timestamp compression (Gorilla §4.1).
 *
 * Wire format (reference: src/timestamp_stream.rs:30-66):
 *  - first timestamp: 14-bit delta from a window-aligned header time
 *  - then per point, dod = delta - prevDelta:
 *      dod == 0              -> '0'
 *      dod in [-63, 64]      -> '10'   + 7  bits of (dod + 63)
 *      dod in [-255, 256]    -> '110'  + 9  bits of (dod + 255)
 *      dod in [-2047, 2048]  -> '1110' + 12 bits of (dod + 2047)
 *      otherwise             -> '1111' + 32 bits of dod (two's complement)
 *
 * Deviation from the reference: the 32-bit escape is sign-extended on
 * decode (the reference reads it unsigned, which mis-decodes negative
 * dods beyond +/-2048; reference src/timestamp_stream.rs:104-109).
 */
object TimestampCodec {
  /** Max first-delta representable: 14 bits => < 16384 s (> 4 h). */
  final val MaxHeaderDelta: Long = (1L << 14) - 1L

  final class Encoder(headerTime: Long, w: BitWriter) {
    private var started = false
    private var prev = 0L
    private var prevDelta = 0L

    def push(t: Long): Unit = {
      if (!started) {
        val d = t - headerTime
        require(d >= 0 && d <= MaxHeaderDelta,
          s"first timestamp $t out of header window [$headerTime, ${headerTime + MaxHeaderDelta}]")
        w.write(d, 14)
        prev = t; prevDelta = d; started = true
      } else {
        val delta = t - prev
        val dod = delta - prevDelta
        // control code + payload fused into ONE write each: same wire
        // bits, half the BitWriter calls on the encode hot path
        if (dod == 0L) w.write(0L, 1)
        else if (dod >= -63 && dod <= 64) w.write((0x2L << 7) | (dod + 63), 9)
        else if (dod >= -255 && dod <= 256) w.write((0x6L << 9) | (dod + 255), 12)
        else if (dod >= -2047 && dod <= 2048) w.write((0xEL << 12) | (dod + 2047), 16)
        else {
          require(dod >= Int.MinValue && dod <= Int.MaxValue, s"delta-of-delta overflow: $dod")
          w.write((0xFL << 32) | (dod & 0xFFFFFFFFL), 36)
        }
        prev = t; prevDelta = delta
      }
    }
  }

  final class Decoder(headerTime: Long, r: BitReader) {
    private var started = false
    private var value = 0L
    private var delta = 0L

    /** Decode the next timestamp; stream must be well-formed. */
    def next(): Long = {
      if (!started) {
        delta = r.read(14)
        value = headerTime + delta
        started = true
      } else {
        if (r.read(1) != 0L) {
          val dod =
            if (r.read(1) == 0L) r.read(7) - 63L
            else if (r.read(1) == 0L) r.read(9) - 255L
            else if (r.read(1) == 0L) r.read(12) - 2047L
            else (r.read(32) << 32) >> 32 // sign-extend
          delta += dod
        }
        value += delta
      }
      value
    }

    /** Bits needed to attempt another decode (conservative lower bound). */
    def hasNext: Boolean = if (!started) r.remaining >= 14 else r.remaining >= 1
  }
}
