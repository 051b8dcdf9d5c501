package graft.core

import java.lang.Double.{doubleToRawLongBits, longBitsToDouble}
import java.lang.Long.{numberOfLeadingZeros => nlz, numberOfTrailingZeros => ntz}

/**
 * XOR compression of IEEE-754 doubles (Gorilla §4.1.2).
 *
 * Wire format (reference: src/double_stream.rs:36-86):
 *  - first value: 64 raw bits
 *  - then per value, x = prevBits ^ bits:
 *      x == 0                      -> '0'
 *      x fits prev window          -> '10' + meaningful bits of x in the
 *                                     previous XOR's (lz, tz) window
 *      otherwise                   -> '11' + 5-bit lz (capped at 31)
 *                                     + 6-bit (meaningfulCount - 1)
 *                                     + meaningful bits
 *
 * Two window policies, selected by `leadTrail`:
 *  - false: the window is recomputed from the previous *XOR value*
 *    each step, so it can shrink as XORs gain zeros (reference
 *    src/double_stream.rs "[XORORLEADING]")
 *  - true:  the (lz, meaningfulCount) window persists until an
 *    explicit '11' control rewrites it; an x == 0 repeat keeps it
 *    (reference src/double_stream_lead_trail.rs:44-107)
 *
 * Both policies share one implementation here: the state carries
 * (windowLz, windowMeaningful); the shrinking variant simply refreshes
 * that pair from each emitted XOR.
 */
object XorDoubleCodec {
  final class Encoder(w: BitWriter, leadTrail: Boolean = false) {
    private var started = false
    private var prevBits = 0L
    private var winLz = 64 // forces a new window on the 2nd value
    private var winMeaningful = 0

    def push(v: Double): Unit = {
      val bits = doubleToRawLongBits(v)
      if (!started) {
        w.write(bits, 64)
        prevBits = bits
        started = true
        if (!leadTrail) { // shrinking variant seeds the window from value itself
          winLz = nlz(bits); winMeaningful = if (winLz == 64) 0 else 64 - winLz - ntz(bits)
        }
      } else {
        val x = prevBits ^ bits
        if (x == 0L) {
          w.write(0L, 1)
          if (!leadTrail) { winLz = 64; winMeaningful = 0 } // window degrades to the zero XOR
        } else {
          val lz = math.min(nlz(x), 31)
          val tz = ntz(x)
          val winTz = 64 - winLz - winMeaningful
          if (winLz < 64 && lz >= winLz && tz >= winTz) {
            // '10' + payload fused when they fit one word (window width
            // <= 62); a full-width window keeps the two-write form
            val width = 64 - winTz - winLz
            if (width <= 62) w.write((0x2L << width) | (x >>> winTz), width + 2)
            else { w.write(0x2L, 2); w.write(x >>> winTz, width) }
          } else {
            val meaningful = 64 - tz - lz
            // '11' + 5-bit lz + 6-bit (meaningful-1), fused with the
            // payload too when all 13+meaningful bits fit one word
            val ctl = (0x3L << 11) | (lz.toLong << 6) | (meaningful - 1).toLong
            if (meaningful <= 51) w.write((ctl << meaningful) | (x >>> tz), 13 + meaningful)
            else { w.write(ctl, 13); w.write(x >>> tz, meaningful) }
            if (leadTrail) { winLz = lz; winMeaningful = meaningful }
          }
          if (!leadTrail) { winLz = nlz(x); winMeaningful = 64 - nlz(x) - ntz(x) }
        }
        prevBits = bits
      }
    }
  }

  final class Decoder(r: BitReader, leadTrail: Boolean = false) {
    private var started = false
    private var bits = 0L
    private var winLz = 64
    private var winMeaningful = 0

    def next(): Double = {
      if (!started) {
        bits = r.read(64)
        started = true
        if (!leadTrail) {
          winLz = nlz(bits); winMeaningful = if (winLz == 64) 0 else 64 - winLz - ntz(bits)
        }
      } else if (r.read(1) != 0L) {
        val x =
          if (r.read(1) == 0L) { // reuse window
            val winTz = 64 - winLz - winMeaningful
            r.read(64 - winTz - winLz) << winTz
          } else { // new window
            val lz = r.read(5).toInt
            val meaningful = r.read(6).toInt + 1
            val tz = 64 - meaningful - lz
            if (leadTrail) { winLz = lz; winMeaningful = meaningful }
            r.read(meaningful) << tz
          }
        bits ^= x
        if (!leadTrail) { winLz = nlz(x); winMeaningful = if (x == 0L) 0 else 64 - nlz(x) - ntz(x) }
      } else if (!leadTrail) { winLz = 64; winMeaningful = 0 }
      longBitsToDouble(bits)
    }

    def hasNext: Boolean = if (!started) r.remaining >= 64 else r.remaining >= 1
  }
}
