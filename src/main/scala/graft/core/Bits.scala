package graft.core

/**
 * Bit-level packing into a growable `Array[Long]`, most-significant-bit
 * first within each 64-bit word.
 *
 * Same wire layout as the reference's bit vector (reference:
 * src/vec_stream.rs:5-57) but implemented around a single in-register
 * accumulator word: bits land in `acc` and spill to the array only
 * when a word fills. The hot path (a sub-word append) is two shifts,
 * an OR and an add — no array read-modify-write, no long division,
 * and the grow check runs once per 64 bits instead of once per call.
 */
final class BitWriter(initialWords: Int = 8) {
  private var buf = new Array[Long](math.max(initialWords, 2))
  private var nWords = 0 // full words spilled into buf
  private var acc = 0L   // partial word, bits packed from the MSB down
  private var accBits = 0 // bits used in acc (0..63)

  /** Append the `count` least-significant bits of `value`
    * (0 <= count <= 64; out-of-range counts are a caller bug — the
    * codecs only emit fixed field widths, so no per-call validation). */
  def write(value: Long, count: Int): Unit = {
    if (count == 0) return
    val v = if (count == 64) value else value & ((1L << count) - 1L)
    val free = 64 - accBits
    if (count < free) {
      acc |= v << (free - count)
      accBits += count
    } else if (count == free) {
      spill(acc | v)
      acc = 0L; accBits = 0
    } else {
      val over = count - free // 1..63
      spill(acc | (v >>> over))
      acc = v << (64 - over)
      accBits = over
    }
  }

  private def spill(word: Long): Unit = {
    if (nWords == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
    buf(nWords) = word
    nWords += 1
  }

  def bitLength: Long = nWords.toLong * 64 + accBits

  /** Words actually containing data (trailing bits zero-padded).
    * Non-destructive: the writer stays appendable. */
  def toWords: Array[Long] = {
    val total = nWords + (if (accBits > 0) 1 else 0)
    val out = java.util.Arrays.copyOf(buf, total)
    if (accBits > 0) out(nWords) = acc
    out
  }
}

/**
 * Bit-level reader over words produced by [[BitWriter]].
 * Reads are bounds-checked against `bitLength` via [[remaining]].
 * Mirrors the writer's accumulator design: the current word's
 * unconsumed bits sit left-aligned in `cur`, so the common sub-word
 * read (and especially the 1-bit control-code read) touches no array.
 */
final class BitReader(words: Array[Long], bitLength: Long) {
  private var pos = 0L  // bits consumed, for remaining
  private var widx = 0  // next word to load
  private var cur = 0L  // unconsumed bits of the current word, MSB first
  private var curBits = 0

  def remaining: Long = bitLength - pos

  /** Read `count` bits (1..64) as an unsigned value in the low bits.
    * Caller must ensure `remaining >= count`. */
  def read(count: Int): Long = {
    pos += count
    if (count <= curBits) {
      // count in 1..64 here, and 64 only when curBits == 64 => shift 0
      val r = cur >>> (64 - count)
      cur <<= count // count == 64 leaves garbage, but curBits hits 0 and
      curBits -= count // the refill path below ignores cur when empty
      r
    } else {
      val have = curBits // 0..63
      val hi = if (have == 0) 0L else cur >>> (64 - have)
      val need = count - have // 1..64
      val w = words(widx); widx += 1
      if (need == 64) { // only when have == 0 and count == 64
        cur = 0L; curBits = 0
        w
      } else {
        cur = w << need
        curBits = 64 - need
        (hi << need) | (w >>> (64 - need))
      }
    }
  }
}
