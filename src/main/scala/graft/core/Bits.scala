package graft.core

/**
 * Bit-level packing into a growable `Array[Long]`, most-significant-bit
 * first within each 64-bit word.
 *
 * Same wire layout as the reference's bit vector (reference:
 * src/vec_stream.rs:5-57) but implemented position-arithmetically: a
 * single running bit cursor instead of per-word used-bit bookkeeping.
 */
final class BitWriter(initialWords: Int = 8) {
  private var buf = new Array[Long](math.max(initialWords, 2))
  private var pos = 0L // bits written so far

  /** Append the `count` least-significant bits of `value`
    * (0 <= count <= 64; out-of-range counts are a caller bug — the
    * codecs only emit fixed field widths, so no per-call validation). */
  def write(value: Long, count: Int): Unit = {
    if (count == 0) return
    val v = if (count == 64) value else value & ((1L << count) - 1L)
    val idx = (pos >>> 6).toInt
    val off = (pos & 63L).toInt
    if (idx + 1 >= buf.length) grow(idx + 2)
    val free = 64 - off
    if (count <= free) {
      buf(idx) |= (v << (free - count))
    } else {
      val spill = count - free // 1..63
      buf(idx) |= (v >>> spill)
      buf(idx + 1) |= (v << (64 - spill))
    }
    pos += count
  }

  private def grow(min: Int): Unit = {
    var n = buf.length
    while (n < min) n *= 2
    buf = java.util.Arrays.copyOf(buf, n)
  }

  def bitLength: Long = pos

  /** Words actually containing data (trailing bits zero-padded). */
  def toWords: Array[Long] =
    java.util.Arrays.copyOf(buf, (((pos + 63L) >>> 6)).toInt)
}

/**
 * Bit-level reader over words produced by [[BitWriter]].
 * Reads are bounds-checked against `bitLength` via [[remaining]].
 */
final class BitReader(words: Array[Long], bitLength: Long) {
  private var pos = 0L

  def remaining: Long = bitLength - pos

  /** Read `count` bits (1..64) as an unsigned value in the low bits.
    * Caller must ensure `remaining >= count`. */
  def read(count: Int): Long = {
    val idx = (pos >>> 6).toInt
    val off = (pos & 63L).toInt
    pos += count
    val avail = 64 - off
    if (count <= avail) {
      val shifted = words(idx) >>> (avail - count) // avail-count in 0..63
      if (count == 64) shifted else shifted & ((1L << count) - 1L)
    } else {
      val spill = count - avail // 1..63
      val hi = words(idx) & (if (avail == 64) -1L else (1L << avail) - 1L)
      (hi << spill) | (words(idx + 1) >>> (64 - spill))
    }
  }
}
