package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Bloom filter over pre-hashed 64-bit keys: the broadcastable
 * set-membership sketch behind `decontaminateBloom`'s prefilter. The
 * caller hashes items with the engine's codegen'd `xxhash64`, so the
 * sketch itself never touches strings — insert and probe are pure
 * integer ops.
 *
 * Wire format (self-describing, so `bloom_might_contain` needs no
 * side-channel parameters): [int numBits][int numHashes][64-bit words,
 * big-endian]. Probe positions use Kirsch–Mitzenmacher double hashing
 * g_i = h1 + i·h2 with h2 an odd splitmix64 remix of the input — two
 * independent 64-bit streams from one hash, the standard construction.
 *
 * Zero false negatives by construction (the exactness the
 * decontamination oracle relies on); false-positive rate is a sizing
 * choice ([[BloomUtil.size]]), pinned statistically in OpsSpec.
 */
object BloomUtil {
  /** (numBits, numHashes) for `n` expected items at false-positive
    * rate `fpp`: m = −n·ln p / ln²2 bits, k = m/n·ln 2 probes, with
    * floors so degenerate inputs (empty bench set) stay valid and a
    * cap so a mis-sized call cannot allocate gigabytes (256 MiB max —
    * past that the caller should shard the filter). */
  def size(n: Long, fpp: Double): (Int, Int) = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val n1 = math.max(1L, n)
    val ln2 = math.log(2.0)
    val m = math.ceil(-n1.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val bits = math.min(math.max(64L, m), (1L << 31) - 64).toInt
    val k = math.max(1L, math.round(bits.toDouble / n1.toDouble * ln2))
    (bits, math.min(k, 16L).toInt)
  }

  /** splitmix64 finalizer (public-domain mixer), forced odd so the
    * double-hash stride cycles the whole bit space. */
  def mixOdd(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^= z >>> 31
    z | 1L
  }

  def insert(words: Array[Long], numBits: Int, numHashes: Int, hash: Long): Unit = {
    val h2 = mixOdd(hash)
    var g = hash
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(g, numBits.toLong).toInt
      words(idx >>> 6) |= 1L << (idx & 63)
      g += h2
      i += 1
    }
  }

  /** Probe a SERIALIZED filter (the broadcast form) — reads the header
    * per call (two int loads) and tests bits straight off the byte
    * array, no word materialization. */
  def contains(bytes: Array[Byte], hash: Long): Boolean = {
    val numBits = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val numHashes = ((bytes(4) & 0xff) << 24) | ((bytes(5) & 0xff) << 16) |
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val h2 = mixOdd(hash)
    var g = hash
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(g, numBits.toLong).toInt
      val bit = idx & 63
      // words are big-endian longs: bit b of word w lives in byte
      // 7 − b/8 at in-byte position b%8
      val b = bytes(8 + (idx >>> 6) * 8 + 7 - (bit >>> 3))
      if (((b >>> (bit & 7)) & 1) == 0) return false
      g += h2
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = ByteBuffer.wrap(bytes)
    val numBits = bb.getInt()
    val numHashes = bb.getInt()
    val words = new Array[Long]((bytes.length - 8) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (words, numBits, numHashes)
  }
}

/**
 * bloom_agg(hash long, numBits, numHashes) -> binary: mergeable Bloom
 * filter aggregate. Partials are fixed-size bit arrays that merge by
 * OR — map-side combine works, merge order is irrelevant, and the
 * one-row result broadcasts to prefilter a corpus-sized scan.
 */
case class BloomFilterAgg(child: Expression, numBits: Int, numHashes: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits <= Int.MaxValue - 64,
    s"bloom_agg: numBits out of range: $numBits")
  require(numHashes >= 1 && numHashes <= 32, s"bloom_agg: numHashes out of range: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, LongType, s"$prettyName arg 1")
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits + 63) >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.insert(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.serialize(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomUtil.deserialize(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** bloom_might_contain(bloom binary, hash long) -> boolean. False ⇒
  * definitely absent (the prefilter's soundness); true ⇒ verify
  * exactly downstream. */
case class BloomMightContain(bloom: Expression, hash: Expression)
    extends BinaryExpression {
  override def left: Expression = bloom
  override def right: Expression = hash
  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GorillaExprs.expect(bloom, BinaryType, s"$prettyName arg 1")
    if (r.isFailure) r else GorillaExprs.expect(hash, LongType, s"$prettyName arg 2")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  protected override def nullSafeEval(bf: Any, h: Any): Any =
    BloomUtil.contains(bf.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.functions.BloomUtil.contains($b, $h)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(bloom = l, hash = r)
}
