package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash properties: container independence, robustness to
  * small pixel edits, separation of unrelated images, and exactness
  * of the banded blocking that finds near-dup pairs. */
class PHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("phash is a property of the pixels, not the container or encoding") {
    val (w, h) = (40, 28)
    // 4-px blocks keep the distinct-color count under one GIF palette
    // while leaving a real 2-D structure for the DCT
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = ((57 + (x / 4) * 23) % 256).toByte
      px(o + 1) = ((171 + (y / 4) * 41) % 256).toByte
      px(o + 2) = ((9 + (x / 4) * 13 + (y / 4) * 29) % 256).toByte
    }
    val viaPngF0 = PngPixels.decode(PngPixels.encode(w, h, 3, px, _ => 0)).get
    val viaPngF4 = PngPixels.decode(PngPixels.encode(w, h, 3, px, y => y % 5)).get
    val viaBmp = BmpPixels.decode(BmpPixels.encode(w, h, px)).get
    // GIF leg: palette-index the exact colors (the gradient uses
    // < 256 distinct RGB triples at this size) so the LZW round-trip
    // reproduces the pixels bit-for-bit
    val colors = px.grouped(3).map(_.toSeq).toSeq.distinct
    assert(colors.size <= 256, "fixture must fit one GIF palette")
    val lookup = colors.zipWithIndex.toMap
    val palette = new Array[Byte](256 * 3)
    colors.zipWithIndex.foreach { case (c, i) =>
      palette(i * 3) = c(0); palette(i * 3 + 1) = c(1); palette(i * 3 + 2) = c(2)
    }
    val indices = px.grouped(3).map(c => lookup(c.toSeq).toByte).toArray
    val viaGif = GifPixels.decode(GifPixels.encode(w, h, palette, indices)).get
    val hashes = Seq(viaPngF0, viaPngF4, viaBmp, viaGif).map(PHash.phash)
    assert(hashes.distinct.size == 1,
      "same pixels must hash identically through PNG (two filter plans), BMP, and GIF")
  }

  /** Textured pixels (dense DCT spectrum, like a real photo). A pure
    * gradient would be pathological here: its AC coefficients are all
    * ≈ 0, so every bit sits on the median knife-edge and tiny edits
    * flip many bits — a documented pHash caveat, not a bug. */
  private def textured(w: Int, h: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val m = graft.functions.TextHash.splitmix64(seed + x * 31L + y * 17L + c * 7L)
      px((y * w + x) * 3 + c) = (m & 0xFF).toByte
    }
    px
  }

  test("phash: small edits stay near, unrelated images land far") {
    val (w, h) = (48, 48)
    val base = textured(w, h, 10L)
    val h0 = PHash.phash(PngPixels.Image(w, h, 3, base))
    // a handful of single-pixel edits: perceptually the same image
    val tweaked = base.clone()
    for (i <- Seq(0, 301, 902, 2203)) tweaked(i) = (tweaked(i) + 9).toByte
    val h1 = PHash.phash(PngPixels.Image(w, h, 3, tweaked))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 8)
    // inverted image: perceptually opposite, far in hamming space
    val inverted = base.map(b => (~b).toByte)
    val h2 = PHash.phash(PngPixels.Image(w, h, 3, inverted))
    assert(java.lang.Long.bitCount(h0 ^ h2) > 16)
  }

  test("audio fingerprint: amplitude-invariant, noise-robust, distinct clips far") {
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate[Short](4000)(i =>
      ((Math.sin(i * 0.05) * 8000 + Math.sin(i * 0.31) * 3000 +
        rnd.nextInt(800) - 400)).toShort)
    val h0 = AudioFp.fingerprint(base, 1)
    // half the volume: every band energy scales equally, signs hold
    val quiet = base.map(s => (s / 2).toShort)
    assert(AudioFp.fingerprint(quiet, 1) == h0)
    // small additive noise: most sign bits survive
    val noisy = base.map(s => (s + rnd.nextInt(200) - 100).toShort)
    assert(java.lang.Long.bitCount(h0 ^ AudioFp.fingerprint(noisy, 1)) <= 8)
    // a different clip lands far
    val other = Array.tabulate[Short](4000)(i =>
      ((Math.sin(i * 0.013) * 9000 + Math.sin(i * 0.21) * 2000)).toShort)
    assert(java.lang.Long.bitCount(h0 ^ AudioFp.fingerprint(other, 1)) > 16)
    // stereo interleave of the same mono signal fingerprints identically
    val stereo = new Array[Short](base.length * 2)
    for (i <- base.indices) { stereo(2 * i) = base(i); stereo(2 * i + 1) = base(i) }
    assert(AudioFp.fingerprint(stereo, 2) == h0)
  }

  test("image near-dup blocking equals brute hamming pairs (exact at dist <= 6)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ph = Multimodal.imagePhash(
        Multimodal.syntheticPixelMedia(docs, "doc_id", "text"))
      .select(col("media_id").as("id"), col("phash").as("simhash"))
      .persist()
    val blocked = Dedup.simhashPairsSigs(ph, maxDist = 6)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = ph.toDF("a_id", "ha")
    val brute = p.join(ph.toDF("b_id", "hb"), col("a_id") < col("b_id"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 6)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty, "the synthetic corpus should contain image near-dups")
    ph.unpersist()
  }
}
