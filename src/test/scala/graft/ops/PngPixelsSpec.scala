package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class PngPixelsSpec extends AnyFunSuite {

  private def randomPixels(w: Int, h: Int, ch: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val px = new Array[Byte](w * h * ch)
    rnd.nextBytes(px)
    px
  }

  test("pixel roundtrip: every filter type, RGB and RGBA") {
    for (ch <- Seq(3, 4); ft <- 0 to 4) {
      val (w, h) = (17, 9) // odd sizes: stride not a multiple of anything
      val px = randomPixels(w, h, ch, seed = ch * 100 + ft)
      val blob = PngPixels.encode(w, h, ch, px, _ => ft)
      val img = PngPixels.decode(blob).getOrElse(fail(s"decode failed ch=$ch ft=$ft"))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.toSeq == px.toSeq, s"pixels differ for ch=$ch filter=$ft")
    }
  }

  test("pixel roundtrip: mixed filters per scanline (the fixture shape)") {
    val (w, h, ch) = (48, 31, 3)
    val px = randomPixels(w, h, ch, seed = 7)
    val blob = PngPixels.encode(w, h, ch, px, y => (y * 3 + 1) % 5)
    val img = PngPixels.decode(blob).get
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("property: encode/decode identity over random sizes, filters, content") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      ch <- Gen.oneOf(3, 4)
      seed <- Gen.choose(0L, Long.MaxValue)
      fseed <- Gen.choose(0, 4)
    } yield (w, h, ch, seed, fseed)
    val prop = Prop.forAll(gen) { case (w, h, ch, seed, fseed) =>
      val px = randomPixels(w, h, ch, seed)
      val img = PngPixels.decode(
        PngPixels.encode(w, h, ch, px, y => (y + fseed) % 5)).get
      img.width == w && img.height == h && img.pixels.toSeq == px.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("decoder rejects garbage, truncation, and unsupported shapes without crashing") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(junk)
      PngPixels.decode(junk) // must not throw
    }
    val good = PngPixels.encode(8, 8, 3, randomPixels(8, 8, 3, 1))
    // cuts inside the signature/IHDR and mid-IDAT must fail; a cut
    // that only drops IEND leaves a complete zlib stream and may
    // legitimately still decode (CRCs are not verified by design)
    for (cut <- Seq(10, 30, good.length / 2)) {
      assert(PngPixels.decode(good.take(cut)).isEmpty, s"truncated at $cut decoded")
    }
    // corrupt the IDAT payload: inflate must fail cleanly
    val bad = good.clone()
    bad(45) = (bad(45) ^ 0x55).toByte
    PngPixels.decode(bad) // None or garbage-free failure, never a throw
    // header-only fixture (no IDAT) is not a pixel image
    assert(PngPixels.decode(ImageHeader.pngBytes(5, 5)).isEmpty)
    // grayscale (color type 0) is declared out of coverage
    val gray = good.clone()
    gray(25) = 0
    assert(PngPixels.decode(gray).isEmpty)
  }

  test("the synthetic fixture's sums match the closed-form formula") {
    // one hand-checked digest: sums from real decode == arithmetic form
    val d = Array.tabulate[Byte](16)(i => ((i * 37 + 11) & 0xFF).toByte)
    val (b0, b1, b2, b3) = (d(0) & 0xFF, d(1) & 0xFF, d(2) & 0xFF, d(3) & 0xFF)
    val w = (d(4) & 0xFF) % 48 + 4
    val h = (d(5) & 0xFF) % 48 + 4
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = ((b0 + x) % 256).toByte
      px(o + 1) = ((b1 + y) % 256).toByte
      px(o + 2) = ((b2 + x + y) % 256).toByte
    }
    val img = PngPixels.decode(PngPixels.encode(w, h, 3, px, y => (b3 + y) % 5)).get
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (i <- 0 until w * h) {
      sr += img.pixels(i * 3) & 0xFF
      sg += img.pixels(i * 3 + 1) & 0xFF
      sb += img.pixels(i * 3 + 2) & 0xFF
    }
    val expR = h.toLong * (0 until w).map(x => (b0 + x) % 256).sum
    val expG = w.toLong * (0 until h).map(y => (b1 + y) % 256).sum
    val expB = (for (x <- 0 until w; y <- 0 until h) yield (b2 + x + y) % 256).map(_.toLong).sum
    assert((sr, sg, sb) == (expR, expG, expB))
  }
}
