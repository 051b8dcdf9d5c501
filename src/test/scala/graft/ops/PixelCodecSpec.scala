package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pure-JVM pixel codecs (BMP row-flip/BGR, GIF LZW) pinned three ways:
 * self-roundtrip, our-encoder → javax.imageio (proves the bit streams
 * are spec-canonical, not merely self-consistent), and javax.imageio
 * encoder → our decoder (proves the decoder handles a mainstream
 * encoder's width schedule and clear handling, not just ours).
 */
class PixelCodecSpec extends AnyFunSuite {

  private def rgbPixels(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val px = new Array[Byte](w * h * 3)
    rnd.nextBytes(px)
    px
  }

  private def imageIoPixels(blob: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "ImageIO failed to parse the blob")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        out(o) = ((argb >> 16) & 0xFF).toByte
        out(o + 1) = ((argb >> 8) & 0xFF).toByte
        out(o + 2) = (argb & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  test("bmp: encode/decode round-trip across odd widths (row padding)") {
    for ((w, h) <- Seq((1, 1), (3, 5), (4, 4), (5, 3), (47, 13), (64, 64))) {
      val px = rgbPixels(w, h, w * 1000 + h)
      val img = BmpPixels.decode(BmpPixels.encode(w, h, px))
      assert(img.isDefined, s"decode failed at ${w}x$h")
      assert(img.get.width == w && img.get.height == h && img.get.channels == 3)
      assert(java.util.Arrays.equals(img.get.pixels, px), s"pixels differ at ${w}x$h")
    }
  }

  test("bmp: our encoder is canonical (ImageIO reads it bit-for-bit)") {
    val (w, h) = (23, 9)
    val px = rgbPixels(w, h, 42)
    val (iw, ih, ipx) = imageIoPixels(BmpPixels.encode(w, h, px))
    assert((iw, ih) == (w, h))
    assert(java.util.Arrays.equals(ipx, px))
  }

  test("bmp: truncated and exotic headers are rejected, not misread") {
    val good = BmpPixels.encode(4, 4, rgbPixels(4, 4, 1))
    assert(BmpPixels.decode(good.take(40)).isEmpty)
    val rle = good.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(BmpPixels.decode(rle).isEmpty)
    val bpp = good.clone(); bpp(28) = 8 // 8-bit palette
    assert(BmpPixels.decode(bpp).isEmpty)
    // width*3 wraps Int at width > 715M: a wrapped-negative row stride
    // must not slip past the size check into a throwing allocation
    val wide = good.clone()
    val bb = java.nio.ByteBuffer.wrap(wide).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x40000000) // width = 2^30
    assert(BmpPixels.decode(wide).isEmpty)
  }

  test("gif: garbage, truncation, and overflow headers decline cleanly") {
    val (_, _, good) = gifFixture(16, 16, 5)
    // every truncation prefix: a cut inside the pixel data must
    // decline; a cut that only loses the terminator/trailer may still
    // decode (all LZW codes present) but must be well-formed — and no
    // prefix may ever throw
    for (cut <- 0 until good.length) {
      val r = GifPixels.decode(good.take(cut))
      if (cut < 13 + 256 * 3 + 11) // inside header/palette/descriptor
        assert(r.isEmpty, s"truncated at $cut decoded")
      else r.foreach(img => assert(img.width == 16 && img.height == 16 &&
        img.pixels.length == 16 * 16 * 3))
    }
    // random garbage, and garbage behind a valid magic
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val junk = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(junk)
      GifPixels.decode(junk) // must not throw; None or not is unspecified
      val magic = ("GIF89a".getBytes("US-ASCII") ++ junk)
      GifPixels.decode(magic)
    }
    // 65535x65535 claimed dims: width*height*3 wraps Int — a crafted
    // ~30-byte header must decline, not NegativeArraySizeException
    val huge = good.clone()
    val desc = 13 + 256 * 3 // image descriptor offset in this fixture layout
    assert(huge(desc) == 0x2C)
    for (i <- desc + 5 to desc + 8) huge(i) = 0xFF.toByte
    assert(GifPixels.decode(huge).isEmpty)
    // corrupt LZW payload: flip bytes inside the data sub-blocks
    val bad = good.clone()
    for (i <- bad.length - 12 until bad.length - 2) bad(i) = (bad(i) ^ 0x5A).toByte
    GifPixels.decode(bad) // None or wrong pixels, never a throw
  }

  private def gifFixture(w: Int, h: Int, seed: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    val palette = new Array[Byte](256 * 3)
    rnd.nextBytes(palette)
    val idx = new Array[Byte](w * h)
    rnd.nextBytes(idx)
    (palette, idx, GifPixels.encode(w, h, palette, idx))
  }

  private def resolve(palette: Array[Byte], idx: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](idx.length * 3)
    var i = 0
    while (i < idx.length) {
      val p = (idx(i) & 0xFF) * 3
      out(i * 3) = palette(p); out(i * 3 + 1) = palette(p + 1)
      out(i * 3 + 2) = palette(p + 2)
      i += 1
    }
    out
  }

  test("gif: LZW round-trip on noise (dictionary fills and resets) and runs (KwKwK)") {
    // noise at 200x200 pushes the dictionary past 4096 -> clear+reset path
    for ((w, h) <- Seq((1, 1), (7, 3), (48, 48), (200, 200))) {
      val (palette, idx, blob) = gifFixture(w, h, w + h)
      val img = GifPixels.decode(blob)
      assert(img.isDefined, s"decode failed at ${w}x$h")
      assert(img.get.width == w && img.get.height == h)
      assert(java.util.Arrays.equals(img.get.pixels, resolve(palette, idx)),
        s"pixels differ at ${w}x$h")
    }
    // constant and two-symbol runs drive the KwKwK (code == nextCode) branch
    for (pattern <- Seq(Array.fill(500)(7.toByte),
        Array.tabulate(500)(i => (i % 2).toByte),
        Array.tabulate(2000)(i => (i / 37 % 256).toByte))) {
      val palette = Array.tabulate(768)(i => (i % 251).toByte)
      val blob = GifPixels.encode(pattern.length, 1, palette, pattern)
      val img = GifPixels.decode(blob)
      assert(img.isDefined)
      assert(java.util.Arrays.equals(img.get.pixels, resolve(palette, pattern)))
    }
  }

  test("gif: our encoder is canonical (ImageIO decodes every pixel)") {
    for ((w, h) <- Seq((5, 5), (31, 17), (200, 200))) {
      val (palette, idx, blob) = gifFixture(w, h, 9 * w + h)
      val (iw, ih, ipx) = imageIoPixels(blob)
      assert((iw, ih) == (w, h))
      assert(java.util.Arrays.equals(ipx, resolve(palette, idx)), s"ImageIO differs at ${w}x$h")
    }
  }

  test("gif: our decoder reads a mainstream encoder's stream (ImageIO-written)") {
    val (w, h) = (83, 59)
    val px = rgbPixels(w, h, 5).map(b => (b & 0xE0).toByte) // coarse palette helps GIF
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        buf.setRGB(x, y, ((px(o) & 0xFF) << 16) | ((px(o + 1) & 0xFF) << 8) | (px(o + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "gif", bos), "JVM has no gif writer?")
    val blob = bos.toByteArray
    val ours = GifPixels.decode(blob)
    assert(ours.isDefined, "our decoder rejected an ImageIO gif")
    val (iw, ih, ipx) = imageIoPixels(blob) // ImageIO's own read = ground truth
    assert(ours.get.width == iw && ours.get.height == ih)
    assert(java.util.Arrays.equals(ours.get.pixels, ipx),
      "our decode differs from ImageIO's decode of the same stream")
  }

  test("pixel dispatch routes by magic bytes, not by luck") {
    val bmp = BmpPixels.encode(4, 3, rgbPixels(4, 3, 2))
    val (_, _, gif) = gifFixture(6, 2, 3)
    assert(Multimodal.decodePixels(bmp).exists(i => i.width == 4 && i.height == 3))
    assert(Multimodal.decodePixels(gif).exists(i => i.width == 6 && i.height == 2))
    assert(Multimodal.decodePixels("junk".getBytes).isEmpty)
  }
}
