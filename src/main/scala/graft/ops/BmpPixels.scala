package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Pure-JVM BMP pixel codec — real content decode for the most common
 * training-data BMP shape: Windows BITMAPINFOHEADER (40 bytes),
 * 24-bit uncompressed BI_RGB. Rows are stored bottom-up in BGR order
 * and padded to 4-byte boundaries; the decoder flips both so callers
 * always see top-down RGB (the same [[PngPixels.Image]] layout).
 * Anything else (palettes, RLE, 16/32-bit, top-down negative heights)
 * returns None — honest partial coverage, extensible per format flag.
 */
object BmpPixels {

  /** Full pixel decode. None when not a BMP this codec covers. */
  def decode(blob: Array[Byte]): Option[PngPixels.Image] = {
    if (blob.length < 54 || blob(0) != 'B' || blob(1) != 'M') return None
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val headerSize = bb.getInt(14)
    if (headerSize != 40) return None // BITMAPINFOHEADER only
    val width = bb.getInt(18)
    val height = bb.getInt(22) // positive = bottom-up (the common case)
    val planes = bb.getShort(26)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    if (width <= 0 || height <= 0 || planes != 1 || bpp != 24 || compression != 0)
      return None
    // long arithmetic end-to-end: width is attacker-controlled getInt,
    // so width*3 wraps Int for width > 715M and a wrapped-negative
    // rowBytes would slip past the size check into a throwing alloc
    val rowBytes = (width.toLong * 3 + 3) & ~3L // each row padded to 4 bytes
    if (dataOffset < 54 || dataOffset.toLong + rowBytes * height > blob.length)
      return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      // row y of the file is row (height-1-y) of the image
      val src = (dataOffset + y * rowBytes).toInt // fits: checked <= blob.length
      val dst = (height - 1 - y) * width * 3
      var x = 0
      while (x < width) {
        out(dst + x * 3) = blob(src + x * 3 + 2)     // R <- B slot
        out(dst + x * 3 + 1) = blob(src + x * 3 + 1) // G
        out(dst + x * 3 + 2) = blob(src + x * 3)     // B <- R slot
        x += 1
      }
      y += 1
    }
    Some(PngPixels.Image(width, height, 3, out))
  }

  /** Fixture encoder: top-down RGB pixels in, spec-conforming
    * bottom-up padded BGR BMP out — the decoder must actually invert
    * both conventions for the round-trip to close. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3, "pixels must be w*h*3 RGB")
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)                       // reserved, data offset
    bb.putInt(40).putInt(width).putInt(height)    // info header, bottom-up
      .putShort(1).putShort(24).putInt(0)         // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835) // size, 72 dpi
      .putInt(0).putInt(0)                        // palette counts
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        bb.put(pixels(o + 2)).put(pixels(o + 1)).put(pixels(o)) // BGR
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }
}
