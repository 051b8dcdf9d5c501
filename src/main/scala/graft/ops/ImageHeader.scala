package graft.ops

/**
 * Pure-JVM image header parsing — enough of PNG / JPEG / GIF / BMP to
 * read real pixel dimensions from a binary column without any native
 * codec. This is the honest part of media decode that CAN run in a
 * codec-less container; full pixel decode still needs a real library
 * behind the same `mapPartitions` plumbing.
 */
object ImageHeader {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** (width, height) if the blob starts with a recognized image header. */
  def parse(blob: Array[Byte]): Option[(Int, Int)] =
    parsePng(blob).orElse(parseJpeg(blob)).orElse(parseGif(blob)).orElse(parseBmp(blob))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk (width/height big-endian
    * at offsets 16/20). */
  def parsePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: walk the marker segments from SOI to the first SOFn frame
    * header (C0–CF except C4/C8/CC), which carries height then width. */
  def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 9 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None
      val marker = b(i + 1) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
        return Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) i += 2 // standalone
      else i += 2 + be16(b, i + 2) // segment length includes its own 2 bytes
    }
    None
  }

  /** GIF87a/GIF89a logical screen descriptor (little-endian at 6/8). */
  def parseGif(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** BMP: BITMAPINFOHEADER width/height (little-endian at 18/22). */
  def parseBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((le32(b, 18), math.abs(le32(b, 22))))
    else None

  /** A minimal, valid-header PNG fixture: signature + IHDR (8-bit RGB)
    * + empty IEND; 45 bytes total, CRCs real. Used to synthesize image
    * blobs that a real header parser must read back. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(45)
    out.write(PngSig, 0, 8)
    def writeChunk(kind: String, data: Array[Byte]): Unit = {
      def be(i: Int): Array[Byte] =
        Array(((i >> 24) & 0xFF).toByte, ((i >> 16) & 0xFF).toByte,
          ((i >> 8) & 0xFF).toByte, (i & 0xFF).toByte)
      out.write(be(data.length), 0, 4)
      val kd = kind.getBytes("US-ASCII") ++ data
      out.write(kd, 0, kd.length)
      val crc = new java.util.zip.CRC32
      crc.update(kd)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk("IHDR", ihdr.array())
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
