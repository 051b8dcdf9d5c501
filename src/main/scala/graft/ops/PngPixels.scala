package graft.ops

/**
 * Pure-JVM PNG pixel codec — real content decode for the image
 * modality, no native library: zlib inflate via `java.util.zip` and
 * full scanline unfiltering (all five filter types of the PNG spec,
 * RFC 2083 §6). Supports the common training-data shape: 8-bit,
 * non-interlaced, truecolor RGB (color type 2) or RGBA (type 6).
 * Everything else returns None and falls to the caller's stub path —
 * honest partial coverage, structurally extensible.
 *
 * This closes the "content decode stubbed" gap for images: the
 * encoder fixture writes genuinely filtered + deflated IDAT data, and
 * the decoder must inflate and invert the filters to recover pixels.
 */
object PngPixels {

  /** Decoded image: `pixels` is w*h*channels bytes, row-major. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** Full pixel decode. None when not a PNG this codec covers. */
  def decode(blob: Array[Byte]): Option[Image] = {
    if (blob.length < 45 || !blob.take(8).sameElements(Sig)) return None
    if (!(blob(12) == 'I' && blob(13) == 'H' && blob(14) == 'D' && blob(15) == 'R'))
      return None
    val width = be32(blob, 16)
    val height = be32(blob, 20)
    val bitDepth = blob(24) & 0xFF
    val colorType = blob(25) & 0xFF
    val interlace = blob(28) & 0xFF
    if (bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 2 => 3
      case 6 => 4
      case _ => return None
    }
    if (width <= 0 || height <= 0 || width.toLong * height * channels > Int.MaxValue / 2)
      return None
    // concatenate all IDAT chunk payloads (the spec allows splitting
    // the zlib stream at arbitrary chunk boundaries)
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (i + 8 <= blob.length && !sawEnd) {
      val len = be32(blob, i)
      if (len < 0 || i + 12L + len > blob.length) return None
      val kind = new String(blob, i + 4, 4, "US-ASCII")
      if (kind == "IDAT") idat.write(blob, i + 8, len)
      if (kind == "IEND") sawEnd = true
      i += 12 + len
    }
    val stride = width * channels
    val raw = inflate(idat.toByteArray, (stride + 1) * height).getOrElse(return None)
    if (raw.length != (stride + 1) * height) return None
    // unfilter in place into the output buffer; `prior` is the
    // reconstructed previous scanline (zeros above row 0, per spec)
    val out = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val src = y * (stride + 1) + 1
      val dst = y * stride
      val priorDst = dst - stride
      var x = 0
      ft match {
        case 0 => System.arraycopy(raw, src, out, dst, stride)
        case 1 => // Sub: left neighbor
          while (x < stride) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + left).toByte
            x += 1
          }
        case 2 => // Up: pixel above
          while (x < stride) {
            val up = if (y > 0) out(priorDst + x) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + up).toByte
            x += 1
          }
        case 3 => // Average: floor((left + up) / 2)
          while (x < stride) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            val up = if (y > 0) out(priorDst + x) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + (left + up) / 2).toByte
            x += 1
          }
        case 4 => // Paeth predictor
          while (x < stride) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            val up = if (y > 0) out(priorDst + x) & 0xFF else 0
            val ul = if (x >= bpp && y > 0) out(priorDst + x - bpp) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + paeth(left, up, ul)).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }
    Some(Image(width, height, channels, out))
  }

  /** The Paeth predictor (RFC 2083 §6.6): the neighbor closest to
    * left + up - upperleft, ties resolved left, up, upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off == expected) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /**
   * Encode raw 8-bit pixels as a real PNG, filtering scanline `y` with
   * filter type `filterOf(y)` (0–4) before deflate — a decoder only
   * reads this back by genuinely inverting the filters. `channels`
   * must be 3 (RGB) or 4 (RGBA).
   */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(channels == 3 || channels == 4, "channels must be 3 or 4")
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
    val stride = width * channels
    val bpp = channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = filterOf(y) % 5
      raw(y * (stride + 1)) = ft.toByte
      val src = y * stride
      val dst = y * (stride + 1) + 1
      val priorSrc = src - stride
      var x = 0
      while (x < stride) {
        val cur = pixels(src + x) & 0xFF
        val left = if (x >= bpp) pixels(src + x - bpp) & 0xFF else 0
        val up = if (y > 0) pixels(priorSrc + x) & 0xFF else 0
        val ul = if (x >= bpp && y > 0) pixels(priorSrc + x - bpp) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(dst + x) = (cur - pred).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val outBytes = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) {
      val n = def_.deflate(buf)
      outBytes.write(buf, 0, n)
    }
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig, 0, 8)
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
      .put(8.toByte).put(if (channels == 3) 2.toByte else 6.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk("IHDR", ihdr.array())
    writeChunk("IDAT", outBytes.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
