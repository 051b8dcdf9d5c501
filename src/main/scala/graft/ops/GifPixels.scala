package graft.ops

/**
 * Pure-JVM GIF pixel codec — real LZW content decode (GIF89a spec,
 * the W3C/CompuServe public format). Covers the common shape: global
 * or local color table, one image, sequential or interlaced row
 * order; extension blocks are skipped. Output is palette-resolved
 * RGB in the shared [[PngPixels.Image]] layout. Anything else
 * returns None.
 *
 * The LZW stream is genuinely variable-width: codes start at
 * minCodeSize+1 bits LSB-first and the dictionary grows to 4096
 * entries. Width schedule (the classic GIF off-by-one, verified
 * code-for-code against javax.imageio): the ENCODER widens only when
 * entry 2^w is assigned (nextCode == 2^w + 1) — an entry is first
 * emittable on the next miss, so the change lands between that add
 * and the following emit; the DECODER's table lags the encoder's by
 * exactly one entry at read time, so it widens at nextCode == 2^w.
 * Interop (not just self-consistency) is pinned in the spec in both
 * directions against javax.imageio.
 */
object GifPixels {

  /** Full pixel decode of the first image. None when not coverable. */
  def decode(blob: Array[Byte]): Option[PngPixels.Image] = {
    if (blob.length < 14 || blob(0) != 'G' || blob(1) != 'I' || blob(2) != 'F' ||
      blob(3) != '8' || (blob(4) != '7' && blob(4) != '9') || blob(5) != 'a')
      return None
    def u8(i: Int): Int = blob(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val packed = u8(10)
    var palette = -1
    var paletteSize = 0
    var pos = 13
    if ((packed & 0x80) != 0) { // global color table
      palette = pos
      paletteSize = 2 << (packed & 0x7)
      pos += paletteSize * 3
    }
    // walk blocks to the first image descriptor
    while (pos < blob.length && u8(pos) == 0x21) { // extension: skip sub-blocks
      pos += 2
      while (pos < blob.length && u8(pos) != 0) pos += 1 + u8(pos)
      pos += 1
    }
    if (pos + 10 >= blob.length || u8(pos) != 0x2C) return None
    val width = le16(pos + 5)
    val height = le16(pos + 7)
    val imgPacked = u8(pos + 9)
    val interlaced = (imgPacked & 0x40) != 0
    // overflow-safe dimension cap (same policy as PngPixels): le16
    // dims reach 65535 each, so width*height*3 wraps Int — a crafted
    // 30-byte header must decline cleanly, never throw or allocate GBs
    if (width <= 0 || height <= 0 ||
      width.toLong * height * 3 > Int.MaxValue / 2) return None
    pos += 10
    if ((imgPacked & 0x80) != 0) { // local color table overrides the GCT
      palette = pos
      paletteSize = 2 << (imgPacked & 0x7)
      pos += paletteSize * 3
    }
    if (palette < 0 || pos >= blob.length) return None // no palette at all
    val minCodeSize = u8(pos); pos += 1
    if (minCodeSize < 2 || minCodeSize > 8) return None
    // concatenate the data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (pos < blob.length && u8(pos) != 0) {
      val len = u8(pos)
      if (pos + 1 + len > blob.length) return None
      data.write(blob, pos + 1, len)
      pos += 1 + len
    }
    val sequential = lzwDecode(data.toByteArray, minCodeSize, width * height)
      .getOrElse(return None)
    // interlaced rows arrive in four passes (8/8 from 0, 8/8 from 4,
    // 4/4 from 2, 2/2 from 1) — pure row reordering after decode
    val indices = if (!interlaced) sequential else {
      val reordered = new Array[Byte](sequential.length)
      var src = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < height) {
          System.arraycopy(sequential, src * width, reordered, y * width, width)
          src += 1
          y += step
        }
      }
      reordered
    }
    val out = new Array[Byte](width * height * 3)
    var i = 0
    while (i < width * height) {
      val idx = indices(i) & 0xFF
      if (idx >= paletteSize) return None
      out(i * 3) = blob(palette + idx * 3)
      out(i * 3 + 1) = blob(palette + idx * 3 + 1)
      out(i * 3 + 2) = blob(palette + idx * 3 + 2)
      i += 1
    }
    Some(PngPixels.Image(width, height, 3, out))
  }

  /** GIF-variant LZW decode: LSB-first variable-width codes. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix code, suffix byte) pairs; roots are implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outPos = 0
    var nextCode = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var bytePos = 0
    val stack = new Array[Byte](4096)

    def expand(code0: Int): Int = { // push code0's string, return first byte
      var sp = 0
      var c = code0
      while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      stack(sp) = c.toByte; sp += 1
      while (sp > 0 && outPos < expected) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      first
    }

    while (true) {
      while (accBits < codeSize) {
        if (bytePos >= data.length) return if (outPos == expected) Some(out) else None
        acc |= (data(bytePos) & 0xFFL) << accBits
        accBits += 8; bytePos += 1
      }
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize; accBits -= codeSize
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outPos == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        expand(code)
        prev = code
      } else {
        if (code > nextCode) return None
        if (code == nextCode) {
          // KwKwK: the not-yet-transmitted entry = prev's string + its
          // own first byte — define it, then expand it
          if (nextCode >= 4096) return None
          var c = prev
          while (c >= clear + 2) c = prefix(c)
          prefix(nextCode) = prev; suffix(nextCode) = c.toByte
          expand(nextCode)
          nextCode += 1
          // the decoder's table lags the encoder's by one entry at
          // read time: encoder widens at 2^w + 1, decoder at 2^w
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else {
          val first = expand(code)
          if (nextCode < 4096) { // full table: add nothing, wait for clear
            prefix(nextCode) = prev; suffix(nextCode) = first.toByte
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
        prev = code
      }
      if (outPos >= expected) return Some(out)
    }
    None
  }

  /** Fixture encoder: real LZW compression (growing dictionary,
    * widening codes, clear-on-full), 256-entry global color table,
    * single image, sub-block framing. */
  def encode(width: Int, height: Int, palette: Array[Byte],
             indices: Array[Byte]): Array[Byte] = {
    require(palette.length == 256 * 3, "palette must be 256 RGB entries")
    require(indices.length == width * height, "indices must be w*h")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    out.write(0xF7) // GCT present, 256 entries
    out.write(0); out.write(0)
    out.write(palette, 0, palette.length)
    out.write(0x2C); le16(0); le16(0); le16(width); le16(height); out.write(0)
    val minCodeSize = 8
    out.write(minCodeSize)
    val lzw = lzwEncode(indices, minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  private def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) { bytes.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
    }
    // dict over (prefixCode << 8 | byte); roots implicit
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    emit(clear)
    if (indices.isEmpty) { emit(eoi) }
    else {
      var cur = indices(0) & 0xFF
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xFF
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
            // grow only once entry 2^w exists: an entry can first be
            // emitted on the NEXT miss, so width changes between that
            // add and the following emit (the canonical schedule —
            // one step later than the "assigned code fills the width"
            // intuition; verified code-for-code against javax.imageio)
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else { // dictionary full: reset, like every mainstream encoder
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = eoi + 1
            codeSize = minCodeSize + 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
      emit(eoi)
    }
    if (accBits > 0) bytes.write((acc & 0xFF).toInt)
    bytes.toByteArray
  }
}
