package graft.ops

/**
 * Pure-JVM audio/video container header parsing — enough of WAV (RIFF/
 * WAVE) and AVI (RIFF/'AVI ') to read real stream parameters from a
 * binary column without any native codec: sample rate / channels /
 * sample count for audio, dimensions / frame count for video. Like
 * [[ImageHeader]], this is the honest part of media decode that CAN
 * run in a codec-less container; sample/frame decode needs a real
 * library behind the same `mapPartitions` plumbing.
 */
object AvHeader {

  final case class WavInfo(sampleRate: Int, channels: Int, nSamples: Int)
  final case class AviInfo(width: Int, height: Int, frames: Int)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
      b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

  /** WAV: walk the RIFF chunks for `fmt ` (format params) and `data`
    * (payload size); sample count = data bytes / block align. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    // the cursor is a Long and corrupt (negative / huge) size fields
    // bail to None — a bad blob in a binary column must never wedge or
    // crash an executor task
    var i = 12L
    var rate, channels, blockAlign, dataLen = -1
    while (i + 8 <= b.length) {
      val size = le32(b, i.toInt + 4)
      if (size < 0) return None
      if (tag(b, i.toInt, "fmt ") && i + 8 + 16 <= b.length) {
        channels = le16(b, i.toInt + 10)
        rate = le32(b, i.toInt + 12)
        blockAlign = le16(b, i.toInt + 20)
      } else if (tag(b, i.toInt, "data")) dataLen = size
      i += 8L + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (rate > 0 && channels > 0 && blockAlign > 0 && dataLen >= 0)
      Some(WavInfo(rate, channels, dataLen / blockAlign))
    else None
  }

  /** AVI: walk the RIFF chunks into the `hdrl` LIST for the `avih`
    * main header (total frames / width / height at fixed offsets). */
  def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var i = 12L // Long cursor + size validation: see parseWav
    while (i + 8 <= b.length) {
      val size = le32(b, i.toInt + 4)
      if (size < 0) return None
      if (tag(b, i.toInt, "LIST") && tag(b, i.toInt + 8, "hdrl")) i += 12 // descend
      else if (tag(b, i.toInt, "avih") && i + 8 + 40 <= b.length)
        return Some(AviInfo(le32(b, i.toInt + 40), le32(b, i.toInt + 44), le32(b, i.toInt + 24)))
      else i += 8L + size + (size & 1)
    }
    None
  }

  /**
   * REAL sample content decode for 16-bit PCM WAV: walks the RIFF
   * chunks like [[parseWav]] but also requires format tag 1 (PCM) at
   * 16 bits and returns the interleaved little-endian samples. A WAV
   * in any other encoding (float, ADPCM, 8/24-bit) declines to None —
   * honest partial coverage; 16-bit PCM is raw data, no codec needed.
   */
  def decodeWavSamples(b: Array[Byte]): Option[(WavInfo, Array[Short])] = {
    if (b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12L
    var rate, channels, blockAlign, fmtTag, bits = -1
    var dataOff, dataLen = -1
    while (i + 8 <= b.length) {
      val size = le32(b, i.toInt + 4)
      if (size < 0) return None
      if (tag(b, i.toInt, "fmt ") && i + 8 + 16 <= b.length) {
        fmtTag = le16(b, i.toInt + 8)
        channels = le16(b, i.toInt + 10)
        rate = le32(b, i.toInt + 12)
        blockAlign = le16(b, i.toInt + 20)
        bits = le16(b, i.toInt + 22)
      } else if (tag(b, i.toInt, "data")) { dataOff = i.toInt + 8; dataLen = size }
      i += 8L + size + (size & 1)
    }
    if (fmtTag != 1 || bits != 16 || rate <= 0 || channels <= 0 ||
        blockAlign != channels * 2 || dataOff < 0 ||
        dataOff.toLong + dataLen > b.length || (dataLen & 1) == 1) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var j = 0
    while (j < n) {
      samples(j) = ((b(dataOff + 2 * j) & 0xFF) |
        (b(dataOff + 2 * j + 1) << 8)).toShort
      j += 1
    }
    Some((WavInfo(rate, channels, dataLen / blockAlign), samples))
  }

  private def w32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def ascii(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"), 0, 4)

  /** A canonical 44-byte-header 16-bit PCM WAV with `nSamples` zero
    * samples — a real file any WAV reader opens. */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] =
    wavBytesPcm(sampleRate, channels, new Array[Short](nSamples * channels))

  /** A real 16-bit PCM WAV carrying `pcm` as its interleaved payload
    * (pcm.length must be a multiple of channels). */
  def wavBytesPcm(sampleRate: Int, channels: Int, pcm: Array[Short]): Array[Byte] = {
    require(pcm.length % channels == 0, "interleaved payload must fill whole frames")
    val dataLen = pcm.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    ascii(out, "RIFF"); w32(out, 36 + dataLen); ascii(out, "WAVE")
    ascii(out, "fmt "); w32(out, 16)
    w16(out, 1); w16(out, channels); w32(out, sampleRate)
    w32(out, sampleRate * channels * 2); w16(out, channels * 2); w16(out, 16)
    ascii(out, "data"); w32(out, dataLen)
    var i = 0
    while (i < pcm.length) { w16(out, pcm(i) & 0xFFFF); i += 1 }
    out.toByteArray
  }

  /** A minimal 88-byte AVI: RIFF/'AVI ' + hdrl LIST holding one real
    * `avih` main header (30 fps nominal). */
  def aviBytes(width: Int, height: Int, frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(88)
    ascii(out, "RIFF"); w32(out, 80); ascii(out, "AVI ")
    ascii(out, "LIST"); w32(out, 68); ascii(out, "hdrl")
    ascii(out, "avih"); w32(out, 56)
    w32(out, 33333) // dwMicroSecPerFrame (~30 fps)
    w32(out, 0); w32(out, 0); w32(out, 0) // maxBytesPerSec, padding, flags
    w32(out, frames); w32(out, 0) // dwTotalFrames, dwInitialFrames
    w32(out, 1); w32(out, 0) // dwStreams, dwSuggestedBufferSize
    w32(out, width); w32(out, height)
    w32(out, 0); w32(out, 0); w32(out, 0); w32(out, 0) // dwReserved
    out.toByteArray
  }
}
