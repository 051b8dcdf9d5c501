package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class AvHeaderSpec extends AnyFunSuite {

  test("WAV fixture round-trips through the RIFF chunk walk") {
    val b = AvHeader.wavBytes(22050, 2, 17)
    assert(b.length == 44 + 2 * 2 * 17)
    assert(AvHeader.parseWav(b).contains(AvHeader.WavInfo(22050, 2, 17)))
    assert(AvHeader.parseAvi(b).isEmpty)
    assert(ImageHeader.parse(b).isEmpty)
  }

  test("mono WAV with zero samples still parses") {
    val b = AvHeader.wavBytes(8000, 1, 0)
    assert(AvHeader.parseWav(b).contains(AvHeader.WavInfo(8000, 1, 0)))
  }

  test("16-bit PCM payload round-trips sample-exactly (mono and stereo)") {
    val rnd = new scala.util.Random(11)
    for (ch <- Seq(1, 2)) {
      val pcm = Array.fill[Short](ch * 37)((rnd.nextInt(65536) - 32768).toShort)
      val blob = AvHeader.wavBytesPcm(44100, ch, pcm)
      val (info, back) = AvHeader.decodeWavSamples(blob)
        .getOrElse(fail(s"pcm decode failed ch=$ch"))
      assert(info == AvHeader.WavInfo(44100, ch, 37))
      assert(back.toSeq == pcm.toSeq)
      // negative extremes survive the little-endian round-trip
      val edge = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue, 0)
      val (_, eb) = AvHeader.decodeWavSamples(AvHeader.wavBytesPcm(8000, 1, edge)).get
      assert(eb.toSeq == edge.toSeq)
    }
  }

  test("sample decode declines non-PCM shapes and truncated payloads") {
    val good = AvHeader.wavBytesPcm(8000, 1, Array[Short](5, -5, 7))
    // header still parses but the data chunk is cut short
    assert(AvHeader.decodeWavSamples(good.take(good.length - 2)).isEmpty)
    // format tag != PCM
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float tag
    assert(AvHeader.decodeWavSamples(nonPcm).isEmpty)
    // 8-bit sample size
    val eightBit = good.clone(); eightBit(34) = 8
    assert(AvHeader.decodeWavSamples(eightBit).isEmpty)
    // the zero-filled fixture decodes as silence
    val (_, silent) = AvHeader.decodeWavSamples(AvHeader.wavBytes(8000, 2, 4)).get
    assert(silent.toSeq == Seq.fill[Short](8)(0))
  }

  test("AVI fixture round-trips through the hdrl LIST descent") {
    val b = AvHeader.aviBytes(33, 7, 999)
    assert(b.length == 88)
    assert(AvHeader.parseAvi(b).contains(AvHeader.AviInfo(33, 7, 999)))
    assert(AvHeader.parseWav(b).isEmpty)
    assert(ImageHeader.parse(b).isEmpty)
  }

  test("garbage, truncated, and near-miss blobs parse to None") {
    assert(AvHeader.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(AvHeader.parseWav(AvHeader.wavBytes(8000, 1, 4).take(20)).isEmpty)
    assert(AvHeader.parseAvi("RIFFxxxxWAVExxxx".getBytes("US-ASCII")).isEmpty)
    assert(AvHeader.parseWav("RIFFxxxxAVI xxxx".getBytes("US-ASCII")).isEmpty)
  }

  test("random bytes never crash any header parser (fuzz)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // plain random blobs plus adversarial ones that start with real
    // container magics followed by garbage sizes/fields
    val jpegSoi = new String(Array(0xFF, 0xD8, 0xFF).map(_.toChar))
    val pngSig = new String(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toChar))
    val magics = Seq("RIFF????WAVE", "RIFF????AVI ", "RIFF", "GIF89a", "BM",
      pngSig, jpegSoi)
    val blobs: Gen[Array[Byte]] = for {
      prefix <- Gen.oneOf(magics :+ "")
      tail <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield prefix.getBytes("ISO-8859-1") ++ tail
    val prop = Prop.forAll(blobs) { b =>
      // must return (not throw, not hang): any Option / stub result is
      // fine (decodeAv needs at least 2 payload bytes for its stub)
      AvHeader.parseWav(b); AvHeader.parseAvi(b); ImageHeader.parse(b)
      if (b.length >= 2) Multimodal.decodeAv(0L, "image", b)
      graft.core.GorillaCodec.isValid(b)
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("decodeAv dispatches by real format, not the kind label") {
    // a "video"-labelled row whose bytes are a WAV still decodes as WAV
    val f = Multimodal.decodeAv(1L, "video", AvHeader.wavBytes(11025, 1, 3))
    assert(f.sample_rate == 11025 && f.channels == 1 && f.n_frames == 3)
    assert(f.width == 0 && f.height == 0)
  }
}
