package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM header parsers against handcrafted format fixtures. */
class ImageHeaderSpec extends AnyFunSuite {

  test("png fixture round-trips dimensions through the parser") {
    for ((w, h) <- Seq((1, 1), (64, 33), (640, 480), (10000, 7)))
      assert(ImageHeader.parse(ImageHeader.pngBytes(w, h)) == Some((w, h)))
    assert(ImageHeader.pngBytes(3, 4).length == 45)
  }

  test("jpeg SOF0 dimensions are found after skipped segments") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xFF, 0xD8) ++ // SOI
      b(0xFF, 0xE0, 0x00, 0x10) ++ Array.fill[Byte](14)(0) ++ // APP0, len 16
      b(0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, 0x02, 0x80) // SOF0: 480x640
    assert(ImageHeader.parse(jpeg) == Some((640, 480)))
  }

  test("gif and bmp headers parse little-endian dimensions") {
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x20, 0x01, 0x40, 0x00) ++ Array.fill[Byte](4)(0) // 288x64
    assert(ImageHeader.parse(gif) == Some((288, 64)))
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x64; bmp(22) = 0x32 // 100x50
    assert(ImageHeader.parse(bmp) == Some((100, 50)))
  }

  test("non-image payloads are rejected, not misparsed") {
    assert(ImageHeader.parse(Array.fill[Byte](16)(0x7F)).isEmpty)
    assert(ImageHeader.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeader.parse(Array.emptyByteArray).isEmpty)
  }

  test("word_ngrams edge cases: short texts, multi-space, duplicates kept") {
    import org.apache.spark.unsafe.types.UTF8String
    def grams(s: String, n: Int): Seq[String] = {
      val a = graft.functions.TextHash.wordNgrams(UTF8String.fromString(s), n)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(grams("a b c", 2) == Seq("a b", "b c"))
    assert(grams("a b a b", 2) == Seq("a b", "b a", "a b")) // duplicates kept
    assert(grams("solo", 2) == Seq.empty)                   // fewer words than n
    assert(grams("", 2) == Seq.empty)
    assert(grams("a  b", 2) == Seq("a ", " b"))             // split-on-every-space semantics
    assert(grams("x y z", 3) == Seq("x y z"))
  }
}
