package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Bit-string helper mirroring the reference's test-only StringWriter
  * (reference: src/bit_string_stream.rs) — renders the packed words as
  * a '0'/'1' string so the paper's layout vectors can be asserted. */
object BitStrings {
  def of(w: BitWriter): String = {
    val words = w.toWords
    val sb = new StringBuilder
    var i = 0L
    while (i < w.bitLength) {
      val word = words((i >>> 6).toInt)
      sb.append(if (((word >>> (63 - (i & 63))) & 1L) == 1L) '1' else '0')
      i += 1
    }
    sb.toString
  }

  def writer(bits: String): BitWriter = {
    val w = new BitWriter()
    bits.foreach(c => w.write(if (c == '1') 1L else 0L, 1))
    w
  }
}

class BitsSpec extends AnyFunSuite {
  test("writer packs MSB-first across word boundaries") {
    val w = new BitWriter()
    w.write(1, 1); w.write(1, 1); w.write(1, 2); w.write(1, 6); w.write(1, 20); w.write(1, 34)
    assert(w.bitLength == 64)
    assert(w.toWords(0) ==
      java.lang.Long.parseUnsignedLong("1101000001000000000000000000010000000000000000000000000000000001", 2))
  }

  test("unaligned spill into second word") {
    val w = new BitWriter()
    w.write(0, 62)
    w.write(0x12, 5) // 0b10010
    assert(w.bitLength == 67)
    assert(w.toWords(0) == 2L)
    assert(w.toWords(1) == java.lang.Long.parseUnsignedLong("0100000000000000000000000000000000000000000000000000000000000000", 2))
  }

  test("reader round-trips arbitrary chunked writes") {
    val rnd = new scala.util.Random(7)
    val pieces = Seq.fill(500) {
      val n = 1 + rnd.nextInt(64)
      val v = rnd.nextLong() & (if (n == 64) -1L else (1L << n) - 1)
      (v, n)
    }
    val w = new BitWriter()
    pieces.foreach { case (v, n) => w.write(v, n) }
    val r = new BitReader(w.toWords, w.bitLength)
    pieces.foreach { case (v, n) => assert(r.read(n) == v, s"width $n") }
    assert(r.remaining == 0)
  }
}

class TimestampCodecSpec extends AnyFunSuite {
  private def encode(header: Long, ts: Seq[Long]): BitWriter = {
    val w = new BitWriter()
    val e = new TimestampCodec.Encoder(header, w)
    ts.foreach(e.push)
    w
  }

  private def decode(header: Long, w: BitWriter, n: Int): Seq[Long] = {
    val d = new TimestampCodec.Decoder(header, new BitReader(w.toWords, w.bitLength))
    Seq.fill(n)(d.next())
  }

  test("paper layout: constant zeros cost 1 bit each after the 14-bit header delta") {
    val w = encode(0, Seq(0, 0, 0, 0, 0))
    assert(BitStrings.of(w) == "000000000000000000")
  }

  test("paper layout: dod control codes (reference vector)") {
    val w = new BitWriter()
    val e = new TimestampCodec.Encoder(0, w)
    e.push(1); assert(BitStrings.of(w) == "00000000000001")
    e.push(2); assert(BitStrings.of(w) == "000000000000010")
    e.push(3); assert(BitStrings.of(w) == "0000000000000100")
    e.push(4); assert(BitStrings.of(w) == "00000000000001000")
    e.push(4); assert(BitStrings.of(w) == "00000000000001000100111110")
    e.push(4); assert(BitStrings.of(w) == "000000000000010001001111100")
    e.push(6); assert(BitStrings.of(w) == "000000000000010001001111100101000001")
  }

  test("paper layout: all dod bucket sizes (reference vector)") {
    val w = new BitWriter()
    val e = new TimestampCodec.Encoder(0, w)
    e.push(1)
    e.push(51)
    e.push(251)
    e.push(1251)
    assert(BitStrings.of(w) == "000000000000011011100001101100101011110101100011111")
    e.push(11251)
    assert(BitStrings.of(w) ==
      "000000000000011011100001101100101011110101100011111111100000000000000000010001100101000")
    assert(decode(0, w, 5) == Seq(1L, 51L, 251L, 1251L, 11251L))
  }

  test("negative large dod survives the 32-bit escape (fixes reference's unsigned read)") {
    val ts = Seq(100L, 10100L, 10200L) // deltas 10000, 100 -> dod -9900
    val w = encode(0, ts)
    assert(decode(0, w, 3) == ts)
  }

  test("random irregular second-resolution series round-trips") {
    val rnd = new scala.util.Random(42)
    val header = 1700000000L / 7200 * 7200
    var t = header + rnd.nextInt(60)
    val ts = Seq.fill(5000) { t += rnd.nextInt(120); t }
    val w = encode(header, ts)
    assert(decode(header, w, ts.size) == ts)
  }

  test("property: escape-boundary dods round-trip (sign-extension fuzz)") {
    // adversarial generator biased to the ±2048 bucket edge and the
    // ±2^31 extremes of the 32-bit escape — the one code path whose
    // reference counterpart is known-buggy (unsigned escape read,
    // reference src/timestamp_stream.rs:104-109): every negative or
    // edge dod must survive the sign-extending decode
    val edges = Gen.oneOf(-2049L, -2048L, -2047L, 2047L, 2048L, 2049L,
      -65536L, 65536L, Int.MaxValue.toLong, Int.MinValue.toLong + 1)
    val dodGen = Gen.frequency(
      3 -> edges,
      2 -> Gen.choose(-3000L, 3000L),
      2 -> Gen.choose(Int.MinValue.toLong + 1, Int.MaxValue.toLong))
    val caseGen = for {
      d0 <- Gen.oneOf(Gen.choose(0L, 16383L), Gen.oneOf(0L, 1L, 16382L, 16383L))
      dods <- Gen.listOfN(40, dodGen)
    } yield (d0, dods)
    val header = 1700000000L / 7200 * 7200
    val prop = Prop.forAll(caseGen) { case (d0, dods) =>
      var delta = d0
      var t = header + d0
      val ts = t +: dods.map { dod => delta += dod; t += delta; t }
      decode(header, encode(header, ts), ts.size) == ts
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunk round-trip at the 14-bit header-delta edge, both value variants") {
    // window-boundary cross-variant coverage: the first point sits at
    // the extreme ends of the 14-bit header window, then an escape-
    // sized jump follows — through the full chunk codec both with and
    // without the lead/trail value variant
    val header = GorillaCodec.alignWindow(1700000000L, 7200)
    for (d0 <- Seq(0L, 1L, 16382L, 16383L); lt <- Seq(false, true)) {
      val ts = Array(header + d0, header + d0 + 1, header + d0 + 9001,
        header + d0 + 9002)
      val vs = Array(1.0, -2.5, 3.25, 3.25)
      val bytes = GorillaCodec.encode(ts, vs, header, lt)
      val (t2, v2) = GorillaCodec.decode(bytes)
      assert(t2.toSeq == ts.toSeq && v2.toSeq == vs.toSeq, s"d0=$d0 lt=$lt")
    }
  }
}

class XorDoubleCodecSpec extends AnyFunSuite {
  private def roundTrip(vs: Seq[Double], leadTrail: Boolean): Seq[Double] = {
    val w = new BitWriter()
    val e = new XorDoubleCodec.Encoder(w, leadTrail)
    vs.foreach(e.push)
    val d = new XorDoubleCodec.Decoder(new BitReader(w.toWords, w.bitLength), leadTrail)
    Seq.fill(vs.size)(d.next())
  }

  test("paper layout: repeats cost 1 bit (reference vector)") {
    val w = new BitWriter()
    val e = new XorDoubleCodec.Encoder(w)
    (1 to 5).foreach(_ => e.push(0.0))
    assert(BitStrings.of(w) == "0" * 68)
  }

  test("paper layout: new-window control (reference vector)") {
    val w = new BitWriter()
    val e = new XorDoubleCodec.Encoder(w)
    e.push(0.0)
    e.push(1.0)
    assert(BitStrings.of(w) ==
      "000000000000000000000000000000000000000000000000000000000000000011000100010011111111111")
  }

  test("paper layout: reuse-window control (reference vector)") {
    val w = new BitWriter()
    val e = new XorDoubleCodec.Encoder(w)
    e.push(11.0)
    e.push(10.0)
    assert(BitStrings.of(w) ==
      "01000000001001100000000000000000000000000000000000000000000000001000000000000001")
  }

  test("paper layout: >31 leading zeros cap (reference vector)") {
    val w = new BitWriter()
    val e = new XorDoubleCodec.Encoder(w)
    e.push(0.0)
    e.push(java.lang.Double.longBitsToDouble(1L))
    assert(BitStrings.of(w) ==
      "00000000000000000000000000000000000000000000000000000000000000001111111100000000000000000000000000000000000001")
  }

  test("all-significant-bits new window does not overflow the 6-bit count") {
    val vs = Seq(11.0, java.lang.Double.longBitsToDouble(0x8000000000000001L))
    assert(roundTrip(vs, leadTrail = false) == vs)
    assert(roundTrip(vs, leadTrail = true) == vs)
  }

  test("word-aligned 64-bit read case (reference regression vector)") {
    val vs = Seq(-75.01536474599993, -75.00911189799993, 114.37647545700004)
    assert(roundTrip(vs, leadTrail = false) == vs)
    assert(roundTrip(vs, leadTrail = true) == vs)
  }

  test("property: arbitrary double sequences round-trip in both variants") {
    val seqGen = Gen.listOfN(200, Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, 1.0, Double.MinPositiveValue, Double.MaxValue)))
    val prop = Prop.forAll(seqGen) { vs =>
      roundTrip(vs, leadTrail = false) == vs && roundTrip(vs, leadTrail = true) == vs
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("monotone ramp round-trips (reference fuzzer)") {
    val vs = (0 until 1000).map(_.toDouble)
    assert(roundTrip(vs, leadTrail = false) == vs)
    assert(roundTrip(vs, leadTrail = true) == vs)
  }
}

class GorillaCodecSpec extends AnyFunSuite {
  test("time+value chunk round-trips (reference compound-stream vector)") {
    val header = 10000L
    val ts = Array(10005L, 10065L, 10124L, 10247L, 10365L)
    val vs = Array(0.34, 0.35, 0.72, 0.42, 1.12)
    for (lt <- Seq(false, true)) {
      val bytes = GorillaCodec.encode(ts, vs, header, lt)
      val (ts2, vs2) = GorillaCodec.decode(bytes)
      assert(ts2.toSeq == ts.toSeq)
      assert(vs2.toSeq == vs.toSeq)
      assert(GorillaCodec.numPoints(bytes) == 5)
    }
  }

  test("fixed-point sums round HALF_UP on negative ties, not floor(x+0.5)") {
    // -0.025 * 100 lands on an exact -2.5 double: HALF_UP (Spark
    // round(), DuckDB round()) gives -3; Math.round would give -2.
    // Both the whole-chunk fixed sum and the range fold must agree.
    val header = GorillaCodec.alignWindow(7200L, 7200)
    val ts = Array(7200L, 7260L, 7320L)
    val vs = Array(-0.025, 0.025, 1.0)
    val bytes = GorillaCodec.encode(ts, vs, header)
    // -3 + 3 + 100
    assert(GorillaCodec.aggregate(bytes, 100.0, hasFixed = true).sumFixed == 100L)
    assert(GorillaCodec.aggregateRange(bytes, 7200L, 7260L).sumFixed == 0L) // -3 + 3
    assert(GorillaCodec.halfUpFixed(-2.5) == -3L)
    assert(GorillaCodec.halfUpFixed(2.5) == 3L)
    assert(GorillaCodec.halfUpFixed(0.49999999999999994) == 0L) // floor(x+0.5) says 1
    assert(GorillaCodec.halfUpFixed(-0.49999999999999994) == 0L)
    assert(GorillaCodec.halfUpFixed(Double.NaN) == 0L)
    assert(GorillaCodec.halfUpFixed(Double.PositiveInfinity) == Long.MaxValue)
  }

  /** The BigDecimal semantics halfUpFixed's fast path must reproduce
    * bit-for-bit (this WAS the implementation before the fast path;
    * 121× slower per point, so it lives here as the oracle only). */
  private def halfUpRef(x: Double): Long =
    if (java.lang.Double.isNaN(x)) 0L
    else if (java.lang.Double.isInfinite(x)) { if (x > 0) Long.MaxValue else Long.MinValue }
    else BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong

  test("halfUpFixed fast path == BigDecimal HALF_UP reference (adversarial + random)") {
    val twoPow52 = 4503599627370496.0
    val adversarial: Seq[Double] = Seq(
      0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 3.5, -3.5,
      0.49999999999999994, -0.49999999999999994,    // largest double < 0.5
      Math.nextDown(2.5), Math.nextUp(2.5), Math.nextDown(-2.5), Math.nextUp(-2.5),
      twoPow52, -twoPow52, twoPow52 - 0.5, -(twoPow52 - 0.5),
      Math.nextDown(twoPow52), -Math.nextDown(twoPow52),
      twoPow52 + 1, -(twoPow52 + 1),
      9.223372036854776E18, -9.223372036854776E18,  // ±2^63 (long-cast saturation)
      Math.nextDown(9.223372036854776E18), -Math.nextDown(9.223372036854776E18),
      1e300, -1e300, Double.MaxValue, Double.MinValue,
      Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    adversarial.foreach { x =>
      assert(GorillaCodec.halfUpFixed(x) == halfUpRef(x), s"halfUpFixed($x)")
    }
    val rnd = new scala.util.Random(42)
    // cents-like values (the production call shape: v * FixedScale)
    var i = 0
    while (i < 200000) {
      val v = (rnd.nextDouble() - 0.5) * 20000.0 * 100.0
      assert(GorillaCodec.halfUpFixed(v) == halfUpRef(v), s"halfUpFixed($v)")
      // exact k.5 ties of both signs
      val tie = (rnd.nextInt(2000001) - 1000000).toDouble + 0.5
      assert(GorillaCodec.halfUpFixed(tie) == halfUpRef(tie), s"halfUpFixed($tie)")
      i += 1
    }
    // uniform over raw bit patterns: hits subnormals, huge magnitudes, NaNs
    i = 0
    while (i < 200000) {
      val x = java.lang.Double.longBitsToDouble(rnd.nextLong())
      assert(GorillaCodec.halfUpFixed(x) == halfUpRef(x),
        s"halfUpFixed($x) [bits=${java.lang.Double.doubleToRawLongBits(x)}]")
      i += 1
    }
  }

  test("halfUpFixedAnsi fast path matches saturating variant where it doesn't throw") {
    val rnd = new scala.util.Random(7)
    var i = 0
    while (i < 100000) {
      val v = (rnd.nextDouble() - 0.5) * 2e6
      assert(GorillaCodec.halfUpFixedAnsi(v) == GorillaCodec.halfUpFixed(v))
      i += 1
    }
    assert(GorillaCodec.halfUpFixedAnsi(-2.5) == -3L)
    assert(GorillaCodec.halfUpFixedAnsi(-9.223372036854776E18) == Long.MinValue) // == -2^63 passes
    intercept[ArithmeticException](GorillaCodec.halfUpFixedAnsi(Double.NaN))
    intercept[ArithmeticException](GorillaCodec.halfUpFixedAnsi(Double.PositiveInfinity))
    intercept[ArithmeticException](GorillaCodec.halfUpFixedAnsi(1e19))
    intercept[ArithmeticException](GorillaCodec.halfUpFixedAnsi(-1e19))
  }

  test("streaming aggregate matches decoded aggregate") {
    val rnd = new scala.util.Random(1)
    val header = GorillaCodec.alignWindow(1700003456L, 7200)
    var t = header
    val n = 2000
    val ts = Array.fill(n) { t += 1 + rnd.nextInt(10); t }
    val vs = Array.fill(n)(math.rint(rnd.nextDouble() * 10000) / 100)
    val bytes = GorillaCodec.encode(ts, vs, header)
    val agg = GorillaCodec.aggregate(bytes)
    assert(agg.n == n)
    assert(agg.minTs == ts.min && agg.maxTs == ts.max)
    assert(agg.minV == vs.min && agg.maxV == vs.max)
    assert(agg.sumV == vs.sum)
  }

  test("compression beats 16 bytes/point on regular-ish data") {
    val header = 0L
    val ts = Array.tabulate(7200)(i => header + i.toLong)
    val vs = Array.tabulate(7200)(i => 20.0 + (i % 5))
    val bytes = GorillaCodec.encode(ts, vs, header)
    assert(bytes.length < 7200 * 16 / 4, s"got ${bytes.length} bytes") // at least 4x
  }

  test("value-only chunks round-trip") {
    val vs = Array.tabulate(100)(i => math.sin(i / 10.0))
    assert(GorillaCodec.decodeValues(GorillaCodec.encodeValues(vs)).toSeq == vs.toSeq)
  }

  test("edge cases: empty, single point, NaN/Inf payloads, zero-delta runs") {
    // empty chunk
    val empty = GorillaCodec.encode(Array.empty[Long], Array.empty[Double], 0L)
    val (et, ev) = GorillaCodec.decode(empty)
    assert(et.isEmpty && ev.isEmpty && GorillaCodec.numPoints(empty) == 0)
    // single point
    val one = GorillaCodec.encode(Array(7201L), Array(42.5), 7200L)
    assert(GorillaCodec.decode(one)._2.toSeq == Seq(42.5))
    // NaN / infinities are raw-bit payloads and must round-trip bit-exactly
    val weird = Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      -0.0, Double.MinPositiveValue)
    val wb = GorillaCodec.encode(Array(10L, 20L, 30L, 40L, 50L), weird, 0L)
    val back = GorillaCodec.decode(wb)._2
    assert(back.map(java.lang.Double.doubleToRawLongBits).toSeq ==
      weird.map(java.lang.Double.doubleToRawLongBits).toSeq)
    // duplicate timestamps (zero delta then zero dod) are legal
    val dup = GorillaCodec.encode(Array(5L, 5L, 5L), Array(1.0, 1.0, 2.0), 0L)
    assert(GorillaCodec.decode(dup)._1.toSeq == Seq(5L, 5L, 5L))
  }

  test("corrupt headers fail fast instead of allocating or looping") {
    val good = GorillaCodec.encode(Array(10L, 11L, 13L), Array(1.0, 2.0, 2.0), 0L)
    assert(GorillaCodec.isValid(good))
    assert(!GorillaCodec.isValid(Array[Byte](1, 2, 3)))
    assert(!GorillaCodec.isValid("not a chunk at all".getBytes("US-ASCII")))

    // flip n to a huge value: must be rejected by the header guard,
    // not surface as a multi-GB Array allocation in decode
    val hugeN = good.clone()
    val bb = java.nio.ByteBuffer.wrap(hugeN)
    bb.putInt(2, Int.MaxValue)
    assert(!GorillaCodec.isValid(hugeN))
    intercept[IllegalArgumentException](GorillaCodec.decode(hugeN))

    // bitLength beyond the payload: rejected too
    val hugeBits = good.clone()
    java.nio.ByteBuffer.wrap(hugeBits).putInt(14, Int.MaxValue)
    assert(!GorillaCodec.isValid(hugeBits))
    intercept[IllegalArgumentException](GorillaCodec.aggregate(hugeBits))
  }
}
