package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/**
 * The driver keeps only the last 2000 chars of bench stdout and parses
 * the last complete JSON line it finds there (build.sbt suppresses the
 * sbt success epilogue so our line IS the tail's end). Rounds 3-6 lost
 * their per-query map because the flat 114-key line outgrew that
 * window; at 140 queries even nested-JSON-object grouping no longer
 * fits (name bytes ~1.2k + ~770 bytes of mandatory JSON punctuation),
 * so the per-query payload is a parenthesis-packed string inside one
 * JSON object — see Bench.compactLine. These tests pin the line's two
 * contracts: it must FIT (<= 1995 chars) and it must carry EVERY
 * query losslessly (leaf `name:val`, group `name(children)`, flat
 * names reconstruct by '_'-joining, bare `:val` names the group node
 * itself).
 */
class BenchLineSpec extends AnyFunSuite {
  private val keys = SparkEntry.queries.keys.toSeq.sorted
  // deterministic per-key pseudo-times matching the real suite's shape
  // (mostly sub-second, a handful of 1-2s stragglers)
  private val results = keys.zipWithIndex.map { case (k, i) =>
    k -> (if (i % 12 == 0) 1.0 + (math.abs(k.hashCode) % 150) / 100.0
          else 0.05 + (math.abs(k.hashCode) % 95) / 100.0)
  }

  /** Recursive-descent parse of the packed `q` grammar back to the
    * flat name -> value map — the reconstruction rule the "f" field
    * declares to the driver/judge. */
  private def parsePacked(s: String, radix: Int = 10): Map[String, Long] = {
    val out = collection.mutable.Map.empty[String, Long]
    var i = 0
    def ident(): String = {
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      s.substring(start, i)
    }
    // a value always follows ':' and runs to the next ',' / ')' / end,
    // so base-36 digits (which share the ident charset) stay unambiguous
    def number(): Long = {
      val start = i
      if (i < s.length && s(i) == '-') i += 1
      while (i < s.length && s(i).isLetterOrDigit) i += 1
      java.lang.Long.parseLong(s.substring(start, i), radix)
    }
    def children(prefix: String): Unit = {
      var more = true
      while (more) {
        if (i < s.length && s(i) == ':') { // bare :val = the node itself
          i += 1; out(prefix) = number()
        } else {
          val name = ident()
          val flat = if (prefix.isEmpty) name else prefix + "_" + name
          s(i) match {
            case ':' => i += 1; out(flat) = number()
            case '(' => i += 1; children(flat); assert(s(i) == ')'); i += 1
            case c   => fail(s"unexpected '$c' at $i")
          }
        }
        if (i < s.length && s(i) == ',') i += 1 else more = false
      }
    }
    if (s.nonEmpty) children("")
    out.toMap
  }

  private def lineParts(line: String): (Double, Map[String, Long]) = {
    val root = new ObjectMapper().readTree(line)
    val scale = root.get("u").asText() match {
      case "cs" => 100.0
      case "ds" => 10.0
      case "s"  => 1.0
      case u    => fail(s"unknown unit $u")
    }
    val hint = Option(root.get("f")).map(_.asText())
    // the value encoding is self-described: base-36 tiers always carry
    // the "v base36" marker in the grammar hint
    val radix = hint match {
      case Some(f) if f.contains("base36") => 36
      case _                               => 10
    }
    // the gzip tier self-describes its decode pipeline in the hint:
    // base64 -> gunzip -> then either the packed grammar ("g(kids)")
    // or the legacy flat `name:val` comma list
    // the b85 tier self-describes as "b85 -> raw deflate -> ..." —
    // decode with the Python-b85decode-compatible alphabet, then raw
    // (nowrap) inflate
    if (hint.exists(_.contains("b85"))) {
      val alpha = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
        "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
      val s = root.get("q").asText()
      val bos = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        val n = math.min(5, s.length - i)
        var acc = 0L
        var j = 0
        while (j < 5) {
          acc = acc * 85 + (if (j < n) alpha.indexOf(s(i + j)).toLong else 84L)
          j += 1
        }
        var k = 24
        var m = 0
        while (m < n - 1) { bos.write(((acc >> k) & 0xff).toInt); k -= 8; m += 1 }
        i += 5
      }
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bos.toByteArray)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
      inf.end()
      val payload = new String(out.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8)
      return (scale, parsePacked(payload, radix))
    }
    if (hint.exists(_.contains("gunzip"))) {
      val bytes = java.util.Base64.getDecoder.decode(root.get("q").asText())
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val payload = new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (hint.exists(_.contains("g(kids)")))
        return (scale, parsePacked(payload, radix))
      return (scale, payload.split(',').map { kv =>
        val i = kv.lastIndexOf(':')
        kv.substring(0, i) -> kv.substring(i + 1).toLong
      }.toMap)
    }
    (scale, parsePacked(root.get("q").asText(), radix))
  }

  test("b85 encoder matches Python's base64.b85decode (pinned vectors)") {
    // vectors computed with CPython's base64.b85encode — the driver
    // parses our line in Python, so stdlib compatibility IS the contract
    val vectors = Seq(
      Array.empty[Byte] -> "",
      "a".getBytes -> "VE",
      "ab".getBytes -> "VPX",
      "abc".getBytes -> "VPaz",
      "abcd".getBytes -> "VPa!s",
      "hello world, graft bench line".getBytes ->
        "Xk~0{Zy<MXa%^NQAZK!6W^^E8Wo~0=AZ%%FWd",
      Array[Byte](0, 0, 0, 0, -1, -1, -1, -1, 1, 2) -> "00000|NsC00Rj")
    vectors.foreach { case (in, want) =>
      assert(Bench.b85(in) == want, s"b85(${in.toSeq})")
    }
  }

  test("compact line fits the driver's tail window with margin") {
    val line = Bench.compactLine(results, results.map(_._2).sum, "sf0.1")
    assert(line.length <= 1995, s"compact line ${line.length} chars > 1995")
    assert(!line.contains('\n'))
  }

  test("compact line round-trips every query key at its declared unit") {
    val line = Bench.compactLine(results, results.map(_._2).sum, "sf0.1")
    val (scale, flat) = lineParts(line)
    assert(flat.keySet == keys.toSet,
      s"missing=${keys.toSet -- flat.keySet} extra=${flat.keySet -- keys.toSet}")
    results.foreach { case (k, v) =>
      assert(flat(k) == math.round(v * scale),
        s"$k: ${flat(k)} != ${math.round(v * scale)}")
    }
  }

  test("failed queries ride the line as -1 sentinels, not fake zeros") {
    val line = Bench.compactLine(Seq("ok" -> 0.5, "broken" -> -1.0), 0.5, "sf0")
    val (scale, flat) = lineParts(line)
    assert(scale == 100.0)
    assert(flat == Map("ok" -> 50L, "broken" -> -1L))
  }

  test("driver line: fits the tail window, valid flat JSON, slowest-first") {
    val total = results.map(_._2).sum
    val line = Bench.driverLine(results, total, Some(1.23), "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"driver line ${line.length} chars > 1900")
    assert(!line.contains('\n'))
    val root = new ObjectMapper().readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("unit").asText() == "sec")
    assert(math.abs(root.get("value").asDouble() - total) < 1e-3)
    assert(math.abs(root.get("control_ratio").asDouble() - 1.23) < 1e-9)
    assert(root.get("n_queries").asInt() == results.size)
    assert(root.get("sf").asText() == "/root/testdata/sf0.1")
    val q = root.get("queries")
    assert(q.size() > 0 && q.size() <= results.size)
    // every entry matches its source value, and the shown set is the
    // slowest prefix of the suite (modulo entries skipped only because
    // a longer name no longer fit)
    val shown = q.fieldNames()
    val src = results.toMap
    var minShown = Double.MaxValue
    while (shown.hasNext) {
      val k = shown.next()
      assert(math.abs(q.get(k).asDouble() - src(k)) < 1e-3, k)
      minShown = math.min(minShown, src(k))
    }
    // the single slowest query is always present
    val slowest = results.maxBy(_._2)._1
    assert(q.has(slowest), s"slowest key $slowest missing from driver line")
  }

  test("driver line: null control_ratio and -1 sentinels survive") {
    val line = Bench.driverLine(Seq("ok" -> 0.5, "broken" -> -1.0), 0.5,
      None, "sf0")
    val root = new ObjectMapper().readTree(line)
    assert(root.get("control_ratio").isNull)
    assert(root.get("queries").get("broken").asDouble() == -1.0)
    assert(root.get("queries").get("ok").asDouble() == 0.5)
  }

  test("sibling-leaf keys (ts_anomaly vs ts_anomaly_prefix) survive nesting") {
    val entries = Seq("a_b" -> 0.1, "a_b_c" -> 0.2, "a_b_d" -> 0.3, "x" -> 0.4)
    val line = Bench.compactLine(entries, 1.0, "sf0")
    val (_, flat) = lineParts(line)
    assert(flat == Map("a_b" -> 10L, "a_b_c" -> 20L, "a_b_d" -> 30L, "x" -> 40L))
  }
}
