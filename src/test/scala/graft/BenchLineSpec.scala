package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/**
 * The driver keeps only the last 2000 chars of bench stdout and parses
 * the last complete JSON line it finds there (build.sbt suppresses the
 * sbt success epilogue so our line IS the tail's end). Rounds 3-6 lost
 * their per-query map because the flat 114-key line outgrew that
 * window. These tests pin the compact trie line's two contracts: it
 * must FIT (<= 1995 chars) and it must carry EVERY query losslessly
 * (flatten nested keys by joining with '_'; "" names the node that is
 * itself a query).
 */
class BenchLineSpec extends AnyFunSuite {
  private val keys = SparkEntry.queries.keys.toSeq.sorted
  // deterministic per-key pseudo-times matching the real suite's shape
  // (mostly sub-second, a handful of 1-2s stragglers)
  private val results = keys.zipWithIndex.map { case (k, i) =>
    k -> (if (i % 12 == 0) 1.0 + (math.abs(k.hashCode) % 150) / 100.0
          else 0.05 + (math.abs(k.hashCode) % 95) / 100.0)
  }

  private def flatten(node: com.fasterxml.jackson.databind.JsonNode,
                      prefix: String,
                      out: collection.mutable.Map[String, Long]): Unit =
    node.fields().asScala.foreach { e =>
      val name =
        if (e.getKey.isEmpty) prefix
        else if (prefix.isEmpty) e.getKey
        else prefix + "_" + e.getKey
      if (e.getValue.isObject) flatten(e.getValue, name, out)
      else out(name) = e.getValue.asLong()
    }

  test("compact line fits the driver's tail window with margin") {
    val line = Bench.compactLine(results, results.map(_._2).sum, "sf0.1")
    assert(line.length <= 1995, s"compact line ${line.length} chars > 1995")
    assert(!line.contains('\n'))
  }

  test("compact line round-trips every query key at its declared unit") {
    val line = Bench.compactLine(results, results.map(_._2).sum, "sf0.1")
    val root = new ObjectMapper().readTree(line)
    // past ~130 keys the centisecond line outgrows the tail budget and
    // the encoder degrades to deciseconds; either way the line must
    // declare its unit and round-trip every key exactly at that scale
    // (the committed BENCH_FULL.json carries the full-precision map)
    val scale = root.get("u").asText() match {
      case "cs" => 100.0
      case "ds" => 10.0
      case u    => fail(s"unknown unit $u")
    }
    val flat = collection.mutable.Map.empty[String, Long]
    flatten(root.get("q"), "", flat)
    assert(flat.keySet == keys.toSet,
      s"missing=${keys.toSet -- flat.keySet} extra=${flat.keySet -- keys.toSet}")
    results.foreach { case (k, v) =>
      assert(flat(k) == math.round(v * scale),
        s"$k: ${flat(k)} != ${math.round(v * scale)}")
    }
  }

  test("failed queries ride the line as -1 sentinels, not fake zeros") {
    val entries = Seq("ok" -> 0.5, "broken" -> -1.0)
    val line = Bench.compactLine(entries, 0.5, "sf0")
    val flat = collection.mutable.Map.empty[String, Long]
    flatten(new ObjectMapper().readTree(line).get("q"), "", flat)
    assert(flat == Map("ok" -> 50L, "broken" -> -1L))
  }

  test("sibling-leaf keys (ts_anomaly vs ts_anomaly_prefix) survive nesting") {
    val entries = Seq("a_b" -> 0.1, "a_b_c" -> 0.2, "a_b_d" -> 0.3, "x" -> 0.4)
    val line = Bench.compactLine(entries, 1.0, "sf0")
    val flat = collection.mutable.Map.empty[String, Long]
    flatten(new ObjectMapper().readTree(line).get("q"), "", flat)
    assert(flat == Map("a_b" -> 10L, "a_b_c" -> 20L, "a_b_d" -> 30L, "x" -> 40L))
  }
}
