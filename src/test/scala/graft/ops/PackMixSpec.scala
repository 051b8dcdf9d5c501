package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structural invariants of the dataset-build operators — sequence
 * packing and mixture allocation — that the SQL oracles don't state
 * explicitly: offsets tile each shard gaplessly, allocations sum to
 * exactly the budget, and both stay deterministic under repartition.
 */
class PackMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("packSequences tiles each (source, shard) stream gaplessly") {
    val out = TextOps.packSequences(docs, "doc_id", "text", "source",
      ctxLen = 64L, nShards = 4).collect()
    assert(out.nonEmpty)
    val byShard = out.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard")))
    byShard.foreach { case ((src, sh), rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      // concat-and-chunk: each doc starts exactly where the previous
      // one ended — the offsets ARE the token stream, no gaps/overlaps
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_offset") == expect,
          s"gap in ($src, $sh) at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_id") == expect / 64,
          "seq_id is not the ctx-chunk of the start offset")
        assert(r.getAs[Long]("offset_in_seq") == expect % 64)
        expect += r.getAs[Long]("n_tokens")
      }
    }
    // shard is id-derived, so every doc appears exactly once
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    assert(out.length == docs.count())
  }

  test("chunk: full token coverage, exact stride, tail-aligned last chunk") {
    import spark.implicits._
    val n = 150
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc"), (3L, text)).toDF("doc_id", "text")
    val out = TextOps.chunk(df, "doc_id", "text", size = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("start_token"), r.getAs[Long]("n_tokens"), r.getAs[Long]("fp")))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts at k*stride, last chunk ends exactly at the tail, every
    // token covered (stride < size => no gaps)
    d1.foreach { case (_, k, s, len, _) => assert(s == k * 48 && len == math.min(64, n - s)) }
    assert(d1.last._3 + d1.last._4 == n)
    assert(d1.map(c => c._3 until c._3 + c._4).flatten.toSet == (0 until n).toSet)
    // a doc shorter than size is one whole-doc chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 2L, out.filter(_._1 == 2L).head._5)))
    // identical text => identical fingerprints per chunk index
    assert(d1.map(c => (c._2, c._5)).toSeq ==
      out.filter(_._1 == 3L).sortBy(_._2).map(c => (c._2, c._5)).toSeq)
  }

  test("sampleCurriculum: stage-major bijection onto 0..n-1, thresholds honored") {
    val out = TextOps.sampleCurriculum(docs, "doc_id", "text").collect()
    assert(out.length == docs.count())
    // pos is a permutation of 0..n-1 — the curriculum is a total order
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq ==
      (0L until out.length.toLong))
    // stages honor the exact token thresholds
    out.foreach { r =>
      val (n, st) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("stage"))
      val expect = if (n < 40) 0L else if (n < 80) 1L else if (n < 160) 2L else 3L
      assert(st == expect, s"doc ${r.getAs[Long]("doc_id")}: stage $st for $n tokens")
    }
    // stage-major: every stage-k position precedes every stage-(k+1)
    // position — the distributed offset arithmetic reassembles the
    // single global (stage, h) order exactly
    val maxByStage = out.groupBy(_.getAs[Long]("stage"))
      .view.mapValues(_.map(_.getAs[Long]("pos")))
    maxByStage.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(maxByStage(a).max < maxByStage(b).min)
      case _         => ()
    }
  }

  test("sampleCurriculum is layout-independent") {
    val a = TextOps.sampleCurriculum(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.sampleCurriculum(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("packSequences is layout-independent") {
    val a = TextOps.packSequences(docs, "doc_id", "text", "source", 64L, 4)
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.packSequences(docs.repartition(13), "doc_id", "text",
      "source", 64L, 4).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("mixAllocate sums to exactly the budget, proportionally") {
    val budget = 999983L // prime: floor division always leaves remainders
    val out = TextOps.mixAllocate(docs, "lang", "text", budget).collect()
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum == budget,
      "largest-remainder rounding must conserve the budget exactly")
    out.foreach { r =>
      val exact = budget.toDouble * r.getAs[Long]("n_tokens") / total
      val alloc = r.getAs[Long]("alloc_tokens")
      // each group is within one token of its exact proportional share
      assert(math.abs(alloc - exact) < 1.0 + 1e-9,
        s"${r.getAs[String]("lang")}: alloc $alloc vs exact $exact")
    }
  }

  test("sampleSplit: stable assignments, sane fractions, no migration on growth") {
    val out = TextOps.sampleSplit(docs, "doc_id", valPpm = 100000L,
      testPpm = 100000L).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = out.size
    val frac = out.values.groupBy(identity).view.mapValues(_.size.toDouble / n)
    // 10% ± generous tolerance at 500 docs (binomial noise)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06, frac.toMap)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06, frac.toMap)
    // growth stability: assignments computed on HALF the corpus are
    // identical for those ids — a doc never migrates splits
    val half = TextOps.sampleSplit(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", valPpm = 100000L, testPpm = 100000L)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    half.foreach { case (id, s) => assert(out(id) == s, s"doc $id migrated") }
  }

  test("mixAllocate is layout-independent") {
    val a = TextOps.mixAllocate(docs, "lang", "text", 12345L)
      .orderBy("lang").collect().toSeq
    val b = TextOps.mixAllocate(docs.repartition(7), "lang", "text", 12345L)
      .orderBy("lang").collect().toSeq
    assert(a == b)
  }

  test("mixTemperature conserves the budget and up-samples low-resource groups") {
    val budget = 999983L
    val out = TextOps.mixTemperature(docs, "lang", "text", budget).collect()
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum == budget,
      "largest-remainder rounding must conserve the budget exactly")
    val prop = TextOps.mixAllocate(docs, "lang", "text", budget).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("alloc_tokens")).toMap
    val counts = out.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("n_tokens")).toMap
    // α = 0.5 flattens the mixture: every group SMALLER than the mean
    // token count gains share vs proportional, every larger one loses
    val mean = counts.values.sum.toDouble / counts.size
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val alloc = r.getAs[Long]("alloc_tokens")
      if (counts(lang) < mean * 0.9) assert(alloc > prop(lang),
        s"$lang: temperature sampling should up-sample small groups")
      if (counts(lang) > mean * 1.1) assert(alloc < prop(lang),
        s"$lang: temperature sampling should down-sample large groups")
    }
  }

  test("sampleReservoir: shard-merge selection == whole-stratum rank, stable under growth") {
    import org.apache.spark.sql.expressions.Window
    val k = 17
    val out = TextOps.sampleReservoir(docs, "doc_id", "lang", k)
      .orderBy("lang", "rank").collect().toSeq
    // the two-stage (shard top-k, then merge) selection must equal the
    // naive single whole-stratum rank window it exists to avoid
    val naive = docs
      .withColumn("__h", md5(concat(col("doc_id").cast("string"), lit(":res:42"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("lang"), col("rank").cast("long").as("rank"))
      .orderBy("lang", "rank").collect().toSeq
    assert(out == naive)
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      assert(rows.length <= k, s"$lang overflowed k")
      assert(rows.map(_.getAs[Long]("rank")).sorted == (1L to rows.length),
        s"$lang ranks must tile 1..n")
    }
    // growth in OTHER strata never perturbs a stratum's sample
    val en = TextOps.sampleReservoir(docs.filter(col("lang") === "en"),
      "doc_id", "lang", k).orderBy("rank").collect().toSeq
    assert(en == out.filter(_.getAs[String]("lang") == "en"))
  }

  test("sampleShuffle is a bijection onto 0..n-1; salt gives an independent order") {
    val out = TextOps.sampleShuffle(docs, "doc_id").collect()
    val n = docs.count()
    assert(out.length == n)
    // every position 0..n-1 exactly once: the bucket-offset + in-bucket
    // rank decomposition must tile the global range with no gap/overlap
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until n).toSeq)
    // id-derived, not layout-derived
    val b = TextOps.sampleShuffle(docs.repartition(11), "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(out.sortBy(_.getAs[Long]("doc_id")).toSeq == b)
    // a different salt (epoch) is a genuinely different permutation
    val other = TextOps.sampleShuffle(docs, "doc_id", salt = 43L)
      .orderBy("doc_id").collect()
    val moved = out.sortBy(_.getAs[Long]("doc_id")).zip(other)
      .count { case (x, y) => x.getAs[Long]("pos") != y.getAs[Long]("pos") }
    assert(moved > n / 2, s"salt change moved only $moved of $n docs")
  }

  test("sampleInterleave: proportional prefixes, bijective per-source ranks") {
    val out = TextOps.sampleInterleave(docs, "doc_id", "text", "source")
      .orderBy("ikey", "source", "doc_id").collect()
    assert(out.nonEmpty)
    val n = out.length
    // per-source ranks are a bijection onto 0..|source|-1
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("src_rank")).sorted.toSeq ==
        (0L until rows.length.toLong))
    }
    // no-bursts property: in every prefix, each source's doc count
    // tracks its token-mass share. Deviation is NOT ±1 here — the
    // stride unit is a doc but the weights are token mass, so
    // per-source token-per-doc variance adds noise — but it must stay
    // a few docs (~1-2% of the corpus), where a source-sorted order
    // would deviate by an entire source's doc count
    val w = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalW = w.values.sum.toDouble
    val seen = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var maxDev = 0.0
    out.zipWithIndex.foreach { case (r, i) =>
      seen(r.getAs[String]("source")) += 1
      if ((i + 1) % 25 == 0) {
        w.foreach { case (s, ws) =>
          val expect = (i + 1) * ws / totalW
          maxDev = math.max(maxDev, math.abs(seen(s) - expect))
        }
      }
    }
    val largestSource = out.groupBy(_.getAs[String]("source")).values.map(_.length).max
    assert(maxDev <= math.max(3.0, 0.02 * n),
      s"mixture burst: prefix deviation $maxDev docs")
    assert(maxDev * 10 < largestSource || largestSource < 30,
      s"deviation $maxDev should be far below a source-sorted order's $largestSource")
    // deterministic under repartition
    val re = TextOps.sampleInterleave(docs.repartition(7), "doc_id", "text", "source")
      .orderBy("ikey", "source", "doc_id").collect()
    assert(out.map(_.toSeq).toSeq == re.map(_.toSeq).toSeq)
    assert(n == docs.count())
  }

  test("packBuckets: bounded batches, homogeneous bands, exact waste accounting") {
    val out = TextOps.packBuckets(docs, "doc_id", "text",
      bandTokens = 16L, batchDocs = 8, nShards = 4).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= 8)
      val padded = r.getAs[Long]("padded_tokens")
      assert(padded == r.getAs[Long]("n_docs") * r.getAs[Long]("max_tokens"))
      val waste = r.getAs[Long]("waste_tokens")
      assert(waste >= 0 && waste == padded - r.getAs[Long]("sum_tokens"))
      // a band is a 16-token range, so padding per doc is < bandTokens:
      // the whole point of length bucketing
      assert(waste < r.getAs[Long]("n_docs") * 16L)
    }
    // within a (band, shard), only the LAST batch may run short
    out.groupBy(r => (r.getAs[Long]("band"), r.getAs[Long]("shard")))
      .foreach { case (_, rows) =>
        val byBatch = rows.sortBy(_.getAs[Long]("batch_id"))
        byBatch.dropRight(1).foreach(r => assert(r.getAs[Long]("n_docs") == 8))
      }
  }

  test("spanDedup flags shared and internally-repeated spans, not unique text") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val mini = Seq(
      (1L, s"alpha beta $span gamma"),        // shares `span` with doc 2
      (2L, s"$span delta epsilon"),
      (3L, "one two three four five six seven eight nine ten eleven"), // unique
      (4L, s"x $span y $span z")              // repeats `span` internally
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(mini, "doc_id", "text", k = 10)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))).toMap
    // doc 1: 13 words -> 4 spans, exactly one of them IS `span`
    assert(byId(1L) == (4L, 1L))
    assert(byId(2L) == (3L, 1L))
    assert(byId(3L) == (2L, 0L))
    // doc 4: both copies of `span` count — duplication inside one doc
    // is still duplication (Lee et al. dedup within AND across docs)
    assert(byId(4L)._2 == 2L)
    val milli = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_milli")).toMap
    assert(milli(3L) == 0L && milli(1L) == 250L)
  }
}
