package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Properties of the approximate operators against their exact
 * baselines — the checks an SQL oracle cannot express.
 */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup survives a pathologically hot hash without a window cliff") {
    import spark.implicits._
    // one boilerplate text duplicated 100k times (a single content
    // hash) + distinct tail: the shape that strangled the old
    // whole-partition window into one task
    val hot = spark.range(100000).select(col("id"),
      lit("the same boilerplate page").as("text"))
    val tail = spark.range(100000, 101000).select(col("id"),
      concat(lit("unique "), col("id")).as("text"))
    val out = Dedup.exact(hot.union(tail), "id", "text")
    // plan shape: no whole-partition Window (single-task buffering);
    // the groupBy must partial-aggregate map-side
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-hash path uses a Window:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation in dup-groups build:\n$plan")
    // results: hot group keeps id 0, 99999 dups; tail are singletons
    val rows = out.collect()
    assert(rows.length == 101000)
    val hotRows = rows.filter(_.getAs[Long]("n_copies") == 100000L)
    assert(hotRows.length == 100000)
    assert(hotRows.forall(_.getAs[Long]("keep_id") == 0L))
    assert(hotRows.count(_.getAs[Boolean]("is_dup")) == 99999)
    val singles = rows.filter(_.getAs[Long]("n_copies") == 1L)
    assert(singles.length == 1000)
    assert(singles.forall(r => !r.getAs[Boolean]("is_dup") &&
      r.getAs[Long]("keep_id") == r.getAs[Long]("id")))
  }

  test("minhash LSH recall: finds every exact-jaccard>=0.8 pair") {
    val truth = pairSet(Dedup.ngramJaccardBrute(docs, "doc_id", "text", Long.MaxValue, 0.8))
    val lsh = pairSet(Dedup.minhashLsh(docs, "doc_id", "text"))
    assert(truth.nonEmpty, "test data should contain near-dups")
    assert((truth -- lsh).isEmpty, s"LSH missed ${truth -- lsh}")
  }

  test("minhash+verify equals the brute-force jaccard>=0.5 pair set") {
    val verified = pairSet(Dedup.jaccardVerify(
      Dedup.minhashLsh(docs, "doc_id", "text"), docs, "doc_id", "text", 0.5))
    val truth = pairSet(Dedup.ngramJaccardBrute(docs, "doc_id", "text", Long.MaxValue, 0.5))
    assert(verified == truth)
  }

  test("editVerify: exact distances, permille gate binds, candidate-only pricing") {
    import spark.implicits._
    val d = Seq(
      (1L, "aaaa bbbb cccc dddd"),            // identical pair 1-2
      (2L, "aaaa bbbb cccc dddd"),
      (3L, "aaaa bbbb cccc dddX"),            // dist 1 to 1/2 (len 19)
      (4L, "zzzz yyyy xxxx wwww")             // unrelated
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    // wide gate: distances must be the exact Levenshtein values
    val all = Dedup.editVerify(pairs, d, "doc_id", "text", maxDistPermille = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("edit_dist"), r.getAs[Long]("max_len"))).toMap
    assert(all((1L, 2L)) == (0L, 19L))
    assert(all((1L, 3L)) == (1L, 19L))
    assert(all((1L, 4L))._1 > 10L)            // nearly everything differs
    // tight gate: 1/19 ≈ 53‰ — a 60‰ gate keeps it, a 50‰ gate cuts it
    assert(pairSet(Dedup.editVerify(pairs, d, "doc_id", "text", 60)) ==
      Set((1L, 2L), (1L, 3L)))
    assert(pairSet(Dedup.editVerify(pairs, d, "doc_id", "text", 50)) ==
      Set((1L, 2L)))
    // candidate pricing: docs never in a pair do not reach the kernel —
    // the text join is semi-filtered to candidate ids (the public
    // editVerify now IS this lazy plan; its candidate cache is
    // released by the caller via CacheScope)
    val (lazyPlan, cand) = Dedup.editVerifyPlan(pairs, d, "doc_id", "text", 60)
    val plan = lazyPlan.queryExecution.optimizedPlan.toString
    cand.unpersist()
    assert(plan.contains("LeftSemi"), s"expected semi-filtered text join:\n$plan")
  }

  test("CacheScope lifecycle: query-scoped caches release at the harness boundary, no block leak") {
    import spark.implicits._
    CacheScope.releaseAll() // clean slate from earlier tests
    val d = Seq((1L, "aaaa bbbb cccc dddd"), (2L, "aaaa bbbb cccc dddd"),
      (3L, "aaaa bbbb cccc dddX"), (4L, "zzzz yyyy xxxx wwww"))
      .toDF("doc_id", "text")
    val sigs = Dedup.signatures(d, "doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // the full candidate->verify->edit pipeline registers TWO
    // query-scoped persists (jaccard cand + edit cand); the plan stays
    // lazy (nothing persisted until materialization)
    val out = Dedup.editVerify(
      Dedup.jaccardVerifySigs(Dedup.minhashLshSigs(sigs), sigs, 0.5),
      d, "doc_id", "text", maxDistPermille = 60)
    assert(CacheScope.pinnedCount >= 2)
    assert(out.collect().nonEmpty)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "materialization should have populated the registered caches")
    // the harness boundary: all query-scoped blocks drop, session-level
    // caches (none here) untouched
    CacheScope.releaseAll()
    assert(CacheScope.pinnedCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "query-scoped persisted RDDs must be gone after releaseAll")
    // second invocation after release still computes correctly
    val again = Dedup.editVerify(
      Dedup.jaccardVerifySigs(Dedup.minhashLshSigs(sigs), sigs, 0.5),
      d, "doc_id", "text", maxDistPermille = 60)
    assert(again.collect().nonEmpty)
    CacheScope.releaseAll()
  }

  test("containment: catches snippet-in-page pairs jaccard misses, supersets jaccard pairs") {
    import spark.implicits._
    // every J>=τ pair has both containments >= J, so the jaccard pair
    // set is a subset of the containment pair set at the same τ
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    val cont = pairSet(Dedup.containmentBruteSigs(sigs, Long.MaxValue, 0.5))
    val jac = pairSet(Dedup.ngramJaccardBrute(docs, "doc_id", "text", Long.MaxValue, 0.5))
    assert(jac.subsetOf(cont))

    // the asymmetric case: a short doc quoted inside a much longer one
    // — containment flags it, symmetric jaccard cannot
    val snippet = "alpha beta gamma delta epsilon zeta"
    val page = snippet + " " + (1 to 60).map(i => s"filler$i word$i").mkString(" ")
    val two = Seq((1L, snippet), (2L, page)).toDF("doc_id", "text")
    val p = Dedup.containmentBruteSigs(
      Dedup.signatures(two, "doc_id", "text"), Long.MaxValue, 0.9).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[Double]("c_a_in_b") == 1.0) // all snippet shingles in page
    assert(r.getAs[Double]("c_b_in_a") < 0.1)  // page barely inside snippet
    assert(pairSet(Dedup.ngramJaccardBrute(two, "doc_id", "text",
      Long.MaxValue, 0.5)).isEmpty) // jaccard blind to it
  }

  test("published signature table round-trips: read-back equals inline compute") {
    val viaStore = graft.queries.OpsQueries.docSignatures(spark, dir)
      .orderBy("id").collect().toSeq
    val inline = Dedup.signatures(docs, "doc_id", "text")
      .select(viaStore.head.schema.fieldNames.map(col): _*)
      .orderBy("id").collect().toSeq
    assert(viaStore == inline)
  }

  test("prefix-filtered containment join equals brute at several thresholds") {
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    for (tau <- Seq(0.5, 0.8, 0.95)) {
      val brute = pairSet(Dedup.containmentBruteSigs(sigs, Long.MaxValue, tau))
      val joined = pairSet(Dedup.containmentJoinSigs(sigs, tau))
      assert(joined == brute, s"tau=$tau")
    }
  }

  test("hot-df postings (vocab join dropped) verify to IDENTICAL pairs") {
    // any shared global total order is candidate-complete; the hot-df
    // order must therefore verify to the same exact pair set AND the
    // same containment doubles as the full-df order, at every tau —
    // including hotDf = 0 (pure hash order, every shingle cold-ranked)
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a_id", "b_id").collect().toSeq
    for (tau <- Seq(0.5, 0.8, 0.95); hot <- Seq(0L, 64L)) {
      val full = rows(Dedup.containmentJoinPostings(
        Dedup.postings(sigs), sigs, tau))
      val hotP = rows(Dedup.containmentJoinPostings(
        Dedup.postingsHotDf(sigs, hot), sigs, tau))
      assert(hotP == full, s"tau=$tau hotDf=$hot")
    }
  }

  test("prefix-filtered jaccard == brute: same pairs, bit-identical jaccard doubles") {
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a_id", "b_id").collect().toSeq
    for (tau <- Seq(0.5, 0.8)) {
      val brute = rows(Dedup.ngramJaccardBruteSigs(sigs, Long.MaxValue, tau))
      val pref = rows(Dedup.ngramJaccardPrefixSigs(sigs, Long.MaxValue, tau))
      assert(pref == brute, s"tau=$tau")
    }
  }

  test("null and empty texts flow through the dedup stack without crashing or pairing") {
    import spark.implicits._
    val messy = Seq((1L, "alpha beta gamma delta"), (2L, null: String),
      (3L, ""), (4L, "alpha beta gamma delta"), (5L, " "))
      .toDF("doc_id", "text")
    val sigs = Dedup.signatures(messy, "doc_id", "text")
    // null text -> null signature columns; they never enter pair sets
    val cont = pairSet(Dedup.containmentBruteSigs(sigs, Long.MaxValue, 0.5))
    val joined = pairSet(Dedup.containmentJoinSigs(sigs, 0.5))
    val sim = pairSet(Dedup.simhashPairsSigs(sigs))
    val lsh = pairSet(Dedup.minhashLshSigs(sigs))
    assert(cont == Set((1L, 4L)))
    assert(joined == cont)
    assert(sim.subsetOf(Set((1L, 4L), (3L, 5L))) && sim.contains((1L, 4L)))
    assert(lsh.forall(p => !Set(2L).contains(p._1) && !Set(2L).contains(p._2)))
  }

  test("containment join == brute on randomized corpora (seeded sweep)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector.tabulate(25)(i => s"w$i")
      val rdocs = (0 until 60).map { i =>
        val len = rnd.nextInt(40) // includes empty and sub-shingle docs
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val sigs = Dedup.signatures(rdocs, "doc_id", "text")
      val tau = 0.3 + 0.4 * rnd.nextDouble()
      val brute = pairSet(Dedup.containmentBruteSigs(sigs, Long.MaxValue, tau))
      val joined = pairSet(Dedup.containmentJoinSigs(sigs, tau))
      assert(joined == brute, s"seed=$seed tau=$tau")
    }
  }

  test("simhash_bucket_pairs kernel == the higher-order-function expression form") {
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    val sig = sigs.select(col("id"), col("simhash").as("sig"))
    val bandCols = (0 until 8).map(b =>
      shiftrightunsigned(col("sig"), b * 8).bitwiseAND(lit(0xFFL)))
    val buckets = sig.select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
      .toDF("id", "sig", "band", "bucket")
      .groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("sig"))).as("xs"))
      .filter(size(col("xs")).between(2, 1000))
    val maxDist = 7
    // the pre-kernel SQL-expression scan, verbatim
    val viaExprs = buckets.select(explode(flatten(transform(col("xs"), a =>
        transform(
          filter(col("xs"), b => a("id") < b("id") &&
            bit_count(a("sig").bitwiseXOR(b("sig"))) <= maxDist),
          b => struct(a("id").as("a_id"), b("id").as("b_id"),
            bit_count(a("sig").bitwiseXOR(b("sig"))).cast("int").as("dist")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.dist")).distinct()
      .orderBy("a_id", "b_id").collect().toSeq
    val viaKernel = buckets.select(explode(
        graft.functions.simhash_bucket_pairs(col("xs"), maxDist)).as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.dist")).distinct()
      .orderBy("a_id", "b_id").collect().toSeq
    assert(viaKernel == viaExprs)
    assert(viaKernel.nonEmpty)
  }

  test("simhash blocking finds most strong near-dups, all within dist bound") {
    val truth = pairSet(Dedup.ngramJaccardBrute(docs, "doc_id", "text", Long.MaxValue, 0.8))
    val sim = Dedup.simhashPairs(docs, "doc_id", "text")
    assert(sim.filter(col("dist") > 7).count() == 0)
    val found = pairSet(sim)
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.8, s"simhash recall $recall")
  }

  test("hash primitives are deterministic across invocations") {
    import org.apache.spark.unsafe.types.UTF8String
    val h1 = graft.functions.TextHash.fnv64(UTF8String.fromString("spark gorilla"))
    val h2 = graft.functions.TextHash.fnv64(UTF8String.fromString("spark gorilla"))
    assert(h1 == h2)
    assert(graft.functions.TextHash.splitmix64(42L) == graft.functions.TextHash.splitmix64(42L))
    assert(graft.functions.TextHash.hamming64(h1, h1 ^ 0xF0F0L) == 8)
  }

  test("kmeans: assignments match independent nearest-centroid, counts exact, layout-free") {
    val out = Similarity.kmeans(emb, "vec_id", "embedding", k = 8).collect()
    assert(out.length == emb.count())
    // membership accounting is exact
    val sizes = out.groupBy(_.getAs[Long]("cluster")).view.mapValues(_.length)
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") == sizes(r.getAs[Long]("cluster"))) }
    assert(sizes.keys.size <= 8)
    // same trainer, same data => same centroids; verify every
    // assignment against a scalar nearest-centroid computed OUTSIDE
    // the kernel (cosine desc, cluster asc tie rule)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.foreach { r =>
      val v = vecs(r.getAs[Long]("id"))
      val best = cents.map { case (c, m) => (c, cos(v, m)) }
        .maxBy { case (c, s) => (s, -c) }._1
      assert(r.getAs[Long]("cluster") == best.toLong,
        s"vec ${r.getAs[Long]("id")}: cluster ${r.getAs[Long]("cluster")} != scalar $best")
    }
    // layout independence (the 1e-6 mean quantization's whole point)
    val b = Similarity.kmeans(emb.repartition(13), "vec_id", "embedding", 8)
      .orderBy("id").collect().toSeq
    assert(out.sortBy(_.getAs[Long]("id")).toSeq == b)
  }

  test("ann lsh: rank-ordered per query, sane recall vs brute force") {
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val brute = Similarity.bruteTopK(emb, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(ann.nonEmpty)
    val annTop = ann.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val bruteTop = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = bruteTop.collect { case (q, t) if annTop.contains(q) =>
      (annTop(q) & t).size.toDouble / t.size }
    val recall = if (recalls.isEmpty) 0.0 else recalls.sum / recalls.size
    // unclustered random embeddings: LSH recall is modest by nature;
    // the point is the bucketed shape — brute force is the exact path
    assert(recall > 0.2, s"ann recall $recall")
  }

  test("ann lsh candidates are sub-quadratic (bucketed, not all-pairs)") {
    val n = emb.count()
    // structural bound at radius-1 probing: far under all-ordered-pairs
    val r1 = Similarity.annCandidates(emb, "vec_id", "embedding", probes = 1).count()
    assert(r1 < n * (n - 1) / 4,
      s"$r1 radius-1 candidates from $n vectors degenerates toward all-pairs")
    // the default radius-2 fan-out buys recall with a wider probe set;
    // on this spec-sized corpus (500 vectors in 1024 buckets/table) it
    // may cover a large corpus fraction, but must still stay strictly
    // below all-pairs — at production scale the coverage fraction
    // shrinks as avgBucket/corpus with fixed probe count
    val r2 = Similarity.annCandidates(emb, "vec_id", "embedding").count()
    assert(r2 < n * (n - 1),
      s"$r2 radius-2 candidates from $n vectors is all-pairs")
  }

  test("jaccardVerify reduces the corpus by semi-join, broadcasts no corpus frame") {
    val df = Dedup.jaccardVerify(
      Dedup.minhashLsh(docs, "doc_id", "text"), docs, "doc_id", "text", 0.5)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"),
      "shingle frame must be semi-join-reduced to candidate ids before the equi-joins")
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("broadcast"),
      "no explicit broadcast hint of a docs-derived frame")
  }

  test("ivf ann: probing more lists converges toward brute-force truth") {
    val qs = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(nprobe: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5,
          nlist = 16, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.map { case (q, t) => (ivf.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16) // probing all lists == exhaustive => recall 1
    assert(r4 > 0.2, s"ivf recall@nprobe=4 $r4")
    assert(r16 > 0.99, s"ivf recall@nprobe=16 $r16 (all lists probed)")
    assert(r16 >= r4)
  }

  test("packed PQ encode kernel == exploded join + pack, raw and residual") {
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Int](r.length - 1).toList).toMap
    val old = asMap(Similarity.packCodes(
      Similarity.pqEncode(emb, "vec_id", "embedding", books), "id"))
    val fused = asMap(Similarity.pqEncodePacked(emb, "vec_id", "embedding", books))
    assert(fused.nonEmpty && fused == old)
    // residual path: (id, cluster, codes) identical too
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val resBooks = Similarity.residualCodebooks(emb, "vec_id", "embedding", cents)
    val oldR = Similarity.packCodes(
        Similarity.residualEncode(emb, "vec_id", "embedding", cents, resBooks),
        "id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    val fusedR = Similarity
      .residualEncodePacked(emb, "vec_id", "embedding", cents, resBooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    assert(fusedR.nonEmpty && fusedR == oldR)
    // and the encode PLAN is map-only: no exchange anywhere
    val plan = Similarity.pqEncodePacked(emb, "vec_id", "embedding", books)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("pq ann: codes are complete, ADC recall beats floor, rerank is exact") {
    val qs = emb.filter(col("vec_id") < 20)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding")
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val n = emb.count()
    // every vector encodes to exactly m codes within [0, ksub)
    assert(codes.count() == n * 8)
    assert(codes.groupBy("id").count().filter(col("count") =!= 8).count() == 0)
    assert(codes.filter(col("code") < 0 || col("code") >= 32).count() == 0)

    val brute = Similarity.bruteTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.pqTopK(emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rs = brute.map { case (q, t) => (pq.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
    val recall = rs.sum / rs.size
    // 32 codewords x 8 subspaces on unclustered random vectors: modest
    // recall by nature; the property is "far above chance" (chance
    // at k=5 of n=500 is ~1%)
    assert(recall > 0.2, s"pq recall $recall")
  }

  test("pq subspaces cover every dim when dimension % m != 0 (remainder folds into last)") {
    import spark.implicits._
    // 10-dim vectors, m=4 -> dsub=2 and the last subspace must carry 4
    // dims (integer division alone would drop dims 8..9 from codebooks,
    // codes and ADC scores)
    val e = Seq((1L, (0 until 10).map(_.toFloat).toArray))
      .toDF("id", "vec")
    val subs = Similarity.subspaces(e, 4)
      .select(col("j"), size(col("sub")).as("len"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(subs == Map(0 -> 2, 1 -> 2, 2 -> 2, 3 -> 4), subs.toString)
    // and the full PQ path runs green on a non-divisible dimension
    val odd = emb.select(col("vec_id"), slice(col("embedding"), 1, 10).as("embedding"))
    val books = Similarity.pqCodebooks(odd, "vec_id", "embedding", m = 4, ksub = 8)
    val codes = Similarity.pqEncode(odd, "vec_id", "embedding", books)
    assert(codes.count() == odd.count() * 4)
    assert(Similarity.pqTopK(odd, odd.filter(col("vec_id") < 5), "vec_id", "embedding", 3)
      .count() > 0)
  }

  test("ivf-pq ann: restricted code scan still finds real neighbors") {
    val qs = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 5,
          nlist = 16, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16) // all lists probed: only PQ approximation remains
    assert(r4 > 0.15, s"ivfpq recall@nprobe=4 $r4")
    assert(r16 >= r4, s"probing all lists must not lose recall ($r16 < $r4)")
  }

  test("ann training plans are window-free (no skewed per-j corpus sort)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // pqCodebooks used to seed via row_number over partitionBy("j"):
    // m reducer partitions each sorting 1/m of the corpus — a
    // guaranteed straggler at scale. Training must stay hash-agg +
    // TakeOrdered shaped.
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding")
    assert(books.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "pq codebook training plan must contain no Window")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 16)
    assert(cents.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "ivf centroid training plan must contain no Window")
  }

  test("stored index: code-scan query paths equal their recompute twins") {
    // the persisted encoded corpus (lists / PQ / residual / int8
    // codes) must answer every ANN rung identically to encoding the
    // corpus at query time — same kernels, so same codes, so same
    // candidates and ranks
    val path = s"/tmp/graft_models_spec_idx_${System.currentTimeMillis()}"
    Similarity.writeModels(emb, "vec_id", "embedding", path)
    val idx = Similarity.readIndex(spark, path)
    val qs = emb.filter(col("vec_id") < 10)
    def fmt(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(fmt(Similarity.ivfTopKStored(idx, emb, qs, "vec_id", "embedding", 5)) ==
      fmt(Similarity.ivfTopKWith(idx.centroids, emb, qs, "vec_id", "embedding", 5)))
    assert(fmt(Similarity.pqTopKStored(idx, emb, qs, "vec_id", "embedding", 5)) ==
      fmt(Similarity.pqTopKWith(idx.books, emb, qs, "vec_id", "embedding", 5)))
    assert(fmt(Similarity.ivfPqTopKStored(idx, emb, qs, "vec_id", "embedding", 5)) ==
      fmt(Similarity.ivfPqTopKWith(idx.centroids, idx.books, emb, qs,
        "vec_id", "embedding", 5)))
    assert(fmt(Similarity.ivfPqResidualTopKStored(idx, emb, qs, "vec_id", "embedding", 5)) ==
      fmt(Similarity.ivfPqResidualTopKWith(idx.centroids, idx.resBooks, emb, qs,
        "vec_id", "embedding", 5)))
    assert(fmt(Similarity.sq8TopKStored(idx, emb, qs, "vec_id", "embedding", 5)) ==
      fmt(Similarity.sq8TopKWith(idx.maxAbs, emb, qs, "vec_id", "embedding", 5)))
    assert(fmt(Similarity.ivfSq8TopKStored(idx, emb, qs, "vec_id", "embedding", 5)) ==
      fmt(Similarity.ivfSq8TopKWith(idx.centroids, idx.maxAbs, emb, qs,
        "vec_id", "embedding", 5)))
    // LSH off persisted buckets == hash-at-query-time (same family)
    def fmtAll(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(fmtAll(Similarity.annTopKStored(idx, emb, "vec_id", "embedding", 5)) ==
      fmtAll(Similarity.annTopK(emb, "vec_id", "embedding", 5)))
    // per-query serving path == the self-join path restricted to the
    // same query ids (query-side hashing reproduces the stored family),
    // at full budget and under a partial radius-2 budget
    for (t2 <- Seq(Int.MaxValue, 4)) {
      assert(fmtAll(Similarity.annTopKStoredFor(idx, emb, qs, "vec_id", "embedding",
          5, probes2Tables = t2)) ==
        fmtAll(Similarity.annTopKStored(idx, emb, "vec_id", "embedding",
          5, probes2Tables = t2).filter(col("q_id") < 10)))
    }
    // the LSH geometry is the STORE's, not the caller's: an index
    // written at a non-default bit width must round-trip its lsh_meta
    // and keep self-join == hash-at-query-time at that width (at scale
    // the width grows with log2(corpus) so bucket lists stay bounded)
    val path6 = s"/tmp/graft_models_spec_idx6_${System.currentTimeMillis()}"
    Similarity.writeModels(emb, "vec_id", "embedding", path6, lshBitsOverride = 6)
    val idx6 = Similarity.readIndex(spark, path6)
    assert(idx6.lshBits == 6 && idx6.lshTables == 8)
    // the meta also round-trips the corpus size — the quantized query
    // paths scale their rerank depth with it (r10 scale-recall fix)
    assert(idx6.n == emb.count())
    assert(fmtAll(Similarity.annTopKStored(idx6, emb, "vec_id", "embedding", 5)) ==
      fmtAll(Similarity.annTopK(emb, "vec_id", "embedding", 5, nBits = 6)))
  }

  test("ivf assign/probe are kernel scans: no crossJoin row amplification") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.Cross
    // the old shape crossJoined every corpus row with all nlist
    // centroids and arg-maxed through a hash aggregate — a ×nlist
    // amplification of the scan (4096× at the 100 TB setting). Both
    // the corpus assignment and the query probe must now go through
    // the 1-row-in/1-row-out nearest_centroids kernel.
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 16)
    val q = Similarity.ivfTopKWith(cents, emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
    val plan = q.queryExecution.optimizedPlan
    assert(plan.collect { case j @ Join(_, _, Cross, _, _) => j }.isEmpty,
      s"crossJoin survived in the IVF query path:\n$plan")
    assert(plan.toString.contains("nearest_centroids"),
      s"nearest-centroid kernel missing from the IVF plan:\n$plan")
    // training (the Lloyd assignment) must be crossJoin-free too
    assert(cents.queryExecution.optimizedPlan.collect {
      case j @ Join(_, _, Cross, _, _) => j }.isEmpty,
      "crossJoin survived in IVF centroid training")
  }

  test("incremental LSH equals full LSH restricted to batch-touching pairs") {
    val history = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val inc = pairSet(Dedup.jaccardVerify(
      Dedup.minhashLshIncremental(batch, history, "doc_id", "text"),
      docs, "doc_id", "text", 0.5))
    val full = pairSet(Dedup.jaccardVerify(
      Dedup.minhashLsh(docs, "doc_id", "text"), docs, "doc_id", "text", 0.5))
      .filter { case (a, b) => a >= 400 || b >= 400 }
    assert(inc == full, s"incremental diverged: only-inc=${inc -- full}, " +
      s"missed=${full -- inc}")
    assert(inc.nonEmpty, "test corpus should have batch-touching near-dups")
    // and never a history-only pair
    assert(inc.forall { case (a, b) => a >= 400 || b >= 400 })
  }

  test("misra_gries: superset of true heavy hitters, counts within N/k") {
    import spark.implicits._
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
    val n = words.count()
    val k = 64
    val exact = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(graft.functions.misra_gries(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.lower_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k - 1, s"state exceeded k-1: ${sketch.size}")
    // every item with true count > N/k must be present
    val mustHave = exact.filter { case (_, c) => c > n / k }
    assert(mustHave.nonEmpty, "test corpus should have heavy hitters")
    val missed = mustHave.keySet -- sketch.keySet
    assert(missed.isEmpty, s"guaranteed heavy hitters missed: $missed")
    // reported counts are lower bounds within N/k of truth
    sketch.foreach { case (w, c) =>
      val t = exact.getOrElse(w, 0L)
      assert(c <= t, s"'$w': reported $c exceeds true $t")
      assert(t - c <= n / k, s"'$w': error ${t - c} above N/k=${n / k}")
    }
    // merge-order robustness: a 1-partition fold obeys the same bounds
    val one = docs.coalesce(1)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(graft.functions.misra_gries(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.lower_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((mustHave.keySet -- one.keySet).isEmpty)
  }

  test("decontaminate: hot-gram cap leaves flags unchanged below the cap") {
    val train = docs.filter(col("doc_id") < 450)
    val bench = docs.filter(col("doc_id") >= 450)
    val base = TextOps.decontaminate(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    // no legit 5-gram in this corpus reaches the default cap, so the
    // capped output must equal the uncapped one
    val uncapped = TextOps.decontaminate(train, bench, "doc_id", "text",
        maxGramDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(base == uncapped)
    assert(base.exists(_._2), "corpus should contain contaminated docs")
    // a cap of 0 drops every gram -> nothing can be flagged (the
    // degenerate-bucket guard actually gates the shuffle key)
    val allCapped = TextOps.decontaminate(train, bench, "doc_id", "text",
        maxGramDf = 0L)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(allCapped.forall(!_._2))
  }

  test("bloom filter: zero false negatives, bounded fp rate, order-free merge") {
    import graft.functions.BloomUtil
    val (bits, k) = BloomUtil.size(10000, 0.01)
    // sizing sanity: ~9.59 bits/item at 1% fpp, ~7 probes
    assert(bits >= 9 * 10000 && bits <= 11 * 10000, s"bits=$bits")
    assert(k >= 5 && k <= 9, s"k=$k")
    val words = new Array[Long]((bits + 63) >>> 6)
    val rnd = new scala.util.Random(7)
    val members = Array.fill(10000)(rnd.nextLong())
    members.foreach(BloomUtil.insert(words, bits, k, _))
    val ser = BloomUtil.serialize(words, bits, k)
    // soundness: every inserted key probes true through the
    // SERIALIZED form (the broadcast path probes bytes, not words)
    assert(members.forall(BloomUtil.contains(ser, _)), "false negative")
    // fp rate on fresh keys: statistically ~1%; 3% tolerates tail luck
    val probes = Array.fill(20000)(rnd.nextLong())
    val memberSet = members.toSet
    val fps = probes.count(h => !memberSet(h) && BloomUtil.contains(ser, h))
    assert(fps.toDouble / probes.length < 0.03, s"fp rate ${fps.toDouble / probes.length}")
    // merge = bitwise OR: any split of the inserts merges to the same
    // filter the single-pass build produced
    val (w1, w2) = (new Array[Long](words.length), new Array[Long](words.length))
    members.zipWithIndex.foreach { case (h, i) =>
      BloomUtil.insert(if (i % 2 == 0) w1 else w2, bits, k, h) }
    var i = 0
    while (i < w1.length) { w1(i) |= w2(i); i += 1 }
    assert(java.util.Arrays.equals(w1, words), "merge not order-free")
  }

  test("decontaminateBloom equals the exact operator (prefilter loses nothing)") {
    val train = docs.filter(col("doc_id") < 450)
    val bench = docs.filter(col("doc_id") >= 450)
    val exact = TextOps.decontaminate(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val bloom = TextOps.decontaminateBloom(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(bloom == exact)
    assert(bloom.exists(_._2), "corpus should contain contaminated docs")
    // an aggressively small filter (fpp -> 0.5) only adds false
    // POSITIVES to the prefilter; the exact verify still removes them
    val sloppy = TextOps.decontaminateBloom(train, bench, "doc_id", "text",
        fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(sloppy == exact)
  }

  test("persisted models: write-once read-many, queries match inline training") {
    val path = s"/tmp/graft_models_spec_${System.currentTimeMillis()}"
    assert(!Similarity.modelsExist(spark, path))
    Similarity.writeModels(emb, "vec_id", "embedding", path)
    assert(Similarity.modelsExist(spark, path))
    val (centroids, books, resBooks) = Similarity.readModels(spark, path)
    assert(centroids.count() == 16 && books.count() == 8 * 32 && resBooks.count() == 8 * 32)
    // model determinism: the same corpus trains the same model, so a
    // query against the store equals a query with inline training
    val qs = emb.filter(col("vec_id") < 10)
    val fromStore = Similarity.ivfTopKWith(centroids, emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val inline = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(fromStore == inline)
  }

  test("appendToModels: tables equal a same-model full encode, meta n bumps, compact folds") {
    val path = s"/tmp/graft_models_spec_app_${System.currentTimeMillis()}"
    val isBatch = pmod(xxhash64(col("vec_id"), lit(779L)), lit(10L)) === 7L
    val base = emb.filter(!isBatch)
    val batch = emb.filter(isBatch)
    val (nBase, nBatch) = (base.count(), batch.count())
    assert(nBase > 0 && nBatch > 0)
    Similarity.writeModels(base, "vec_id", "embedding", path)
    Similarity.appendToModels(batch, "vec_id", "embedding", path)
    assert(Similarity.modelsExist(spark, path))
    val idx = Similarity.readIndex(spark, path)
    // the corpus count tracks growth (rerank depth scales with it)
    assert(idx.n == nBase + nBatch)

    // the append CONTRACT: every corpus table equals what a full
    // encode of base ∪ batch with the SAME stored models produces —
    // so every *TopKStored path serves the union transparently
    val (centroids, books, resBooks) = Similarity.readModels(spark, path)
    val cm = centroids.orderBy("cluster").collect()
    val cIds = cm.map(_.getInt(0))
    val cMat = cm.map(_.getSeq[Float](1).toArray)
    val expLists = emb.select(col("vec_id").as("id"),
      element_at(graft.functions.nearest_centroids(
        col("embedding"), cIds, cMat, 1), 1).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val gotLists = idx.lists.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotLists == expLists)

    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val expCodes = codeSet(Similarity.pqEncode(emb, "vec_id", "embedding", books))
    val gotCodes = codeSet(idx.codes
      .select(col("id"), posexplode(col("codes"))).toDF("id", "j", "code"))
    assert(gotCodes == expCodes)

    val expRes = Similarity
      .residualEncode(emb, "vec_id", "embedding", centroids, resBooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val gotRes = idx.resCodes
      .select(col("id"), col("cluster"), posexplode(col("codes")))
      .toDF("id", "cluster", "j", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(gotRes == expRes)

    val expSq8 = emb.select(col("vec_id").as("id"),
        graft.functions.sq8_encode(col("embedding"), lit(127.0 / idx.maxAbs)).as("code"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    val gotSq8 = idx.sq8Codes
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(gotSq8 == expSq8)

    def lshSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("table"), col("bucket"), explode(col("ids")).as("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val expLsh = Similarity
      .lshBuckets(emb, "vec_id", "embedding", idx.lshBits, idx.lshTables)
      .groupBy("table", "bucket").agg(collect_list("id").as("ids"))
    assert(lshSet(idx.lshLists) == lshSet(expLsh))

    // compaction folds the per-batch fragment rows back to one row per
    // bucket without changing membership, and the store stays complete
    val fragRows = idx.lshLists.count()
    Similarity.compactLshLists(spark, path)
    assert(Similarity.modelsExist(spark, path))
    val compacted = spark.read.parquet(s"$path/lsh_lists")
    assert(lshSet(compacted) == lshSet(expLsh))
    assert(compacted.count() <= fragRows)
    assert(compacted.groupBy("table", "bucket").count()
      .filter(col("count") > 1).count() == 0)

    // end-to-end: the flagship query path serves the union
    val res = Similarity.ivfPqTopKStored(Similarity.readIndex(spark, path),
      emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
    assert(res.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("residual ivf-pq: quantization error drops, recall not worse than raw-pq") {
    val qs = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val raw4 = recallOf(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4))
    val res4 = recallOf(Similarity.ivfPqResidualTopK(emb, qs, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4))
    val raw16 = recallOf(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 16))
    val res16 = recallOf(Similarity.ivfPqResidualTopK(emb, qs, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 16))
    info(s"recall raw@4=$raw4 res@4=$res4 raw@16=$raw16 res@16=$res16")

    // reconstruction error: mean ||v - v_hat||^2 with v_hat = concat of
    // codewords (raw) vs centroid + concat of residual codewords
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 16)
    val rawBooks = Similarity.pqCodebooks(emb, "vec_id", "embedding")
    val resBooks = Similarity.residualCodebooks(emb, "vec_id", "embedding", cents)
    def approxVec(codes: org.apache.spark.sql.DataFrame,
                  books: org.apache.spark.sql.DataFrame) =
      codes.join(bcast(books), Seq("j", "code"))
        .groupBy("id")
        .agg(flatten(transform(array_sort(collect_list(struct(col("j"), col("cw")))),
          s => s.getField("cw"))).as("vhat"))
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val rawErr = approxVec(
        Similarity.pqEncode(emb, "vec_id", "embedding", rawBooks), rawBooks)
      .join(e, Seq("id"))
      .agg(avg(graft.functions.vec_l2sq(col("vec"), col("vhat")))).head().getDouble(0)
    val resCodes = Similarity.residualEncode(emb, "vec_id", "embedding", cents, resBooks)
    val resErr = approxVec(resCodes.select("id", "j", "code"), resBooks)
      .join(resCodes.select("id", "cluster").distinct(), Seq("id"))
      .join(bcast(cents), Seq("cluster"))
      .withColumn("vhat",
        zip_with(col("centroid"), col("vhat"), (a, b) => a + b).cast("array<float>"))
      .join(e, Seq("id"))
      .agg(avg(graft.functions.vec_l2sq(col("vec"), col("vhat")))).head().getDouble(0)
    info(s"reconstruction mse raw=$rawErr residual=$resErr")
    assert(resErr < rawErr,
      s"residual encoding must cut quantization error: $resErr !< $rawErr")
    assert(res4 > 0.15, s"residual ivfpq recall $res4 below floor")
    assert(res16 >= raw16 - 1e-9,
      s"with all lists probed residual approximation lost recall: $res16 < $raw16")
  }

  test("sq8 ann: high recall vs brute, integer scores bit-stable across runs") {
    val qs = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def run() = Similarity.sq8TopK(emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val a = run()
    assert(a == run(), "sq8 ranking must be deterministic (integer scores)")
    val sq = a.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val rs = brute.map { case (q, t) => (sq.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
    val recall = rs.sum / rs.size
    // 255-level int8 quantization + exact rerank of 4k candidates:
    // recall should be near-exact, far above the coarse-code ladders
    assert(recall > 0.8, s"sq8 recall $recall")
  }

  test("ivf-sq8: probing more lists converges toward brute, scale persists") {
    val qs = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist = 16)
    val scale = Similarity.sq8Scale(emb, "vec_id", "embedding")
    def recallAt(nprobe: Int): Double = {
      val r = Similarity.ivfSq8TopKWith(centroids, scale, emb, qs,
          "vec_id", "embedding", 5, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.map { case (q, t) => (r.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16) // all lists probed + fine int8 codes + rerank
    assert(r4 > 0.2, s"ivf-sq8 recall@nprobe=4 $r4")
    assert(r16 > 0.9, s"ivf-sq8 recall@nprobe=16 $r16")
    assert(r16 >= r4)
    // writeModels persists the scale; read-back must round-trip it
    val path = s"/tmp/graft_sq8_spec_${System.nanoTime()}"
    Similarity.writeModels(emb, "vec_id", "embedding", path)
    assert(Similarity.readSq8Scale(spark, path) == scale)
  }

  test("sq8 codes: one byte per dim, clamped, kernel matches scalar math") {
    import graft.functions.{sq8_dot, sq8_encode}
    val one = emb.limit(3)
      .select(col("embedding"), sq8_encode(col("embedding"), lit(127.0)).as("code"))
      .collect()
    for (r <- one) {
      val vec = r.getSeq[Float](0)
      val code = r.getAs[Array[Byte]](1)
      assert(code.length == vec.length, "one byte per dimension")
      for ((v, c) <- vec.zip(code))
        assert(c == math.max(-127, math.min(127, math.round(v * 127.0))).toByte)
    }
    val dot = emb.limit(1)
      .select(sq8_dot(sq8_encode(col("embedding"), lit(127.0)),
        sq8_encode(col("embedding"), lit(127.0))).as("d"))
      .first().getLong(0)
    assert(dot > 0, "self-dot of a nonzero code vector is positive")
  }

  test("adc_score kernel: positional LUT lookup, dead slots never read, bad codes fail loudly") {
    import spark.implicits._
    import graft.functions.adc_score
    // m=2 subspaces, ksub=3: lut laid out j*ksub+code. codes (1, 2)
    // must read lut[0*3+1]=10.0 and lut[1*3+2]=0.25 — fixed j-order sum
    val df = Seq((Seq(1, 2), Seq(1.0, 10.0, 100.0, 0.125, 0.5, 0.25)))
      .toDF("codes", "lut")
    assert(df.select(adc_score(col("codes"), col("lut"))).first().getDouble(0)
      == 10.25)
    // a dead codeword slot (never referenced by any code) does not
    // affect the score: change lut[2] only
    val df2 = Seq((Seq(1, 2), Seq(1.0, 10.0, -999.0, 0.125, 0.5, 0.25)))
      .toDF("codes", "lut")
    assert(df2.select(adc_score(col("codes"), col("lut"))).first().getDouble(0)
      == 10.25)
    // out-of-range code and misshapen lut must fail loudly, not read
    // a neighboring subspace's entry
    intercept[Exception] {
      Seq((Seq(3, 0), Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))).toDF("codes", "lut")
        .select(adc_score(col("codes"), col("lut"))).collect()
    }
    intercept[Exception] {
      Seq((Seq(0, 0), Seq(1.0, 2.0, 3.0, 4.0, 5.0))).toDF("codes", "lut")
        .select(adc_score(col("codes"), col("lut"))).collect()
    }
  }

  test("dedup_cluster_stats is consistent with pipeline and apply") {
    val q = graft.queries.OpsQueries.queries
    val stats = q("dedup_cluster_stats")(spark, dir).collect()
      .map(r => (r.getAs[Long]("size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs")))
    assert(stats.forall { case (s, c, d) => d == s * c })
    // docs covered == bounded corpus size; clusters == dedup survivors
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 1000).count()
    assert(stats.map(_._3).sum == corpus)
    val survivors = q("dedup_apply")(spark, dir).count()
    assert(stats.map(_._2).sum == survivors)
  }

  test("dedup_apply: survivors are exactly the component representatives") {
    val sub = docs.filter(col("doc_id") < 1000)
    val comp = Dedup.components(
      Dedup.jaccardVerify(
        Dedup.minhashLsh(sub, "doc_id", "text"), sub, "doc_id", "text", 0.5)
        .select("a_id", "b_id"),
      sub, "doc_id")
    val survivors = graft.queries.OpsQueries.queries("dedup_apply")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = comp.select("comp").distinct().collect().map(_.getLong(0)).toSet
    assert(survivors == reps, "one surviving doc per component, keyed by min id")
    val all = sub.count()
    val dups = comp.filter(col("is_dup")).count()
    assert(survivors.size == all - dups)
  }

  test("components: chains collapse transitively to one canonical id") {
    import spark.implicits._
    // A~B, B~C, D~E; A!~C directly — all of A,B,C must share component 1
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a_id", "b_id")
    val ids = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val comp = Dedup.components(pairs, ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(comp == Set(
      (1L, 1L, 3L, false), (2L, 1L, 3L, true), (3L, 1L, 3L, true),
      (5L, 5L, 1L, false), (7L, 7L, 2L, false), (9L, 7L, 2L, true)))
  }

  test("components: an 8-hop chain converges to one component (fixpoint)") {
    import spark.implicits._
    // a pure chain 1-2-3-...-9: min-label propagation moves one hop per
    // round, so any fixed small iteration count (the old iters=4) would
    // split this into several wrong components
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val ids = (1L to 9L).toDF("doc_id")
    val comp = Dedup.components(pairs, ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == (1L to 9L).map(_ -> 1L).toMap,
      s"chain must collapse to component 1, got $comp")
  }

  test("components: driver union-find path == forced distributed fixpoint") {
    // the adaptive small-graph arm (broadcast-sized edge sets collapse
    // to driver-side union-find) must be row-identical to the
    // distributed pointer-jumping loop on the same graph — including
    // comp_size and is_dup, on a graph mixing chains, a clique,
    // singletons, and out-of-order edge ids
    import spark.implicits._
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 1L), // chain hitting min last
      (20L, 21L), (21L, 22L), (20L, 22L),         // triangle
      (30L, 31L)).toDF("a_id", "b_id")
    val ids = ((1L to 2L) ++ Seq(5L, 9L) ++ (20L to 22L) ++
      Seq(30L, 31L, 40L, 41L)).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val small = rows(Dedup.components(pairs, ids, "doc_id"))
    val dist = rows(Dedup.components(pairs, ids, "doc_id",
      smallGraphMaxEdges = 0L))
    assert(small == dist, s"small=$small dist=$dist")
    assert(small.contains((1L, 1L, 4L, false)) && small.contains((5L, 1L, 4L, true)))
    assert(small.contains((40L, 40L, 1L, false)))
  }

  test("stratified sample: deterministic, rates honored per stratum") {
    val rates = Map("en" -> 0.5, "fr" -> 0.25, "zh" -> 1.0)
    def run() = TextOps.sampleStratified(docs, "doc_id", "lang", rates, defaultRate = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = run(); val s2 = run()
    assert(s1 == s2, "hash-gated sample must be reproducible")
    val byLang = docs.select("doc_id", "lang").collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    for ((lang, ids) <- byLang) {
      val r = rates.getOrElse(lang, 0.1)
      val got = (ids & s1).size.toDouble / ids.size
      assert(math.abs(got - r) < 0.15 + 2.0 / math.sqrt(ids.size),
        s"$lang rate $got vs $r over ${ids.size} docs")
    }
    assert((byLang("zh") -- s1).isEmpty, "rate 1.0 stratum must be fully kept")
  }

  test("multimodal: image dims parsed from real PNG headers; stub for codec-less kinds") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == docs.count())
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    // real 45-byte PNG fixtures, parsed back to the md5-derived dims
    assert(images.forall(f => f.n_bytes == 45 && f.head_byte == 0x89))
    val textById = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    images.foreach { f =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(textById(f.media_id).getBytes("UTF-8"))
      assert(f.width == (d(0) & 0xFF) % 64 + 1 && f.height == (d(1) & 0xFF) % 64 + 1,
        s"parsed ${f.width}x${f.height} != md5-derived dims for ${f.media_id}")
    }
    assert(feats.filter(_.kind != "image").forall(f => f.n_bytes == 16))
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("winnowing: shared-run guarantee, density bound, layout independence") {
    import spark.implicits._
    val k = 4; val w = 8
    // a 20-word run planted inside two otherwise-unrelated documents
    // (run length 20 >= w + k - 1 = 11 → the winnowing guarantee
    // promises at least one SHARED fingerprint hash)
    val run = (1 to 20).map(i => s"run$i").mkString(" ")
    val a = (1 to 30).map(i => s"alpha$i").mkString(" ") + " " + run
    val b = run + " " + (1 to 30).map(i => s"beta$i").mkString(" ")
    val c = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = TextOps.winnowing(df, "doc_id", "text", k, w).collect()
    def hashes(id: Long) = fps.filter(_.getLong(0) == id).map(_.getLong(2)).toSet
    assert((hashes(1L) intersect hashes(2L)).nonEmpty,
      "documents sharing a 20-word run must share a fingerprint")
    assert((hashes(1L) intersect hashes(3L)).isEmpty,
      "unrelated documents should not collide at 48-bit hashes")
    // density: distinct positions per doc ~ 2/(w+1) of gram count;
    // allow a generous band (random hashes, short docs)
    val grams3 = 40 - k + 1
    val n3 = fps.count(_.getLong(0) == 3L)
    assert(n3 >= grams3 / (w + 1) && n3 <= grams3,
      s"doc 3 selected $n3 of $grams3 grams — outside any plausible density")
    // every window must have a selected fingerprint within w of it:
    // consecutive selected positions can never be more than w apart
    val pos3 = fps.filter(_.getLong(0) == 3L).map(_.getLong(1)).sorted
    pos3.sliding(2).foreach {
      case Array(p, q) => assert(q - p <= w, s"gap $p..$q exceeds the window")
      case _ => ()
    }
    // id-derived, not layout-derived
    val again = TextOps.winnowing(df.repartition(7), "doc_id", "text", k, w)
      .orderBy("doc_id", "pos", "fp").collect().toSeq
    assert(fps.sortBy(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == again)
  }

  test("winnowPairs: copied-run pairs found, unrelated absent, hot-fp cap binds") {
    import spark.implicits._
    val run = (1 to 40).map(i => s"run$i").mkString(" ")
    val a = (1 to 30).map(i => s"alpha$i").mkString(" ") + " " + run
    val b = run + " " + (1 to 30).map(i => s"beta$i").mkString(" ")
    val c = (1 to 40).map(i => s"gamma$i").mkString(" ")
    // docs 10..29 all embed the SAME boilerplate run — its fingerprints
    // have df = 20, above a cap of 10, so boilerplate-only pairs vanish
    val boiler = (1 to 40).map(i => s"boiler$i").mkString(" ")
    val noisy = (10L until 30L).map(i =>
      (i, s"unique${i}a unique${i}b unique${i}c " + boiler))
    val df = (Seq((1L, a), (2L, b), (3L, c)) ++ noisy).toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(df, "doc_id", "text",
      minShared = 2L, maxDf = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the 40-word copied run must pair 1-2")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
    assert(!pairs.exists(p => p._1 >= 10L), s"boilerplate pairs survived the df cap: $pairs")
    // with the cap lifted the boilerplate clique pairs (the cap is the
    // only thing suppressing the O(df^2) blowup)
    val uncapped = TextOps.winnowPairs(df, "doc_id", "text",
      minShared = 2L, maxDf = 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)), "uncapped run should pair the clique")
    // artifact contract: pairs computed off a round-tripped published
    // fp table are IDENTICAL to the inline path (winnowPairs is now a
    // delegate, but the pin guards the parquet round-trip too)
    val fpPath = java.nio.file.Files.createTempDirectory("winnow_fps").toString
    TextOps.winnowing(df, "doc_id", "text")
      .write.mode("overwrite").parquet(fpPath)
    val viaArtifact = TextOps.winnowPairsFps(
      spark.read.parquet(fpPath), "doc_id", minShared = 2L, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArtifact == pairs, "artifact-path pairs must equal inline pairs")
  }

  test("lmScore: hand-computed bigram attestation, exact counts") {
    import spark.implicits._
    // reference (even ids): "a b c", "a b d"; targets (odd ids):
    // "a b c d" and a single-word doc that must score NO row
    val docs = Seq(
      (0L, "a b c"), (2L, "a b d"),
      (1L, "a b c d"), (3L, "x")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.lmScore(docs, "doc_id", "text").collect()
    assert(got.length == 1) // doc 3 has no bigram
    val r = got.head
    assert(r.getLong(0) == 1L)
    // doc 1 bigrams: (a,b) c12=2 hit; (b,c) c12=1 hit; (c,d) miss.
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("n_hits") == 2L)
    // every first word (a, b, c) is attested as a reference unigram
    assert(r.getAs[Long]("n_oov") == 0L)
    assert(r.getAs[Long]("evidence") == 3L) // 2 + 1 + 0
    assert(r.getAs[Double]("hit_ratio") == 2.0 / 3.0)
    // custom reference predicate flips the halves
    val flipped = graft.ops.TextOps.lmScore(docs, "doc_id", "text",
      refPred = (_, id) => pmod(col(id), lit(2L)) === 1)
    // now refs are "a b c d" and "x"; target doc 0: (a,b) hit, (b,c)
    // hit; doc 2: (a,b) hit, (b,d) miss
    val f = flipped.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("n_hits"), r.getAs[Long]("n_oov"))).toMap
    assert(f(0L) == ((2L, 0L)) && f(2L) == ((1L, 0L)))
  }

  test("snapshotDrift: exact cross-multiplied ranking, custom snapshot predicate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // snapshot 0 (even ids): 'stable' everywhere; snapshot 1 adds 'new'
    val docs = Seq(
      (0L, "stable stable alpha"), (2L, "stable beta"),
      (1L, "stable new new"), (3L, "new beta")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.snapshotDrift(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n0 = 5 tokens even, n1 = 5 odd; drift = |c0*n1 - c1*n0| = 5*|c0 - c1|
    val byTok = got.map(t => t._1 -> t._4).toMap
    assert(byTok("new") == 15L)    // c0=0, c1=3
    assert(byTok("stable") == 10L) // c0=3, c1=1
    assert(byTok("alpha") == 5L && byTok("beta") == 0L)
    // ranking is (drift desc, tok asc)
    assert(got.map(_._1).toSeq == Seq("new", "stable", "alpha", "beta"))
    // a custom snapshot predicate replaces the parity default
    val flipped = graft.ops.TextOps.snapshotDrift(docs, "doc_id", "text", k = 10,
        snapCol = (_, id) => when(col(id) < 2, 0L).otherwise(1L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // snap0={0,1}: n0=6 (stable:3, alpha:1, new:2); snap1={2,3}: n1=4
    // (stable:1, beta:2, new:1)
    assert(flipped("new") == 2L)    // |2*4 - 1*6|
    assert(flipped("beta") == 12L)  // |0*4 - 2*6|
    assert(flipped("stable") == 6L) // |3*4 - 1*6|
    assert(flipped("alpha") == 4L)  // |1*4 - 0*6|
  }

  test("spanExtents: maximal shared runs with exact offsets and lengths") {
    import spark.implicits._
    // doc 1 = tokens t0..t49; doc 2 carries t10..t29 (a 20-token run)
    // starting at its own offset 5, then unrelated tokens; doc 3 shares
    // nothing long enough
    val a = (0 until 50).map(i => s"t$i")
    val b = (0 until 5).map(i => s"x$i") ++ (10 until 30).map(i => s"t$i") ++
      (0 until 8).map(i => s"y$i")
    val c = (0 until 12).map(i => s"z$i")
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, c.mkString(" "))).toDF("doc_id", "text")
    val got = graft.ops.TextOps.spanExtents(docs, "doc_id", "text", minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // ONE maximal extent — never the 11 sub-runs its 10-grams span
    assert(got.toSeq == Seq((1L, 2L, 10L, 5L, 20L)))
    // a run shorter than minRun yields nothing
    val short = Seq((1L, a.mkString(" ")),
      (4L, ((0 until 9).map(i => s"t$i") ++ Seq("q")).mkString(" ")))
      .toDF("doc_id", "text")
    assert(graft.ops.TextOps.spanExtents(short, "doc_id", "text",
      minRun = 10).count() == 0)
    // within-doc repeats pair on BOTH diagonals: doc 5 contains the
    // run twice, so two extents are reported against doc 1
    val d = (10 until 22).map(i => s"t$i") ++ Seq("gap") ++
      (10 until 22).map(i => s"t$i")
    val rep = Seq((1L, a.mkString(" ")), (5L, d.mkString(" ")))
      .toDF("doc_id", "text")
    val got2 = graft.ops.TextOps.spanExtents(rep, "doc_id", "text", minRun = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got2 == Set((10L, 0L, 12L), (10L, 13L, 12L)))
    // scrub: doc 2's duplicated run (its tokens 5..24) is removed,
    // the lower-id copy in doc 1 survives untouched
    val scrub = graft.ops.TextOps.spanScrub(docs,
        graft.ops.TextOps.spanExtents(docs, "doc_id", "text", minRun = 10),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(scrub(1L) == (a.mkString(" "), 0L))
    assert(scrub(2L) == (((0 until 5).map(i => s"x$i") ++
      (0 until 8).map(i => s"y$i")).mkString(" "), 20L))
    assert(scrub(3L) == (c.mkString(" "), 0L))
    // the pair-restricted scale form equals the flat form on its pairs
    val pairs = Seq((2L, 1L)).toDF("a_id", "b_id") // un-canonical on purpose
    val viaPairs = graft.ops.TextOps.spanExtentsPairs(docs, pairs,
        "doc_id", "text", minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(viaPairs.toSeq == Seq((1L, 2L, 10L, 5L, 20L)))
    // a caller-supplied SELF-pair must yield nothing — without the
    // guard it would match every gram against itself on diagonal 0
    // and report the whole document as a shared extent
    val selfPairs = Seq((1L, 1L), (2L, 1L)).toDF("a_id", "b_id")
    val viaSelf = graft.ops.TextOps.spanExtentsPairs(docs, selfPairs,
        "doc_id", "text", minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSelf.toSeq == Seq((1L, 2L)))
    // the published-artifact round trip: spanGramIndex written to
    // parquet and probed back equals the direct form exactly — the
    // once-per-corpus publish contract the scale path depends on
    val idxPath = java.nio.file.Files
      .createTempDirectory("span_idx").toString + "/idx"
    graft.ops.TextOps.spanGramIndex(docs, "doc_id", "text", minRun = 10)
      .write.mode("overwrite").parquet(idxPath)
    val viaArtifact = graft.ops.TextOps.spanExtentsPairsIndexed(
        spark.read.parquet(idxPath), pairs, minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(viaArtifact.toSeq == viaPairs.toSeq)
  }

  test("spanScrub confirms extents against raw text before deleting") {
    import spark.implicits._
    // a fabricated extent (the shape a 48-bit fp collision produces at
    // corpus scale): doc 1 and doc 2 share NO text at those positions,
    // so scrub must refuse to delete — and the genuine extent beside
    // it must still apply
    val a = (0 until 50).map(i => s"t$i")
    val b = (0 until 5).map(i => s"x$i") ++ (10 until 30).map(i => s"t$i") ++
      (0 until 8).map(i => s"y$i")
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("doc_id", "text")
    val fabricated = Seq((1L, 2L, 30L, 25L, 8L)).toDF(
      "a_id", "b_id", "a_start", "b_start", "run_tokens")
    val s1 = graft.ops.TextOps.spanScrub(docs, fabricated, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s1 == Map(1L -> 0L, 2L -> 0L)) // nothing deleted
    val genuine = Seq((1L, 2L, 10L, 5L, 20L)).toDF(
      "a_id", "b_id", "a_start", "b_start", "run_tokens")
    val s2 = graft.ops.TextOps.spanScrub(docs,
        fabricated.union(genuine), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s2 == Map(1L -> 0L, 2L -> 20L)) // only the genuine extent fires
  }
}
