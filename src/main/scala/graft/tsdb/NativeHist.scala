package graft.tsdb

/**
 * Prometheus 3.x NATIVE-histogram bucket layout (exponential schema):
 * base = 2^(2^−schema), bucket i covers (base^(i−1), base^i] in value
 * units. The default resolution here is schema = 3 (base = 2^(1/8),
 * ~9% relative resolution — the Prometheus default scrape
 * resolution); [[bucketsFor]] carries the SAME construction at any
 * schema in the FULL Prometheus exponential range [−4, 8] for
 * mixed-fleet stores (per-series `schema` label, aggregation
 * downscales to the coarsest — see [[Promql]]'s nb-vector
 * aggregation). Buckets are carried as a `nb` label family next to
 * `count`/`sum`/`zero` arms (see
 * `graft.queries.TsQueries.nativeHistStoreChunks`); NEGATIVE
 * observations land in the MIRRORED span (Prometheus native
 * histograms carry a negative bucket list symmetric to the positive
 * one): `nb = "n" + i` covers [−base^i, −base^(i−1)) — the mirror of
 * the positive bucket's (lo, hi], keeping every observation in
 * exactly one bucket.
 *
 * Two exactness rules make the layout oracle-reproducible:
 *
 *  - bucket ASSIGNMENT is integer-only: an observation of integer
 *    cents c > 0 lands in schema-s bucket i iff
 *    hi_cents(i−1) < c ≤ hi_cents(i) where
 *    hi_cents(i) = max{c : c^(2^s) ≤ 2^i · 100^(2^s)} — raising
 *    c/100 ≤ 2^(i/2^s) to the 2^s-th power clears the irrational
 *    base, so no float log ever decides an index and two engines can
 *    never disagree (at s < 0 the exponent i·2^|s| is an integer and
 *    the same inequality needs no root-clearing: p = 1). Negative
 *    cents use |c| against the same thresholds, tagged "n"+i. The
 *    thresholds NEST across the whole range
 *    (hi_cents_s(i) = hi_cents_{s+1}(2i)), which is what makes the
 *    downscale mapping i → ⌈i/2^Δ⌉ exact;
 *  - bucket BOUNDS for the one interpolation at quantile output are
 *    Math.pow(2, i/2^s) doubles over the exactly representable
 *    dyadic i/2^s (negated for the mirrored span); oracles embed
 *    these literals verbatim (Double round-trip), so both engines
 *    interpolate with bit-identical constants.
 *
 * Cumulation ORDER across the three span kinds: negative buckets
 * ascend in value as the index DESCENDS ([[negOrd]] = NegBase − i),
 * the zero arm sits at [[ZeroOrd]] above every negative ord, and
 * positive buckets use their index directly — one integer `ord`
 * column totally orders any store's buckets by value.
 *
 * Reference behavior studied from the public Prometheus docs/data
 * model (native histograms, schema/resolution −4..8, mirrored
 * negative spans, count/sum/zero arms, downscale-to-coarsest on
 * aggregation).
 */
object NativeHist {
  /** The default schema (resolution): base = 2^(2^−schema). */
  val Schema = 3

  /** The zero arm's cumulation ord: above every negative-span ord
    * ([[negOrd]] tops out near −2^30), below every positive index
    * (|i| ≤ ~3456 at schema 8). */
  val ZeroOrd: Int = -(1 << 29)

  private val NegBase: Int = -(1 << 30)

  /** Cumulation ord of the MIRRORED bucket "n"+i: larger i = more
    * negative values = earlier in value order. */
  def negOrd(i: Int): Int = NegBase - i

  private val cache =
    scala.collection.concurrent.TrieMap.empty[Int, Seq[(Int, Long, Long, Double, Double)]]

  /** (idx, lo_cents exclusive, hi_cents inclusive, lo/hi bound
    * doubles) at `schema`, restricted to buckets with a non-empty
    * cent range. The index range scales with resolution so every
    * schema covers the same value span (up to at least 2^13.5 ≈ 11585
    * — past the scale corpus's [0, 10000) value domain; empty high
    * buckets cost nothing in sparse data-derived stores and never
    * shift an interpolation). Each threshold is seeded from the
    * double 100·2^(i/2^s) and then corrected by the EXACT integer
    * inequality (a few steps at most — asserted), so the table is
    * integer-exact at every schema yet costs no per-index binary
    * search even at schema 8's ~5400 indices. Memoized per schema. */
  def bucketsFor(schema: Int): Seq[(Int, Long, Long, Double, Double)] =
    cache.getOrElseUpdate(schema, {
      require(schema >= -4 && schema <= 8,
        s"schema $schema outside the Prometheus exponential range [-4, 8]")
      val p = if (schema >= 0) 1 << schema else 1 // root-clearing exponent
      val q = if (schema < 0) 1 << -schema else 1 // index → integer exponent
      val T = BigInt(100).pow(p)
      def hiCents(i0: Int): Long = {
        val i = i0 * q // the cleared inequality: c^p · 2^max(−i,0) ≤ 2^max(i,0) · 100^p
        val shift = if (i < 0) -i else 0
        val rhs = (if (i > 0) BigInt(2).pow(i) else BigInt(1)) * T
        def ok(m: Long) = m >= 0 && (BigInt(m).pow(p) << shift) <= rhs
        val seed = math.max(0L, math.floor(100.0 * math.pow(2, i0.toDouble * q / p)).toLong)
        var c = math.max(0L, seed - 2)
        while (ok(c + 1)) c += 1
        while (c > 0 && !ok(c)) c -= 1
        require(math.abs(c - seed) <= 4,
          s"hiCents($i0) at schema $schema drifted ${c - seed} from its double seed")
        c
      }
      val idxLo = math.floor(-7.5 * math.pow(2, schema)).toInt
      val idxHi = math.ceil(13.5 * math.pow(2, schema)).toInt
      val his = (idxLo - 1 to idxHi).map(i => i -> hiCents(i)).toMap
      (idxLo to idxHi).map { i =>
        (i, his(i - 1), his(i),
          math.pow(2, (i - 1).toDouble * q / p), math.pow(2, i.toDouble * q / p))
      }.filter(t => t._3 > t._2)
    })

  /** The default-schema bucket table (what single-schema stores and
    * their oracles share). */
  lazy val buckets: Seq[(Int, Long, Long, Double, Double)] = bucketsFor(Schema)

  /** Bound rows for the quantile interpolation at `schema`:
    * (nb, ord, lo, hi) — mirrored negative-span rows first in ord
    * (bucket "n"+i spans [−hi, −lo), carried as bound pair
    * (−hi, −lo) so the one linear interpolation works unchanged),
    * then the `zero` arm spanning [0, 0] (zero-threshold 0: exact
    * zeros only — a rank landing in it interpolates to exactly 0),
    * then the positive buckets. Stores without negative observations
    * simply never join the "n" rows. */
  def boundRowsFor(schema: Int): Seq[(String, Int, Double, Double)] = {
    val pos = bucketsFor(schema)
    pos.map(t => (s"n${t._1}", negOrd(t._1), -t._5, -t._4)) ++
      Seq(("zero", ZeroOrd, 0.0, 0.0)) ++
      pos.map(t => (t._1.toString, t._1, t._4, t._5))
  }

  lazy val boundRows: Seq[(String, Int, Double, Double)] = boundRowsFor(Schema)

  /** Locate a SCALAR bound x for `histogram_fraction` at `schema`:
    * the ord of the bucket containing x and the intra-bucket linear
    * fraction — computed ONCE at compile time (the bound is a query
    * constant), so the cumulative F(x) needs only conditional integer
    * sums plus one multiply by this literal. x = 0 lands on the zero
    * arm with fraction 1 (F = all negative spans + the zero count);
    * x in one of the gaps the cent-empty filter left between kept
    * buckets answers the cumulative through every bucket entirely
    * below it (no observation can land in a cent-empty range, so the
    * cumulative is exact there); x past the enumerated table answers
    * the full cumulative; x below the table's most negative bound
    * answers 0. Negative x mirrors: the containing "n" bucket
    * interpolates on [−hi, −lo), a mirrored gap counts every more-
    * negative bucket in full. */
  def locateAt(x: Double, schema: Int): (Int, Double) = {
    val bs = bucketsFor(schema)
    if (x == 0) (ZeroOrd, 1.0)
    else if (x > 0) bs.find(b => x > b._4 && x <= b._5) match {
      case Some((i, _, _, lod, hid)) => (i, (x - lod) / (hid - lod))
      case None =>
        // below the table, or inside a cent-empty gap: the first kept
        // bucket at-or-above x holds nothing below x, so (its ord, 0)
        // counts exactly the mass under x
        bs.find(x <= _._5).map(b => (b._1, 0.0))
          .getOrElse((Int.MaxValue, 0.0))
    } else {
      val a = -x
      bs.find(b => a > b._4 && a <= b._5) match {
        case Some((i, _, _, lod, hid)) => (negOrd(i), (x + hid) / (hid - lod))
        case None =>
          // |x| in a cent-empty gap or below the table: the first kept
          // bucket at-or-above |x| mirrors to a span ENTIRELY ≤ x, so
          // (its neg ord, 1) counts it and everything more negative;
          // |x| past the table top: nothing lies below x → F = 0
          bs.find(a <= _._5).map(b => (negOrd(b._1), 1.0))
            .getOrElse((Int.MinValue, 0.0))
      }
    }
  }

  def locate(x: Double): (Int, Double) = locateAt(x, Schema)
}
