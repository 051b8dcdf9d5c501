package graft.tsdb

/**
 * Prometheus 3.x NATIVE-histogram bucket layout (exponential schema):
 * base = 2^(2^−schema), bucket i covers (base^(i−1), base^i] in value
 * units. The default resolution here is schema = 3 (base = 2^(1/8),
 * ~9% relative resolution — the Prometheus default scrape
 * resolution); [[bucketsFor]] carries the SAME construction at any
 * schema in [0, 3] for mixed-fleet stores (per-series `schema` label,
 * aggregation downscales to the coarsest — see
 * [[Promql]]'s nb-vector aggregation). Buckets are carried as a `nb`
 * label family next to `count`/`sum`/`zero` arms (see
 * `graft.queries.TsQueries.nativeHistStoreChunks`).
 *
 * Two exactness rules make the layout oracle-reproducible:
 *
 *  - bucket ASSIGNMENT is integer-only: an observation of integer
 *    cents c lands in schema-s bucket i iff
 *    hi_cents(i−1) < c ≤ hi_cents(i) where
 *    hi_cents(i) = max{c : c^(2^s) ≤ 2^i · 100^(2^s)} — raising
 *    c/100 ≤ 2^(i/2^s) to the 2^s-th power clears the irrational
 *    base, so no float log ever decides an index and two engines can
 *    never disagree. The thresholds NEST across schemas
 *    (hi_cents_s(i) = hi_cents_{s+1}(2i)), which is what makes the
 *    downscale mapping i → ⌈i/2^Δ⌉ exact;
 *  - bucket BOUNDS for the one interpolation at quantile output are
 *    Math.pow(2, i/2^s) doubles over the exactly representable
 *    i/2^s; oracles embed these literals verbatim (Double
 *    round-trip), so both engines interpolate with bit-identical
 *    constants.
 *
 * Reference behavior studied from the public Prometheus docs/data
 * model (native histograms, schema/resolution, count/sum/zero arms,
 * downscale-to-coarsest on aggregation).
 */
object NativeHist {
  /** The default schema (resolution): base = 2^(2^−schema). */
  val Schema = 3

  /** (idx, lo_cents exclusive, hi_cents inclusive, lo/hi bound
    * doubles) at `schema`, restricted to buckets with a non-empty
    * cent range. The index range scales with resolution so every
    * schema covers the same value span (up to 2^13.5 ≈ 11585 —
    * past the scale corpus's [0, 10000) value domain; empty high
    * buckets cost nothing in sparse data-derived stores and never
    * shift an interpolation). */
  def bucketsFor(schema: Int): Seq[(Int, Long, Long, Double, Double)] = {
    require(schema >= 0 && schema <= 3, s"schema $schema outside [0, 3]")
    val p = 1 << schema // the exponent clearing the irrational base
    val T = BigInt(100).pow(p)
    def hiCents(i: Int): Long = {
      val shift = if (i < 0) -i else 0
      val rhs = (if (i > 0) BigInt(2).pow(i) else BigInt(1)) * T
      var lo = 0L; var hi = 1200000L
      while (lo < hi) {
        val m = (lo + hi + 1) / 2
        if ((BigInt(m).pow(p) << shift) <= rhs) lo = m else hi = m - 1
      }
      lo
    }
    // −60..108 at schema 3, scaled to the same value span elsewhere
    (-(60 * p) / 8 to (108 * p + 7) / 8).map { i =>
      (i, hiCents(i - 1), hiCents(i),
        math.pow(2, (i - 1).toDouble / p), math.pow(2, i.toDouble / p))
    }.filter(t => t._3 > t._2)
  }

  /** The default-schema bucket table (what single-schema stores and
    * their oracles share). */
  lazy val buckets: Seq[(Int, Long, Long, Double, Double)] = bucketsFor(Schema)

  /** Bound rows for the quantile interpolation at `schema`:
    * (nb, ord, lo, hi) — the `zero` arm sorts before every
    * exponential bucket and spans [0, 0] (zero-threshold 0: exact
    * zeros only), so a rank landing in it interpolates to exactly 0. */
  def boundRowsFor(schema: Int): Seq[(String, Int, Double, Double)] =
    ("zero", Int.MinValue, 0.0, 0.0) +:
      bucketsFor(schema).map(t => (t._1.toString, t._1, t._4, t._5))

  lazy val boundRows: Seq[(String, Int, Double, Double)] = boundRowsFor(Schema)

  /** Locate a SCALAR bound x for `histogram_fraction` at `schema`:
    * the ord of the bucket containing x and the intra-bucket linear
    * fraction — computed ONCE at compile time (the bound is a query
    * constant), so the cumulative F(x) needs only conditional integer
    * sums plus one multiply by this literal. x ≤ 0 lands on the zero
    * arm with fraction 1 (F = zero count); x in one of the gaps the
    * cent-empty filter left between kept buckets answers the
    * cumulative through every bucket entirely below it (fraction 0 of
    * the first kept bucket ABOVE the gap — no observation can land in
    * a cent-empty range, so the cumulative is exact there); x past
    * the enumerated table answers the full cumulative. */
  def locateAt(x: Double, schema: Int): (Int, Double) = {
    val bs = bucketsFor(schema)
    if (x <= 0) (Int.MinValue, 1.0)
    else bs.find(b => x > b._4 && x <= b._5) match {
      case Some((i, _, _, lod, hid)) => (i, (x - lod) / (hid - lod))
      case None =>
        // below the table, or inside a cent-empty gap: the first kept
        // bucket at-or-above x holds nothing below x, so (its ord, 0)
        // counts exactly the mass under x
        bs.find(x <= _._5).map(b => (b._1, 0.0))
          .getOrElse((Int.MaxValue, 0.0))
    }
  }

  def locate(x: Double): (Int, Double) = locateAt(x, Schema)
}
