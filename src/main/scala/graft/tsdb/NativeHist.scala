package graft.tsdb

/**
 * Prometheus 3.x NATIVE-histogram bucket layout (exponential schema):
 * base = 2^(2^−schema), bucket i covers (base^(i−1), base^i] in value
 * units. This engine fixes schema = 3 (base = 2^(1/8), ~9% relative
 * resolution — the Prometheus default scrape resolution) and carries
 * the buckets as a `nb` label family next to `count`/`sum`/`zero`
 * arms (see `graft.queries.TsQueries.nativeHistStoreChunks`).
 *
 * Two exactness rules make the layout oracle-reproducible:
 *
 *  - bucket ASSIGNMENT is integer-only: an observation of integer
 *    cents c lands in bucket i iff hi_cents(i−1) < c ≤ hi_cents(i)
 *    where hi_cents(i) = max{c : c⁸ ≤ 2^i · 10¹⁶} — raising
 *    c/100 ≤ 2^(i/8) to the 8th power clears the irrational base, so
 *    no float log ever decides an index and two engines can never
 *    disagree;
 *  - bucket BOUNDS for the one interpolation at quantile output are
 *    Math.pow(2, i/8.0) doubles over the exactly representable i/8.0;
 *    oracles embed these literals verbatim (Double round-trip), so
 *    both engines interpolate with bit-identical constants.
 *
 * Reference behavior studied from the public Prometheus docs/data
 * model (native histograms, schema/resolution, count/sum/zero arms).
 */
object NativeHist {
  /** The schema (resolution) parameter: base = 2^(2^−schema). */
  val Schema = 3

  /** (idx, lo_cents exclusive, hi_cents inclusive, lo/hi bound
    * doubles), restricted to buckets with a non-empty cent range. */
  lazy val buckets: Seq[(Int, Long, Long, Double, Double)] = {
    val T = BigInt(10).pow(16)
    def hiCents(i: Int): Long = {
      val shift = if (i < 0) -i else 0
      val rhs = (if (i > 0) BigInt(2).pow(i) else BigInt(1)) * T
      var lo = 0L; var hi = 300000L
      while (lo < hi) {
        val m = (lo + hi + 1) / 2
        if ((BigInt(m).pow(8) << shift) <= rhs) lo = m else hi = m - 1
      }
      lo
    }
    (-60 to 90).map { i =>
      (i, hiCents(i - 1), hiCents(i),
        math.pow(2, (i - 1) / 8.0), math.pow(2, i / 8.0))
    }.filter(t => t._3 > t._2)
  }

  /** Bound rows for the quantile interpolation: (nb, ord, lo, hi) —
    * the `zero` arm sorts before every exponential bucket and spans
    * [0, 0] (zero-threshold 0: exact zeros only), so a rank landing
    * in it interpolates to exactly 0. */
  lazy val boundRows: Seq[(String, Int, Double, Double)] =
    ("zero", Int.MinValue, 0.0, 0.0) +:
      buckets.map(t => (t._1.toString, t._1, t._4, t._5))

  /** Locate a SCALAR bound x for `histogram_fraction`: the ord of the
    * bucket containing x and the intra-bucket linear fraction —
    * computed ONCE at compile time (the bound is a query constant),
    * so the cumulative F(x) needs only conditional integer sums plus
    * one multiply by this literal. x ≤ 0 lands on the zero arm with
    * fraction 1 (F = zero count); x past the enumerated table answers
    * the full cumulative. */
  def locate(x: Double): (Int, Double) =
    if (x <= 0) (Int.MinValue, 1.0)
    else buckets.find(b => x > b._4 && x <= b._5) match {
      case Some((i, _, _, lod, hid)) => (i, (x - lod) / (hid - lod))
      case None if x <= buckets.head._4 => (buckets.head._1, 0.0)
      case None => (Int.MaxValue, 0.0)
    }
}
