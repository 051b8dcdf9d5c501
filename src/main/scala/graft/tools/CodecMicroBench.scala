package graft.tools

import graft.core.GorillaCodec

/**
 * Single-thread codec microbenchmark — the apples-to-apples comparison
 * against the reference's native bit-packer (same workload shape as
 * reference examples/csv_to_packed.rs, scaled up): encode, decode, and
 * streaming-aggregate rates for one JVM thread, no Spark involved.
 * Usage: runMain graft.tools.CodecMicroBench [points]
 */
object CodecMicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(7200)
    val rounds = 200
    val header = 1700000000L / 7200 * 7200
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0
    var t = header
    while (i < n) {
      t += 1 + (i % 3)
      ts(i) = t
      vs(i) = 20.0 + math.rint(math.sin(i / 300.0) * 500) / 100.0
      i += 1
    }

    def bench(label: String)(f: () => Unit): Unit = {
      var r = 0
      while (r < 20) { f(); r += 1 } // warmup / JIT
      val t0 = System.nanoTime()
      r = 0
      while (r < rounds) { f(); r += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"CODEC $label%-14s ${n.toLong * rounds / dt / 1e6}%8.1f Mpts/s")
    }

    val chunk = GorillaCodec.encode(ts, vs, header)
    println(f"CODEC bytes/point  ${chunk.length.toDouble / n}%8.3f (raw 16)")
    bench("encode")(() => GorillaCodec.encode(ts, vs, header))
    bench("decode")(() => GorillaCodec.decode(chunk))
    bench("aggregate")(() => GorillaCodec.aggregate(chunk))
    // The production chunkify/aggregate shape: per-point HALF_UP
    // fixed-point sum alongside min/max. Round 5's BigDecimal rounding
    // regressed exactly this loop 121× while the rounds above stayed
    // flat — this round exists so a hot-loop rounding swap is visible
    // here before it ships.
    bench("agg-fixed")(() =>
      GorillaCodec.aggregate(chunk, fixedScale = 100.0, hasFixed = true))
    var statSink = 0L
    bench("stat-loop")(() => {
      var j = 0; var s = 0L
      var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
      while (j < n) {
        val v = vs(j)
        if (v < minV) minV = v
        if (v > maxV) maxV = v
        s += GorillaCodec.halfUpFixed(v * 100.0)
        j += 1
      }
      statSink ^= s
    })
    if (statSink == 42L) println("(sink)") // defeat dead-code elimination
    bench("encode-lt")(() => GorillaCodec.encode(ts, vs, header, leadTrail = true))
  }
}
