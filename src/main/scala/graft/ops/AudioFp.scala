package graft.ops

/**
 * Spectral audio fingerprint: a 64-bit clip-level hash built the
 * Haitsma–Kalker way (ISMIR'02, the scheme behind classic audio
 * matching systems) — energies in adjacent frequency bands, one bit
 * per SIGN of the adjacent-band energy difference. Signs of energy
 * ratios survive amplitude scaling, resampling containers, and small
 * noise, so perceptually-equal clips hash near each other while
 * byte-level hashes scatter — the audio analogue of [[PHash]] for
 * images and SimHash for text, and it blocks with the same banded
 * kernel.
 *
 * Implementation: channels mix to mono, one direct DFT over the whole
 * clip evaluated at 65 fixed fractional frequencies k/n (k = 1..65 —
 * bin 0, pure DC/offset, is skipped), bit b = E(b+1) > E(b).
 * Everything is a deterministic double loop in fixed order — same
 * samples, same 64 bits on any JVM.
 */
object AudioFp {
  def fingerprint(samples: Array[Short], channels: Int): Long = {
    val frames = samples.length / math.max(channels, 1)
    if (frames == 0) return 0L
    val mono = new Array[Double](frames)
    var i = 0
    while (i < frames) {
      var s = 0.0
      var c = 0
      while (c < channels) { s += samples(i * channels + c); c += 1 }
      mono(i) = s / channels
      i += 1
    }
    // 65 band energies at fixed fractional frequencies of the clip
    val e = new Array[Double](65)
    var k = 1
    while (k <= 65) {
      var re = 0.0
      var im = 0.0
      val w = 2.0 * Math.PI * k / frames
      var t = 0
      while (t < frames) {
        val ang = w * t
        re += mono(t) * Math.cos(ang)
        im -= mono(t) * Math.sin(ang)
        t += 1
      }
      e(k - 1) = re * re + im * im
      k += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (e(b + 1) > e(b)) h |= (1L << b)
      b += 1
    }
    h
  }
}
