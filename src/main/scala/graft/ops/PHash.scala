package graft.ops

/**
 * Perceptual image hash (pHash): 64-bit fingerprint of what an image
 * LOOKS like, stable under re-encoding, format conversion, and small
 * pixel perturbations — the image analogue of SimHash for text, and
 * the hash an image-dedup pipeline blocks on (byte-level hashes
 * change with any codec/metadata difference; pHash does not).
 *
 * Classic DCT construction (public domain, as popularized by the
 * pHash project and Zauner's thesis): grayscale → fixed 32×32
 * nearest-neighbor resample → 2-D DCT-II → the 8×8 low-frequency
 * block → one bit per coefficient, thresholded at the block's lower
 * median. Every step is deterministic (fixed loop order, integer
 * resample, precomputed cosine table), so the same pixels produce the
 * same 64 bits on every JVM regardless of the container format that
 * delivered them.
 */
object PHash {
  private final val N = 32
  // cos((2x+1)·u·π/(2N)) — precomputed, deterministic
  private val cosT: Array[Array[Double]] = Array.tabulate(N, N) { (u, x) =>
    Math.cos((2 * x + 1) * u * Math.PI / (2.0 * N))
  }

  /** 64-bit perceptual hash of a decoded image. */
  def phash(img: PngPixels.Image): Long = {
    // integer luminance (r+g+b; the scale cancels in the median
    // threshold), nearest-neighbor resample onto the fixed N×N grid
    val g = new Array[Double](N * N)
    var y = 0
    while (y < N) {
      val sy = y * img.height / N
      var x = 0
      while (x < N) {
        val sx = x * img.width / N
        val o = (sy * img.width + sx) * img.channels
        var lum = 0
        var c = 0
        val nc = math.min(img.channels, 3) // alpha never enters
        while (c < nc) { lum += img.pixels(o + c) & 0xFF; c += 1 }
        g(y * N + x) = lum.toDouble
        x += 1
      }
      y += 1
    }
    // separable 2-D DCT-II, low-frequency 8×8 block only: compute 8
    // output rows × 8 output cols, each a dot with the cosine table
    val block = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < N) {
          var rowDot = 0.0
          var xx = 0
          while (xx < N) { rowDot += g(yy * N + xx) * cosT(v)(xx); xx += 1 }
          s += rowDot * cosT(u)(yy)
          yy += 1
        }
        block(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    // threshold at the LOWER median (sorted index 31) of all 64
    // coefficients — strict '>' so exactly the above-median half sets
    // bits; deterministic with no float averaging
    val sorted = block.clone()
    java.util.Arrays.sort(sorted)
    val median = sorted(31)
    var h = 0L
    var i = 0
    while (i < 64) {
      if (block(i) > median) h |= (1L << i)
      i += 1
    }
    h
  }
}
