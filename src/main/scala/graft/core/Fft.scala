package graft.core

/** Complex FFT: iterative radix-2 for power-of-two sizes, Bluestein's
  * chirp-z algorithm otherwise. Double precision throughout, matching
  * np.fft semantics (unnormalized forward, 1/n inverse).
  *
  * Written from the textbook formulas (Cooley-Tukey / Bluestein); the
  * reference relies on np.fft.rfft (reference utils.py:166) and np.fft.fft
  * (reference univariate.py:67-69).
  */
object Fft {

  /** In-place radix-2 Cooley-Tukey; n must be a power of two. */
  private def transformRadix2(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    var levels = 31 - Integer.numberOfLeadingZeros(n)
    require(1 << levels == n, "radix-2 size must be a power of 2")
    // bit-reversal permutation
    var i = 0
    while (i < n) {
      val j = Integer.reverse(i) >>> (32 - levels)
      if (j > i) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    // butterfly passes
    var size = 2
    while (size <= n) {
      val half = size / 2
      val tablestep = n / size
      var base = 0
      while (base < n) {
        var j = base
        var k = 0
        while (j < base + half) {
          val ang = -2.0 * math.Pi * k / n
          val wr = math.cos(ang)
          val wi = math.sin(ang)
          val l = j + half
          val tr = re(l) * wr - im(l) * wi
          val ti = re(l) * wi + im(l) * wr
          re(l) = re(j) - tr
          im(l) = im(j) - ti
          re(j) += tr
          im(j) += ti
          j += 1
          k += tablestep
        }
        base += size
      }
      size *= 2
    }
  }

  /** Forward DFT of arbitrary length (in place). */
  def forward(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n == 0) return
    if ((n & (n - 1)) == 0) transformRadix2(re, im)
    else bluestein(re, im)
  }

  /** Inverse DFT with 1/n normalization (np.fft.ifft semantics). */
  def inverse(re: Array[Double], im: Array[Double]): Unit = {
    // conj -> forward -> conj, scale 1/n
    val n = re.length
    var i = 0
    while (i < n) { im(i) = -im(i); i += 1 }
    forward(re, im)
    i = 0
    while (i < n) { re(i) /= n; im(i) = -im(i) / n; i += 1 }
  }

  /** Bluestein chirp-z: DFT of arbitrary n via convolution at size 2^k >= 2n+1. */
  private def bluestein(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var m = 1
    while (m < n * 2 + 1) m *= 2
    val cosT = new Array[Double](n)
    val sinT = new Array[Double](n)
    var i = 0
    while (i < n) {
      // angle = pi * i^2 / n, computed mod 2n to keep precision
      val j = (i.toLong * i) % (n.toLong * 2)
      val ang = math.Pi * j / n
      cosT(i) = math.cos(ang)
      sinT(i) = math.sin(ang)
      i += 1
    }
    val are = new Array[Double](m)
    val aim = new Array[Double](m)
    i = 0
    while (i < n) {
      are(i) = re(i) * cosT(i) + im(i) * sinT(i)
      aim(i) = -re(i) * sinT(i) + im(i) * cosT(i)
      i += 1
    }
    val bre = new Array[Double](m)
    val bim = new Array[Double](m)
    bre(0) = cosT(0); bim(0) = sinT(0)
    i = 1
    while (i < n) {
      bre(i) = cosT(i); bim(i) = sinT(i)
      bre(m - i) = cosT(i); bim(m - i) = sinT(i)
      i += 1
    }
    // circular convolution via radix-2 FFT
    transformRadix2(are, aim)
    transformRadix2(bre, bim)
    i = 0
    while (i < m) {
      val tr = are(i) * bre(i) - aim(i) * bim(i)
      aim(i) = aim(i) * bre(i) + are(i) * bim(i)
      are(i) = tr
      i += 1
    }
    // inverse of size m (power of 2)
    i = 0
    while (i < m) { aim(i) = -aim(i); i += 1 }
    transformRadix2(are, aim)
    i = 0
    while (i < m) { are(i) /= m; aim(i) = -aim(i) / m; i += 1 }
    i = 0
    while (i < n) {
      re(i) = are(i) * cosT(i) + aim(i) * sinT(i)
      im(i) = -are(i) * sinT(i) + aim(i) * cosT(i)
      i += 1
    }
  }

  /** np.fft.rfft: one-sided spectrum of a real signal, n/2+1 bins.
    * Returns (re, im) arrays of length n/2+1.
    */
  def rfft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = java.util.Arrays.copyOf(x, n)
    val im = new Array[Double](n)
    forward(re, im)
    val half = n / 2 + 1
    (java.util.Arrays.copyOf(re, half), java.util.Arrays.copyOf(im, half))
  }

  /** np.fft.rfftfreq(n, d): [0, 1, ..., n/2] / (d*n). */
  def rfftfreq(n: Int, d: Double): Array[Double] = {
    val half = n / 2 + 1
    val out = new Array[Double](half)
    var i = 0
    while (i < half) { out(i) = i / (d * n); i += 1 }
    out
  }
}
