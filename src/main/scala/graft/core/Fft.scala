package graft.core

/** Complex FFT: iterative radix-2 for power-of-two sizes, Bluestein's
  * chirp-z algorithm otherwise. Double precision throughout, matching
  * np.fft semantics (unnormalized forward, 1/n inverse).
  *
  * Performance notes (hot path of the raw feature tier):
  * - twiddle factors are tabulated once per size (cos/sin arrays), not
  *   recomputed per butterfly — trig was ~90% of a naive transform;
  * - Bluestein scratch (4 arrays of the padded pow-2 size) and the chirp
  *   tables are kept in ThreadLocal caches: the per-row allocation churn
  *   otherwise throttles 32-thread executors on GC.
  *
  * Written from the textbook formulas (Cooley-Tukey / Bluestein); the
  * reference relies on np.fft.rfft (reference utils.py:166) and np.fft.fft
  * (reference univariate.py:67-69).
  */
object Fft {

  /** Per-thread twiddle cache: size -> (cos, sin) of length size/2. */
  private val twiddleCache = new ThreadLocal[java.util.HashMap[Integer, (Array[Double], Array[Double])]] {
    override def initialValue() = new java.util.HashMap()
  }

  private def twiddles(n: Int): (Array[Double], Array[Double]) = {
    val cache = twiddleCache.get()
    var t = cache.get(n)
    if (t == null) {
      val c = new Array[Double](n / 2)
      val s = new Array[Double](n / 2)
      var k = 0
      while (k < n / 2) {
        val ang = -2.0 * math.Pi * k / n
        c(k) = math.cos(ang)
        s(k) = math.sin(ang)
        k += 1
      }
      t = (c, s)
      if (cache.size > 64) cache.clear() // bound the per-thread cache
      cache.put(n, t)
    }
    t
  }

  /** In-place radix-2 Cooley-Tukey; n must be a power of two. */
  private def transformRadix2(re: Array[Double], im: Array[Double], n: Int): Unit = {
    if (n <= 1) return
    val levels = 31 - Integer.numberOfLeadingZeros(n)
    require(1 << levels == n, "radix-2 size must be a power of 2")
    val (cosT, sinT) = twiddles(n)
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
    // butterfly passes with tabulated twiddles
    var size = 2
    while (size <= n) {
      val half = size / 2
      val tablestep = n / size
      var base = 0
      while (base < n) {
        var j = base
        var k = 0
        while (j < base + half) {
          val wr = cosT(k)
          val wi = sinT(k)
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

  /** Forward DFT of arbitrary length (in place, arrays define n). */
  def forward(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n == 0) return
    if ((n & (n - 1)) == 0) transformRadix2(re, im, n)
    else bluestein(re, im)
  }

  /** Inverse DFT with 1/n normalization (np.fft.ifft semantics). */
  def inverse(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var i = 0
    while (i < n) { im(i) = -im(i); i += 1 }
    forward(re, im)
    i = 0
    while (i < n) { re(i) /= n; im(i) = -im(i) / n; i += 1 }
  }

  /** Per-thread Bluestein state: chirp tables per n + grow-only scratch. */
  private final class BluesteinState {
    var n: Int = -1
    var m: Int = 0
    var cosT: Array[Double] = _
    var sinT: Array[Double] = _
    var bre: Array[Double] = _ // pre-transformed chirp kernel
    var bim: Array[Double] = _
    var are: Array[Double] = new Array[Double](0)
    var aim: Array[Double] = new Array[Double](0)

    def prepare(nIn: Int): Unit = {
      var mm = 1
      while (mm < nIn * 2 + 1) mm *= 2
      if (are.length < mm) { are = new Array[Double](mm); aim = new Array[Double](mm) }
      if (n != nIn || m != mm) {
        // grow-only buffers: rebuilding tables costs trig + one m-FFT, but
        // allocates nothing once the high-water size is reached (variable
        // row lengths would otherwise churn ~300KB per row)
        if (cosT == null || cosT.length < nIn) {
          cosT = new Array[Double](nIn); sinT = new Array[Double](nIn)
        }
        if (bre == null || bre.length < mm) {
          bre = new Array[Double](mm); bim = new Array[Double](mm)
        }
        n = nIn
        m = mm
        var i = 0
        while (i < n) {
          val j = (i.toLong * i) % (n.toLong * 2)
          val ang = math.Pi * j / n
          cosT(i) = math.cos(ang)
          sinT(i) = math.sin(ang)
          i += 1
        }
        java.util.Arrays.fill(bre, 0, m, 0.0)
        java.util.Arrays.fill(bim, 0, m, 0.0)
        bre(0) = cosT(0); bim(0) = sinT(0)
        i = 1
        while (i < n) {
          bre(i) = cosT(i); bim(i) = sinT(i)
          bre(m - i) = cosT(i); bim(m - i) = sinT(i)
          i += 1
        }
        transformRadix2(bre, bim, m)
      } else {
        m = mm
      }
    }
  }

  private val blueCache = new ThreadLocal[BluesteinState] {
    override def initialValue() = new BluesteinState
  }

  /** Bluestein chirp-z: DFT of arbitrary n via convolution at 2^k >= 2n+1. */
  private def bluestein(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    val st = blueCache.get()
    st.prepare(n)
    val m = st.m
    val cosT = st.cosT; val sinT = st.sinT
    val are = st.are; val aim = st.aim
    java.util.Arrays.fill(are, 0, m, 0.0)
    java.util.Arrays.fill(aim, 0, m, 0.0)
    var i = 0
    while (i < n) {
      are(i) = re(i) * cosT(i) + im(i) * sinT(i)
      aim(i) = -re(i) * sinT(i) + im(i) * cosT(i)
      i += 1
    }
    transformRadix2(are, aim, m)
    val bre = st.bre; val bim = st.bim
    i = 0
    while (i < m) {
      val tr = are(i) * bre(i) - aim(i) * bim(i)
      aim(i) = aim(i) * bre(i) + are(i) * bim(i)
      are(i) = tr
      i += 1
    }
    // inverse of size m (power of 2), in place on the scratch
    i = 0
    while (i < m) { aim(i) = -aim(i); i += 1 }
    transformRadix2(are, aim, m)
    i = 0
    while (i < m) { are(i) /= m; aim(i) = -aim(i) / m; i += 1 }
    i = 0
    while (i < n) {
      re(i) = are(i) * cosT(i) + aim(i) * sinT(i)
      im(i) = -are(i) * sinT(i) + aim(i) * cosT(i)
      i += 1
    }
  }

  /** np.fft.rfft: one-sided spectrum of a real signal, n/2+1 bins. */
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
