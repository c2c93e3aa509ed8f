package graft.core

/** Discrete Prolate Spheroidal Sequences (Slepian tapers) for the
  * multitaper PSD — completing `power_spectrum`'s psd_method set
  * (reference utils.py:127-177 delegates 'multitaper' to
  * mne.time_frequency.psd_array_multitaper).
  *
  * Construction (Percival & Walden §8.3, the published route mne/scipy
  * follow): the k-th taper is the k-th eigenvector of the symmetric
  * tridiagonal matrix
  *   T[t][t]   = ((n-1-2t)/2)^2 * cos(2*pi*W)
  *   T[t][t+1] = (t+1)(n-1-t)/2
  * with W = half_nbw / n; concentration ratios come from the quadrature
  * lambda_k = t_k' A t_k with A[i][j] = sin(2*pi*W(i-j))/(pi*(i-j)),
  * A[i][i] = 2W. Defaults mirror mne: half_nbw = 4, n_tapers =
  * 2*half_nbw - 1 = 7, low_bias keeps tapers with lambda > 0.9.
  *
  * SIZE-INDEPENDENT SOLVE (r3): the matrix is tridiagonal and only the top
  * n_tapers eigenpairs are needed, so instead of a dense O(n^2)-memory /
  * O(n^3)-time Jacobi the solver uses
  *  - Sturm-sequence bisection for the k largest eigenvalues (O(n) per
  *    bisection step; Golub & Van Loan §8.4),
  *  - inverse iteration with a partial-pivot tridiagonal solve for each
  *    eigenvector (O(n) per iteration),
  *  - concentration ratios via the Toeplitz identity
  *    lambda = 2W + sum_d 2 c_d sin(2 pi W d)/(pi d) with c_d the taper's
  *    autocorrelation, computed by FFT in O(n log n).
  * Total O(k n log n) time and O(n) memory per distinct length — epochs up
  * to MaxN (2^20, the engine's signal cap) are supported; the r2 dense
  * path allocated n^2 doubles and overflowed Int for n >= 46341.
  */
object Dpss {

  final case class Tapers(tapers: Array[Array[Double]], lambdas: Array[Double])

  /** Matches SignalOps.MaxSeqLen — the longest signal the engine builds. */
  val MaxN: Int = 1 << 20

  private val MaxCacheEntries = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double, Boolean), Tapers]

  def tapers(n: Int, halfNbw: Double = 4.0, lowBias: Boolean = true): Tapers = {
    require(n >= 4, s"multitaper needs at least 4 samples, got $n")
    require(n <= MaxN,
      s"multitaper supports epochs up to $MaxN samples (got $n); " +
        "use psd_method='welch' for longer signals")
    // bounded cache: tapers are keyed by distinct epoch length — a stream
    // of many lengths must not grow the map without bound
    if (cache.size() >= MaxCacheEntries) cache.clear()
    cache.computeIfAbsent((n, halfNbw, lowBias), _ => compute(n, halfNbw, lowBias))
  }

  private def compute(n: Int, halfNbw: Double, lowBias: Boolean): Tapers = {
    val nTapers = math.min(math.max(1, (2 * halfNbw).toInt - 1), n)
    val w = halfNbw / n
    val cos2piW = math.cos(2 * math.Pi * w)
    val diag = new Array[Double](n)
    val off = new Array[Double](math.max(n - 1, 0))
    var t = 0
    while (t < n) {
      val d = (n - 1 - 2.0 * t) / 2.0
      diag(t) = d * d * cos2piW
      if (t + 1 < n) off(t) = (t + 1) * (n - 1.0 - t) / 2.0
      t += 1
    }
    val vals = topEigenvalues(diag, off, nTapers) // descending
    val found = new scala.collection.mutable.ArrayBuffer[Array[Double]]
    val top = vals.zipWithIndex.map { case (lam, k) =>
      val v = eigenvector(diag, off, lam, k, found.toSeq)
      found += v
      // polarity convention: positive mean for symmetric tapers, positive
      // first nonzero otherwise (mne dpss_windows)
      var s = 0.0
      var i = 0
      while (i < n) { s += v(i); i += 1 }
      val flip =
        if (math.abs(s) > 1e-10) s < 0
        else {
          var j = 0
          while (j < n && v(j) == 0.0) j += 1
          j < n && v(j) < 0
        }
      if (flip) { var i2 = 0; while (i2 < n) { v(i2) = -v(i2); i2 += 1 } }
      v
    }
    val lambdas = top.map(concentration(_, w))
    if (!lowBias) Tapers(top, lambdas)
    else {
      val keep = lambdas.zipWithIndex.filter(_._1 > 0.9).map(_._2)
      val idx = if (keep.isEmpty) Array(0) else keep
      Tapers(idx.map(top), idx.map(lambdas))
    }
  }

  /** Number of eigenvalues of the tridiagonal (diag, off) strictly below x
    * — the Sturm sequence sign count with the standard underflow guard. */
  private def countBelow(diag: Array[Double], off: Array[Double],
                         x: Double): Int = {
    val n = diag.length
    var cnt = 0
    var d = 1.0
    var i = 0
    while (i < n) {
      val b2 = if (i == 0) 0.0 else off(i - 1) * off(i - 1)
      d = diag(i) - x - b2 / d
      if (d < 0) cnt += 1
      if (d == 0.0) d = -java.lang.Double.MIN_NORMAL
      i += 1
    }
    cnt
  }

  /** The k largest eigenvalues, descending, by bisection. */
  private def topEigenvalues(diag: Array[Double], off: Array[Double],
                             k: Int): Array[Double] = {
    val n = diag.length
    var lo = Double.MaxValue
    var hi = -Double.MaxValue
    var i = 0
    while (i < n) {
      val r = (if (i > 0) math.abs(off(i - 1)) else 0.0) +
        (if (i < n - 1) math.abs(off(i)) else 0.0)
      lo = math.min(lo, diag(i) - r)
      hi = math.max(hi, diag(i) + r)
      i += 1
    }
    val span = math.max(hi - lo, 1e-300)
    Array.tabulate(k) { j =>
      // eigenvalue with ascending 0-based index m = n-1-j:
      // inf { x : countBelow(x) >= m+1 }
      val m = n - 1 - j
      var a = lo
      var b = hi + span * 1e-12
      var it = 0
      while (it < 200 && (b - a) > 1e-15 * math.max(math.abs(a), math.abs(b))) {
        val mid = 0.5 * (a + b)
        if (countBelow(diag, off, mid) >= m + 1) b = mid else a = mid
        it += 1
      }
      0.5 * (a + b)
    }
  }

  /** Eigenvector by inverse iteration: partial-pivot LU solve of
    * (T - lam I) u = v, re-orthogonalized against already-found vectors
    * (defensive — the top DPSS eigenvalues are well separated). */
  private def eigenvector(diag: Array[Double], off: Array[Double],
                          lam: Double, k: Int,
                          prev: Seq[Array[Double]]): Array[Double] = {
    val n = diag.length
    // parity-matched start: the k-th Slepian has k sign changes, like the
    // k-th Dirichlet mode — guarantees a nonzero starting component
    var v = Array.tabulate(n)(i =>
      math.sin((i + 1.0) * (k + 1.0) * math.Pi / (n + 1.0)))
    normalize(v)
    var iter = 0
    while (iter < 4) {
      val u = solveShifted(diag, off, lam, v)
      prev.foreach { p =>
        var dot = 0.0
        var i = 0
        while (i < n) { dot += u(i) * p(i); i += 1 }
        i = 0
        while (i < n) { u(i) -= dot * p(i); i += 1 }
      }
      normalize(u)
      v = u
      iter += 1
    }
    v
  }

  private def normalize(v: Array[Double]): Unit = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < v.length) { v(i) *= inv; i += 1 }
  }

  /** Solve (T - lam I) x = b for tridiagonal T with partial pivoting
    * (Gaussian elimination with one fill-in superdiagonal — the shifted
    * system is near-singular by construction, so pivoting is mandatory). */
  private def solveShifted(diag: Array[Double], off: Array[Double],
                           lam: Double, b: Array[Double]): Array[Double] = {
    val n = diag.length
    val d = new Array[Double](n)      // main diagonal of U
    val u1 = new Array[Double](n)     // first superdiagonal of U
    val u2 = new Array[Double](n)     // second superdiagonal (pivot fill-in)
    val x = b.clone()
    var i = 0
    while (i < n) {
      d(i) = diag(i) - lam
      u1(i) = if (i < n - 1) off(i) else 0.0
      u2(i) = 0.0
      i += 1
    }
    i = 0
    while (i < n - 1) {
      // row i (possibly modified by step i-1): [a1, b1, c1] at cols i..i+2
      // row i+1 (untouched until now):        [a2, b2, c2] at cols i..i+2
      val a1 = d(i); val b1 = u1(i); val c1 = u2(i)
      val a2 = off(i); val b2 = d(i + 1)
      val c2 = if (i < n - 2) u1(i + 1) else 0.0
      if (math.abs(a2) > math.abs(a1)) {
        // pivot: swap the rows, then eliminate the (now) second row
        d(i) = a2; u1(i) = b2; u2(i) = c2
        val f = a1 / a2
        d(i + 1) = b1 - f * b2
        if (i < n - 2) u1(i + 1) = c1 - f * c2
        val xt = x(i); x(i) = x(i + 1); x(i + 1) = xt - f * x(i)
      } else {
        val piv = if (a1 == 0.0) 1e-300 else a1
        d(i) = piv
        val f = a2 / piv
        d(i + 1) = b2 - f * b1
        if (i < n - 2) u1(i + 1) = c2 - f * c1
        x(i + 1) -= f * x(i)
      }
      i += 1
    }
    // back substitution
    i = n - 1
    while (i >= 0) {
      var s = x(i)
      if (i < n - 1) s -= u1(i) * x(i + 1)
      if (i < n - 2) s -= u2(i) * x(i + 2)
      val pivot = if (d(i) == 0.0) 1e-300 else d(i)
      x(i) = s / pivot
      i -= 1
    }
    x
  }

  /** Concentration ratio lambda = v' A v with A the sinc kernel, computed
    * in O(n log n) via the Toeplitz identity: lambda = 2W c_0 +
    * sum_{d>=1} 2 c_d sin(2 pi W d)/(pi d), c_d = autocorrelation of v
    * (by zero-padded FFT). */
  private def concentration(v: Array[Double], w: Double): Double = {
    val n = v.length
    var m = 1
    while (m < 2 * n) m <<= 1
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    System.arraycopy(v, 0, re, 0, n)
    Fft.forward(re, im)
    var i = 0
    while (i < m) {
      re(i) = re(i) * re(i) + im(i) * im(i)
      im(i) = 0.0
      i += 1
    }
    Fft.inverse(re, im)
    var acc = 2.0 * w * re(0)
    var d = 1
    while (d < n) {
      acc += 2.0 * re(d) * math.sin(2 * math.Pi * w * d) / (math.Pi * d)
      d += 1
    }
    acc
  }
}
