package graft.core

/** Numeric primitives shared by all feature kernels.
  *
  * Summation discipline: strict left-to-right sequential accumulation
  * everywhere. Two parity contracts pin this down: (a) the reference
  * test-suite bar is assert_almost_equal decimal=7
  * (tests/test_univariate.py throughout) — sequential vs NumPy's pairwise
  * summation differ by ~1e-13 at our signal lengths, far under the bar;
  * (b) the engine's DuckDB correctness oracle accumulates list aggregates
  * sequentially in list order, so identical order here makes the gated
  * query outputs bit-identical pre-rounding (verified empirically,
  * tools/oracles.py). The reference's own numba loops (e.g. `_slope_lstsq`,
  * /root/reference/mne_features/univariate.py:77-105) are also
  * left-to-right.
  */
object NumKit {

  /** Sequential left-to-right sum (see summation-discipline note above). */
  def pairwiseSum(a: Array[Double], lo: Int, hi: Int): Double = {
    var s = 0.0
    var i = lo
    while (i < hi) { s += a(i); i += 1 }
    s
  }

  def pairwiseSum(a: Array[Double]): Double = pairwiseSum(a, 0, a.length)

  def mean(a: Array[Double]): Double = pairwiseSum(a) / a.length

  /** Two-pass sample variance, ddof configurable.
    * np.var(x, ddof=1) = pairwiseSum((x-mean)^2) / (n - ddof).
    */
  def variance(a: Array[Double], ddof: Int): Double = {
    val m = mean(a)
    val dev = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { val d = a(i) - m; dev(i) = d * d; i += 1 }
    pairwiseSum(dev) / (a.length - ddof)
  }

  def std(a: Array[Double], ddof: Int): Double = math.sqrt(variance(a, ddof))

  /** Central moment of order p (divides by n, like scipy.stats). */
  def centralMoment(a: Array[Double], p: Int): Double = {
    val m = mean(a)
    val dev = new Array[Double](a.length)
    var i = 0
    while (i < a.length) {
      var d = a(i) - m
      var acc = d
      var k = 1
      while (k < p) { acc *= d; k += 1 }
      dev(i) = acc
      i += 1
    }
    pairwiseSum(dev)/ a.length
  }

  /** First difference, x[i+1] - x[i]; length n-1. */
  def diff(a: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length - 1)
    var i = 0
    while (i < out.length) { out(i) = a(i + 1) - a(i); i += 1 }
    out
  }

  /** Slope of 1-D least squares regression; strict left-to-right sums,
    * porting `_slope_lstsq` (reference univariate.py:77-105). */
  def slopeLstsq(x: Array[Double], y: Array[Double]): Double = {
    val n = x.length
    var sx2 = 0.0; var sx = 0.0; var sy = 0.0; var sxy = 0.0
    var j = 0
    while (j < n) {
      sx2 += x(j) * x(j); sx += x(j); sxy += x(j) * y(j); sy += y(j)
      j += 1
    }
    (n * sxy - sx * sy) / (n * sx2 - sx * sx)
  }

  /** Natural log-gamma via the Lanczos approximation (g=7, n=9 published
    * coefficients). |rel err| < 1e-13 on x > 0.5; used by the Hurst
    * Anis-Lloyd correction (reference univariate.py:384-389) where only
    * the Gamma *ratio* matters, so we work in log space to dodge the
    * overflow the reference avoids with its n<=340 branch.
    */
  def lgamma(xIn: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (xIn < 0.5) {
      // reflection: Gamma(x)Gamma(1-x) = pi/sin(pi x)
      math.log(math.Pi / math.sin(math.Pi * xIn)) - lgamma(1.0 - xIn)
    } else {
      val x = xIn - 1.0
      var a = c(0)
      val t = x + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** np.quantile with the default linear interpolation:
    * h = (n-1)q, res = a[floor(h)] + frac(h) * (a[floor(h)+1] - a[floor(h)]).
    * `sorted` must be ascending.
    */
  def quantileSorted(sorted: Array[Double], q: Double): Double = {
    val n = sorted.length
    if (n == 1) return sorted(0)
    val h = (n - 1) * q
    val j = math.floor(h).toInt
    val g = h - j
    if (j >= n - 1) sorted(n - 1)
    else sorted(j) + g * (sorted(j + 1) - sorted(j))
  }
}
