package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bivariate
import graft.gen.SplitMix64

/** Bivariate parity vs /root/reference/mne_features/tests/test_bivariate.py
  * oracles + structural/shape checks.
  */
class BivariateSpec extends AnyFunSuite {
  // data1 (test_bivariate.py:18-20): scaled copies -> corr +/-1
  val biv1: Array[Array[Double]] = Array(
    Array(0, -1, 1, 0, 1, 0, 1, 0),
    Array(0, -0.5, 0.5, 0, 0.5, 0, 0.5, 0),
    Array(0, -2, 2, 0, 2, 0, 2, 0))

  def close(a: Double, b: Double, tol: Double = 1e-7): Unit =
    assert(math.abs(a - b) <= tol, s"got $a expected $b")

  test("time_corr oracle (test_bivariate.py:24-32)") {
    // with eigenvalues, with diagonal: [1,1,-1,1,-1,1] ++ eig [0,0,3]
    val withDiag = Bivariate.timeCorr(biv1, withEigenvalues = true, includeDiag = true)
    val expDiag = Array(1.0, 1, -1, 1, -1, 1, 0, 0, 3)
    assert(withDiag.length == expDiag.length)
    withDiag.zip(expDiag).foreach { case (a, b) => close(a, b) }
    // without diagonal: [1,-1,-1] ++ [0,0,3]
    val noDiag = Bivariate.timeCorr(biv1, withEigenvalues = true, includeDiag = false)
    val expNo = Array(1.0, -1, -1, 0, 0, 3)
    noDiag.zip(expNo).foreach { case (a, b) => close(a, b) }
  }

  test("max_cross_corr: identical channels -> 1; shape n(n-1)/2") {
    val rng = new SplitMix64(21L)
    val x = Array.fill(64)(rng.nextGaussian())
    val out = Bivariate.maxCrossCorr(Array(x, x.clone(), x.map(_ * 2.0)), 64.0)
    assert(out.length == 3)
    // reference quirk: ddof=1 std but /(n-tau) normalization -> peak is
    // (n-1)/n for identical channels (bivariate.py:100-110)
    out.foreach(v => close(v, 63.0 / 64.0, 1e-9))
    // advanced copy y[j] = x[j+3]: the reference evaluates only |tau| lags
    // with x leading (bivariate.py:86-110), so the peak appears at tau=3
    val y = new Array[Double](64)
    System.arraycopy(x, 3, y, 0, 61); System.arraycopy(x, 0, y, 61, 3)
    val lagged = Bivariate.maxCrossCorr(Array(x, y), 64.0)
    assert(lagged(0) > 0.8, s"lagged peak ${lagged(0)}")
  }

  test("phase_lock_val: identical -> 1, shape, range") {
    val rng = new SplitMix64(22L)
    val x = Array.fill(128)(rng.nextGaussian())
    val z = Array.fill(128)(rng.nextGaussian())
    val out = Bivariate.phaseLockVal(Array(x, x.clone(), z))
    assert(out.length == 3)
    close(out(0), 1.0, 1e-9) // (0,1) identical
    out.foreach(v => assert(v >= 0 && v <= 1 + 1e-12))
  }

  test("nonlin_interdep: symmetric self-pair ~ 2 (S(X|X)=1 both ways)") {
    val rng = new SplitMix64(23L)
    val x = Array.fill(200)(rng.nextGaussian())
    val out = Bivariate.nonlinInterdep(Array(x, x.clone()), tau = 2, emb = 10, nn = 5)
    assert(out.length == 1)
    close(out(0), 2.0, 1e-9)
    val y = Array.fill(200)(rng.nextGaussian())
    val ind = Bivariate.nonlinInterdep(Array(x, y))
    assert(ind(0) > 0)
  }

  test("spect_corr: duplicated channel correlates at 1; scaled copies " +
    "degenerate to NaN rows exactly like np.corrcoef") {
    val rng = new SplitMix64(31L)
    val x = Array.fill(64)(rng.nextGaussian())
    val y = Array.fill(64)(rng.nextGaussian())
    val out = Bivariate.spectCorr(Array(x, y, x.clone()), sfreq = 64.0,
      withEigenvalues = false)
    // pairs order: (0,1), (0,2), (1,2); (0,2) is the duplicate pair
    close(out(1), 1.0, 1e-9)
    assert(math.abs(out(0)) < 1.0 && math.abs(out(2)) < 1.0)
    // scaled copies (exact powers of two): after per-column
    // standardization every row is a constant pattern except the exactly-
    // zero DC column, so correlations collapse to signs of (a_i - mean):
    // [+1, -1, -1] — same as NumPy on this input. The exactly-zero DC
    // argument only holds for the demeaned 'fft' PSD (the default is the
    // reference's 'welch', whose per-segment Hamming window leaks DC).
    val degenerate = Bivariate.spectCorr(biv1, sfreq = 8.0,
      withEigenvalues = false, psdMethod = "fft")
    close(degenerate(0), 1.0, 1e-9)
    close(degenerate(1), -1.0, 1e-9)
    close(degenerate(2), -1.0, 1e-9)
  }

  test("hilbert phases: pure cosine -> analytic phase ramp") {
    val n = 128
    val x = Array.tabulate(n)(k => math.cos(2 * math.Pi * 8 * k / n))
    val ph = Bivariate.hilbertPhases(x)
    // d(phase)/dt = 2*pi*8/n per sample (mod 2pi)
    val step = 2 * math.Pi * 8 / n
    var ok = 0
    for (i <- 1 until n) {
      var d = ph(i) - ph(i - 1)
      while (d < -math.Pi) d += 2 * math.Pi
      while (d > math.Pi) d -= 2 * math.Pi
      if (math.abs(d - step) < 1e-6) ok += 1
    }
    assert(ok > n - 3, s"phase ramp ok=$ok")
  }
}
