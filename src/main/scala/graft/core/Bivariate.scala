package graft.core

import NumKit._

/** The 5 bivariate (cross-channel) feature kernels, exact semantic ports of
  * /root/reference/mne_features/bivariate.py. Input: the epoch's channels
  * as an Array of equal-length signals.
  */
object Bivariate {

  /** Pair enumeration, `_idxiter` (reference utils.py:21-53): C-order upper
    * triangle, optionally with diagonal. */
  def pairs(n: Int, includeDiag: Boolean): Array[(Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        if (includeDiag || i != j) buf += ((i, j))
        j += 1
      }
      i += 1
    }
    buf.toArray
  }

  /** compute_max_cross_corr (bivariate.py:46-152): per pair, max over lags
    * tau in [-sfreq/2, sfreq/2) of |normalized cross-correlation|, each lag
    * normalized by (n - |tau|). */
  def maxCrossCorr(chans: Array[Array[Double]], sfreq: Double,
                   includeDiag: Boolean = false): Array[Double] = {
    val nTimes = chans(0).length
    val nTau = (0.5 * sfreq).toInt
    pairs(chans.length, includeDiag).map { case (k, l) =>
      val x = chans(k); val y = chans(l)
      var xm = 0.0; var ym = 0.0
      var j = 0
      while (j < nTimes) { xm += x(j); ym += y(j); j += 1 }
      xm /= nTimes; ym /= nTimes
      var xv = 0.0; var yv = 0.0
      j = 0
      while (j < nTimes) {
        xv += (x(j) - xm) * (x(j) - xm); yv += (y(j) - ym) * (y(j) - ym)
        j += 1
      }
      xv = math.sqrt(xv / (nTimes - 1)); yv = math.sqrt(yv / (nTimes - 1))
      var best = Double.NegativeInfinity
      var tau = -nTau
      while (tau < nTau) {
        val at = math.abs(tau)
        var cc = 0.0
        j = 0
        while (j < nTimes - at) {
          cc += ((x(j + at) - xm) / xv) * ((y(j) - ym) / yv)
          j += 1
        }
        cc /= (nTimes - at)
        val a = math.abs(cc)
        if (a > best) best = a
        tau += 1
      }
      best
    }
  }

  /** Analytic-signal phases via the Hilbert transform (scipy.signal.hilbert
    * convention: double positive freqs, keep DC and Nyquist). */
  def hilbertPhases(x: Array[Double]): Array[Double] = {
    val n = x.length
    val re = java.util.Arrays.copyOf(x, n)
    val im = new Array[Double](n)
    Fft.forward(re, im)
    // filter h: keep DC (and Nyquist when n even), double 1..ceil(n/2)-1,
    // zero the negative-frequency half
    var i = 1
    while (i < (n + 1) / 2) { re(i) *= 2; im(i) *= 2; i += 1 }
    var k = (n + 1) / 2 + (if (n % 2 == 0) 1 else 0)
    while (k < n) { re(k) = 0.0; im(k) = 0.0; k += 1 }
    Fft.inverse(re, im)
    Array.tabulate(n)(j => math.atan2(im(j), re(j)))
  }

  /** compute_phase_lock_val (bivariate.py:155-197):
    * PLV = |mean(exp(i(phi_x - phi_y)))|. */
  def phaseLockVal(chans: Array[Array[Double]],
                   includeDiag: Boolean = false): Array[Double] = {
    val phases = chans.map(hilbertPhases)
    pairs(chans.length, includeDiag).map { case (i, j) =>
      if (i == j) 1.0
      else {
        val px = phases(i); val py = phases(j)
        var cr = 0.0; var ci = 0.0
        var k = 0
        while (k < px.length) {
          val d = px(k) - py(k)
          cr += math.cos(d); ci += math.sin(d)
          k += 1
        }
        math.hypot(cr / px.length, ci / px.length)
      }
    }
  }

  /** Delay embedding rows (same layout/clamp as `_embed`, utils.py:56-88). */
  private def embed(x: Array[Double], d: Int, tauIn: Int): Array[Array[Double]] = {
    val tauMax = (x.length - 1) / (d - 1)
    val tau = math.min(tauIn, tauMax)
    val m = x.length - d * tau + tau
    Array.tabulate(m)(i => Array.tabulate(d)(k => x(i + k * tau)))
  }

  /** compute_nonlin_interdep (bivariate.py:200-266): S(X|Y) + S(Y|X) from
    * mean kNN squared-distance ratios; kNN includes self (distance 0). */
  def nonlinInterdep(chans: Array[Array[Double]], tau: Int = 2, emb: Int = 10,
                     nn: Int = 5, includeDiag: Boolean = false): Array[Double] = {
    pairs(chans.length, includeDiag).map { case (ci, cj) =>
      val ex = embed(chans(ci), emb, tau)
      val ey = embed(chans(cj), emb, tau)
      // kNN needs more embedding rows than neighbours (sklearn raises on
      // n_neighbors >= n_samples); NaN maps to SQL NULL in TokenBivariate
      if (ex.length <= nn || ey.length <= nn) Double.NaN
      else nonlinPair(ex, ey, nn)
    }
  }

  private def nonlinPair(ex: Array[Array[Double]], ey: Array[Array[Double]],
                         nn: Int): Double = {
    def sqdist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def knnIdx(e: Array[Array[Double]], k: Int): Array[Array[Int]] = {
      val m = e.length
      Array.tabulate(m) { i =>
        val ds = Array.tabulate(m)(j => (sqdist(e(i), e(j)), j))
        // stable by (distance, index) — sklearn kd_tree deterministic order
        ds.sortBy(t => (t._1, t._2)).take(k).map(_._2)
      }
    }
    {
      val idxX = knnIdx(ex, nn)
      val idxY = knnIdx(ey, nn)
      val m = ex.length
      var rx, rxy, ry, ryx = 0.0
      var j = 0
      while (j < m) {
        var k = 0
        while (k < nn) {
          rx += sqdist(ex(j), ex(idxX(j)(k)))
          rxy += sqdist(ex(j), ex(idxY(j)(k)))
          ry += sqdist(ey(j), ey(idxY(j)(k)))
          ryx += sqdist(ey(j), ey(idxX(j)(k)))
          k += 1
        }
        j += 1
      }
      rx / rxy + ry / ryx
    }
  }

  /** sklearn.preprocessing.scale(axis=0): per-time-point standardization
    * across channels, population std, zero-variance columns left centered. */
  private def scaleAcrossChannels(chans: Array[Array[Double]]): Array[Array[Double]] = {
    val nCh = chans.length
    val nT = chans(0).length
    val out = Array.fill(nCh)(new Array[Double](nT))
    var t = 0
    while (t < nT) {
      var m = 0.0
      var c = 0
      while (c < nCh) { m += chans(c)(t); c += 1 }
      m /= nCh
      var v = 0.0
      c = 0
      while (c < nCh) { val d = chans(c)(t) - m; v += d * d; c += 1 }
      v = math.sqrt(v / nCh)
      val s = if (v == 0.0) 1.0 else v
      c = 0
      while (c < nCh) { out(c)(t) = (chans(c)(t) - m) / s; c += 1 }
      t += 1
    }
    out
  }

  /** np.corrcoef over rows; zero-variance rows yield NaN like NumPy. */
  private def corrcoef(rows: Array[Array[Double]]): Array[Array[Double]] = {
    val n = rows.length
    val m = rows(0).length
    val means = rows.map(mean)
    val devs = rows.zip(means).map { case (r, mu) => r.map(_ - mu) }
    val norms = devs.map(d => math.sqrt(d.map(v => v * v).sum))
    Array.tabulate(n, n) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < m) { s += devs(i)(k) * devs(j)(k); k += 1 }
      s / (norms(i) * norms(j))
    }
  }

  /** compute_time_corr (bivariate.py:269-314): scale across channels ->
    * corrcoef -> upper-tri coefs (+ sorted |eigenvalues|). */
  def timeCorr(chans: Array[Array[Double]], withEigenvalues: Boolean = true,
               includeDiag: Boolean = false): Array[Double] =
    corrFeatures(scaleAcrossChannels(chans), withEigenvalues, includeDiag)

  /** compute_spect_corr (bivariate.py:331-396): same on per-channel PSDs.
    * psd_method default 'welch' matches the reference signature
    * (bivariate.py:334). */
  def spectCorr(chans: Array[Array[Double]], sfreq: Double,
                withEigenvalues: Boolean = true, includeDiag: Boolean = false,
                psdMethod: String = "welch"): Array[Double] = {
    val psds = chans.map(c => Psd.compute(c, sfreq, psdMethod).psd)
    corrFeatures(scaleAcrossChannels(psds), withEigenvalues, includeDiag)
  }

  private def corrFeatures(scaled: Array[Array[Double]], withEig: Boolean,
                           includeDiag: Boolean): Array[Double] = {
    val n = scaled.length
    val corr = corrcoef(scaled)
    val coefs = pairs(n, includeDiag).map { case (i, j) => corr(i)(j) }
    if (!withEig) coefs
    else {
      val flat = new Array[Double](n * n)
      for (i <- 0 until n; j <- 0 until n) flat(i * n + j) = corr(i)(j)
      val eig = Eig.symEigenvalues(flat, n).map(math.abs).sorted
      coefs ++ eig
    }
  }
}
