package graft.core

import NumKit._

/** PSD estimation config threaded through the spectral family
  * (psd_method + the reference's welch_* psd_params + multitaper knobs). */
final case class PsdConf(method: String = "fft", nFft: Int = 256,
                         nPerSeg: Int = -1, nOverlap: Int = 0,
                         mtHalfNbw: Double = 4.0, mtLowBias: Boolean = true,
                         mtAdaptive: Boolean = false) {
  def spectrum(x: Array[Double], sfreq: Double): Psd.Spectrum =
    Psd.compute(x, sfreq, method, welchNFft = nFft, welchNPerSeg = nPerSeg,
      welchNOverlap = nOverlap, mtHalfNbw = mtHalfNbw, mtLowBias = mtLowBias,
      mtAdaptive = mtAdaptive)
}

/** The 28 univariate per-epoch feature kernels, each an exact semantic port
  * of its reference counterpart in /root/reference/mne_features/univariate.py
  * (file:line cited per function). Pure Scala over Array[Double]; zero Spark
  * dependencies so every kernel is unit-testable against the reference
  * test-suite oracle values (tests/test_univariate.py).
  */
object Features {

  // ---- simple moments (univariate.py:151-276) -----------------------------

  /** univariate.py:151-166 */
  def meanF(x: Array[Double]): Double = mean(x)

  /** np.var(ddof=1), univariate.py:169-184 */
  def varianceF(x: Array[Double]): Double = variance(x, 1)

  /** univariate.py:187-202 */
  def stdF(x: Array[Double]): Double = std(x, 1)

  /** np.ptp, univariate.py:205-220 */
  def ptpAmp(x: Array[Double]): Double = {
    var mn = x(0); var mx = x(0); var i = 1
    while (i < x.length) {
      if (x(i) < mn) mn = x(i)
      if (x(i) > mx) mx = x(i)
      i += 1
    }
    mx - mn
  }

  /** scipy.stats.skew — biased g1 = m3 / m2^1.5 (univariate.py:223-239). */
  def skewness(x: Array[Double]): Double = {
    val m2 = centralMoment(x, 2)
    val m3 = centralMoment(x, 3)
    m3 / math.pow(m2, 1.5)
  }

  /** scipy.stats.kurtosis(fisher=False) — Pearson m4/m2^2
    * (univariate.py:242-258). */
  def kurtosis(x: Array[Double]): Double = {
    val m2 = centralMoment(x, 2)
    val m4 = centralMoment(x, 4)
    m4 / (m2 * m2)
  }

  /** univariate.py:261-276 */
  def rms(x: Array[Double]): Double = {
    val sq = new Array[Double](x.length)
    var i = 0
    while (i < x.length) { sq(i) = x(i) * x(i); i += 1 }
    math.sqrt(pairwiseSum(sq) / x.length)
  }

  /** np.quantile, linear interpolation; multi-q raveled per-channel-then-q
    * (univariate.py:279-314). */
  def quantiles(x: Array[Double], qs: Array[Double]): Array[Double] = {
    val sorted = java.util.Arrays.copyOf(x, x.length)
    java.util.Arrays.sort(sorted)
    qs.map(q => quantileSorted(sorted, q))
  }

  // ---- Hurst exponent (univariate.py:317-422) -----------------------------

  /** Running sample std (ddof=1) prefix scan, `_accumulate_std`
    * (univariate.py:110-125): r(0)=0, r(j) = sqrt(sum_k (x_k - m_j)^2 / j). */
  private def accumulateStd(x: Array[Double]): Array[Double] = {
    val n = x.length
    val r = new Array[Double](n)
    var j = 1
    while (j < n) {
      var m = 0.0
      var k = 0
      while (k <= j) { m += x(k); k += 1 }
      m /= (j + 1)
      var s = 0.0
      k = 0
      while (k <= j) { val d = x(k) - m; s += d * d; k += 1 }
      s /= j
      r(j) = math.sqrt(s)
      j += 1
    }
    r
  }

  /** R/S values for one split matrix row set, `_hurst_exp_compute_rs`
    * (univariate.py:317-351). Input: d consecutive blocks of length nb. */
  private def hurstRs(x: Array[Double], d: Int, nb: Int): Array[Double] = {
    val out = new Array[Double](d * (nb - 1))
    var j = 0
    while (j < d) {
      val off = j * nb
      var m = 0.0
      var k = 0
      while (k < nb) { m += x(off + k); k += 1 }
      m /= nb
      val z = new Array[Double](nb)
      z(0) = x(off) - m
      k = 1
      while (k < nb) { z(k) = z(k - 1) + (x(off + k) - m); k += 1 }
      // accumulate max/min of z
      val sub = new Array[Double](nb)
      System.arraycopy(x, off, sub, 0, nb)
      val s = accumulateStd(sub)
      var zmax = z(0); var zmin = z(0)
      k = 1
      while (k < nb) {
        if (z(k) >= zmax) zmax = z(k)
        if (z(k) <= zmin) zmin = z(k)
        val r = zmax - zmin
        out(j * (nb - 1) + (k - 1)) = if (s(k) == 0.0) Double.NaN else r / s(k)
        k += 1
      }
      j += 1
    }
    out
  }

  /** `_hurst_exp_helper` + `compute_hurst_exp` (univariate.py:354-422):
    * 20 log2-spaced split lengths in [2^4, n/2], per-split mean R/S with the
    * Anis-Lloyd correction, slope of log(splits) vs corrected log(mean R/S).
    */
  def hurstExp(x: Array[Double]): Double = {
    val nTimes = x.length
    val nSplits = 20
    // np.logspace(4, log2(n/2), 20, base=2) -> floor -> unique
    val stop = math.log(nTimes / 2.0) / math.log(2.0)
    val raw = Array.tabulate(nSplits) { i =>
      val e = 4.0 + (stop - 4.0) * i / (nSplits - 1)
      math.floor(math.pow(2.0, e))
    }
    val splits = raw.map(_.toInt).distinct.sorted
    val reg = new Array[Double](splits.length)
    var j = 0
    while (j < splits.length) {
      val nb = splits(j)
      val d = nTimes / nb
      val rs = hurstRs(x, d, nb).filter(v => !v.isNaN)
      reg(j) = math.log(mean(rs))
      var s = 0.0
      var i = 1
      while (i < nb) { s += math.sqrt((nb - i).toDouble / i); i += 1 }
      s *= (nb - 0.5) / nb
      // Anis-Lloyd: gamma ratio in log space (see NumKit.lgamma note)
      val corr =
        if (nb <= 340)
          math.exp(lgamma((nb - 1) / 2.0) - lgamma(nb / 2.0)) / math.sqrt(math.Pi) * s
        else
          ((nb - 0.5) / nb) * (1.0 / math.sqrt(math.Pi * nb / 2.0)) * s
      reg(j) -= math.log(corr) - math.log(nb.toDouble) / 2.0
      j += 1
    }
    slopeLstsq(splits.map(v => math.log(v.toDouble)), reg)
  }

  // ---- approximate / sample entropy (univariate.py:425-549) ---------------

  /** Chebyshev radius counts over the delay embedding (dim = emb, tau = 1);
    * KDTree.query_radius is inclusive (dist <= r) and counts self. */
  private def chebyshevCounts(x: Array[Double], emb: Int, r: Double): Array[Int] = {
    val m = x.length - emb + 1
    val counts = new Array[Int](m)
    var i = 0
    while (i < m) {
      var c = 0
      var j = 0
      while (j < m) {
        var maxd = 0.0
        var k = 0
        while (k < emb && maxd <= r) {
          val d = math.abs(x(i + k) - x(j + k))
          if (d > maxd) maxd = d
          k += 1
        }
        if (maxd <= r) c += 1
        j += 1
      }
      counts(i) = c
      i += 1
    }
    counts
  }

  /** compute_app_entropy (univariate.py:452-513, approximate=True):
    * r = 0.2 * std(ddof=1); AppEn = phi(emb) - phi(emb+1),
    * phi = mean(log(count / n_rows)). */
  def appEntropy(x: Array[Double], emb: Int = 2): Double = {
    val r = 0.2 * std(x, 1)
    val c1 = chebyshevCounts(x, emb, r)
    val n1 = c1.length
    val c2 = chebyshevCounts(x, emb + 1, r)
    val n2 = c2.length
    val phi0 = mean(c1.map(c => math.log(c.toDouble / n1)))
    val phi1 = mean(c2.map(c => math.log(c.toDouble / n2)))
    phi0 - phi1
  }

  /** compute_samp_entropy (univariate.py:466-478, 516-549): the emb-dim
    * embedding drops its last row; counts exclude self; SampEn =
    * -log(phi1 / phi0); NaN when either phi ~ 0 (reference raises). */
  def sampEntropy(x: Array[Double], emb: Int = 2): Double = {
    val r = 0.2 * std(x, 1)
    val m1Full = x.length - emb + 1
    val m1 = m1Full - 1 // emb_data1[:-1]
    val c1 = {
      // counts within the truncated set
      val counts = new Array[Int](m1)
      var i = 0
      while (i < m1) {
        var c = 0
        var j = 0
        while (j < m1) {
          var maxd = 0.0
          var k = 0
          while (k < emb && maxd <= r) {
            val d = math.abs(x(i + k) - x(j + k))
            if (d > maxd) maxd = d
            k += 1
          }
          if (maxd <= r) c += 1
          j += 1
        }
        counts(i) = c
        i += 1
      }
      counts
    }
    val c2 = chebyshevCounts(x, emb + 1, r)
    val m2 = c2.length
    val phi0 = mean(c1.map(c => (c - 1).toDouble / (m1 - 1)))
    val phi1 = mean(c2.map(c => (c - 1).toDouble / (m2 - 1)))
    if (math.abs(phi0) < 1e-12 || math.abs(phi1) < 1e-12) Double.NaN
    else -math.log(phi1 / phi0)
  }

  // ---- autocorrelation / decorrelation time (univariate.py:49-72, 552-587)

  /** `_unbiased_autocorr`: FFT-based ACF, unbiased normalization, first
    * lags+1 values normalized by acf[0]. */
  def unbiasedAutocorr(x: Array[Double], lags: Int = 50): Array[Double] = {
    val n = x.length
    val m = mean(x)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = x(i) - m; i += 1 }
    Fft.forward(re, im)
    i = 0
    while (i < n) {
      val p = re(i) * re(i) + im(i) * im(i)
      re(i) = p; im(i) = 0.0
      i += 1
    }
    Fft.inverse(re, im)
    val take = math.min(lags + 1, n)
    val acf = new Array[Double](take)
    i = 0
    while (i < take) { acf(i) = re(i) / (n - i); i += 1 } // dnorm[n-1+i] = n-i
    val a0 = acf(0)
    i = 0
    while (i < take) { acf(i) /= a0; i += 1 }
    acf
  }

  /** compute_decorr_time (univariate.py:552-587): index of the first sign
    * change of the unbiased ACF / sfreq, or -1. */
  def decorrTime(x: Array[Double], sfreq: Double): Double = {
    val acf = unbiasedAutocorr(x)
    var i = 0
    while (i < acf.length - 1) {
      if (math.signum(acf(i + 1)) != math.signum(acf(i))) return (i + 1) / sfreq
      i += 1
    }
    -1.0
  }

  // ---- spectral family ----------------------------------------------------

  /** Enumerate ordered frequency-band pairs like `_idxiter`
    * (utils.py:21-53): triu=false -> all i != j (row-major upper then the
    * mirrored lower per row); triu=true -> i < j only. */
  def idxPairs(n: Int, triu: Boolean): Array[(Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    if (triu) {
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { buf += ((i, j)); j += 1 }; i += 1 }
    } else {
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { if (i != j) buf += ((i, j)); j += 1 }
        i += 1
      }
    }
    buf.toArray
  }

  /** compute_pow_freq_bands (univariate.py:629-748): band sums over
    * inclusive [lo, hi] bins, optional total-power normalize, optional
    * 10*log10, optional ratio block. Returns powers ++ ratios per the
    * `ratios` mode (null/"all"/"only"). */
  def powFreqBands(x: Array[Double], sfreq: Double,
                   bands: Array[(Double, Double)], normalize: Boolean,
                   ratios: Option[String], ratiosTriu: Boolean,
                   psdMethod: String, logOut: Boolean,
                   psd: PsdConf = PsdConf()): Array[Double] = {
    val sp = psd.copy(method = psdMethod).spectrum(x, sfreq)
    val nb = bands.length
    val pow = new Array[Double](nb)
    var j = 0
    while (j < nb) {
      var s = 0.0
      var i = 0
      while (i < sp.freqs.length) {
        if (sp.freqs(i) >= bands(j)._1 && sp.freqs(i) <= bands(j)._2) s += sp.psd(i)
        i += 1
      }
      pow(j) = s
      j += 1
    }
    if (normalize) {
      val tot = pairwiseSum(sp.psd)
      j = 0
      while (j < nb) { pow(j) /= tot; j += 1 }
    }
    if (logOut) {
      j = 0
      while (j < nb) { pow(j) = 10.0 * math.log10(pow(j)); j += 1 }
    }
    ratios match {
      case None => pow
      case Some(mode) =>
        val pairs = idxPairs(nb, ratiosTriu)
        val rat = pairs.map { case (i, jj) =>
          if (logOut) pow(i) - pow(jj) else pow(i) / pow(jj)
        }
        if (mode == "only") rat else pow ++ rat
    }
  }

  /** compute_hjorth_mobility_spect (univariate.py:785-836): sum(psd * f^2),
    * optionally / sum(psd). */
  def hjorthMobilitySpect(x: Array[Double], sfreq: Double, normalize: Boolean,
                          psdMethod: String, psd: PsdConf = PsdConf()): Double =
    hjorthSpectMoment(x, sfreq, normalize, psdMethod, 2, psd)

  /** compute_hjorth_complexity_spect (univariate.py:839-890): f^4 weights. */
  def hjorthComplexitySpect(x: Array[Double], sfreq: Double, normalize: Boolean,
                            psdMethod: String, psd: PsdConf = PsdConf()): Double =
    hjorthSpectMoment(x, sfreq, normalize, psdMethod, 4, psd)

  private def hjorthSpectMoment(x: Array[Double], sfreq: Double,
                                normalize: Boolean, psdMethod: String,
                                pw: Int, psd: PsdConf = PsdConf()): Double = {
    val sp = psd.copy(method = psdMethod).spectrum(x, sfreq)
    val terms = new Array[Double](sp.psd.length)
    var i = 0
    while (i < terms.length) {
      terms(i) = sp.psd(i) * math.pow(sp.freqs(i), pw)
      i += 1
    }
    val s = pairwiseSum(terms)
    if (normalize) s / pairwiseSum(sp.psd) else s
  }

  /** compute_spect_entropy (univariate.py:1122-1163): Shannon entropy
    * (log2) of psd[1:] normalized by the FULL total (DC excluded from the
    * entropy sum but included in the normalizer). */
  def spectEntropy(x: Array[Double], sfreq: Double, psdMethod: String,
                   psd: PsdConf = PsdConf()): Double = {
    val sp = psd.copy(method = psdMethod).spectrum(x, sfreq)
    val m = pairwiseSum(sp.psd)
    val terms = new Array[Double](sp.psd.length - 1)
    var i = 1
    while (i < sp.psd.length) {
      val p = sp.psd(i) / m
      terms(i - 1) = p * (math.log(p) / math.log(2.0))
      i += 1
    }
    -pairwiseSum(terms)
  }

  /** compute_spect_slope (univariate.py:1199-1281): OLS of log10(psd) on
    * log10(freqs) over [fmin, fmax]; returns [intercept, slope, MSE, R2]
    * (R2 = explained_variance_score = 1 - var(resid)/var(y)). */
  def spectSlope(x: Array[Double], sfreq: Double, fmin: Double, fmax: Double,
                 psdMethod: String, psd: PsdConf = PsdConf()): Array[Double] = {
    val sp = psd.copy(method = psdMethod).spectrum(x, sfreq)
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ys = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < sp.freqs.length) {
      if (sp.freqs(i) >= fmin && sp.freqs(i) <= fmax) {
        xs += math.log10(sp.freqs(i))
        ys += math.log10(sp.psd(i))
      }
      i += 1
    }
    val fx = xs.toArray
    val fy = ys.toArray
    val n = fx.length
    val mx = mean(fx)
    val my = mean(fy)
    var sxx = 0.0
    var sxy = 0.0
    i = 0
    while (i < n) {
      sxx += (fx(i) - mx) * (fx(i) - mx)
      sxy += (fx(i) - mx) * (fy(i) - my)
      i += 1
    }
    val slope = sxy / sxx
    val intercept = my - slope * mx
    val resid = new Array[Double](n)
    i = 0
    while (i < n) { resid(i) = fy(i) - (intercept + slope * fx(i)); i += 1 }
    val mse = {
      val sq = resid.map(r => r * r)
      mean(sq)
    }
    val varY = {
      val dev = fy.map(v => (v - my) * (v - my))
      mean(dev)
    }
    val mResid = mean(resid)
    val varResid = mean(resid.map(r => (r - mResid) * (r - mResid)))
    val r2 = 1.0 - varResid / varY
    Array(intercept, slope, mse, r2)
  }

  /** compute_spect_edge_freq (univariate.py:1412-1483): cumulative psd;
    * reference power = sum up to the first bin >= ref_freq (inclusive);
    * per edge p: first bin where cumsum >= p * ref_pow, else -1.
    *
    * Documented deviation: when NO bin reaches ref_freq (odd-length
    * signals have max freq < sfreq/2) the reference raises IndexError
    * (np.where(...)[0][0] on an empty match); this engine clamps the
    * reference index to the last bin, i.e. ref power = total power —
    * the natural continuous limit, and the behaviour the DuckDB-gated
    * query oracles replicate. */
  def spectEdgeFreq(x: Array[Double], sfreq: Double, refFreq: Double,
                    edges: Array[Double], psdMethod: String,
                    psd: PsdConf = PsdConf()): Array[Double] = {
    val sp = psd.copy(method = psdMethod).spectrum(x, sfreq)
    val n = sp.psd.length
    var idxRef = 0
    while (idxRef < n && sp.freqs(idxRef) < refFreq) idxRef += 1
    if (idxRef >= n) idxRef = n - 1
    var refPow = 0.0
    var i = 0
    while (i <= idxRef) { refPow += sp.psd(i); i += 1 }
    val cum = new Array[Double](n)
    var acc = 0.0
    i = 0
    while (i < n) { acc += sp.psd(i); cum(i) = acc; i += 1 }
    edges.map { p =>
      var idx = -1
      var k = 0
      while (idx < 0 && k < n) {
        if (cum(k) >= p * refPow) idx = k
        k += 1
      }
      if (idx >= 0) sp.freqs(idx) else -1.0
    }
  }

  // ---- Hjorth time-domain (univariate.py:893-952) -------------------------

  /** compute_hjorth_mobility: x' = [0] ++ x (zero-padded front),
    * mobility = std(diff(x'), ddof=1) / std(x', ddof=1). */
  def hjorthMobility(x: Array[Double]): Double = {
    val padded = 0.0 +: x
    val dx = diff(padded)
    std(dx, 1) / std(padded, 1)
  }

  /** compute_hjorth_complexity: mobility(diff(x')) / mobility(x), each level
    * re-padding with a leading zero. */
  def hjorthComplexity(x: Array[Double]): Double = {
    val padded = 0.0 +: x
    val dx = diff(padded)
    hjorthMobility(dx) / hjorthMobility(x)
  }

  // ---- fractal dimensions -------------------------------------------------

  /** `_higuchi_fd` (univariate.py:955-1028), exact loop port including the
    * reference's own range(1, n_max) loop (skips j = n_max). */
  def higuchiFd(x: Array[Double], kmax: Int = 10): Double = {
    val nTimes = x.length
    val xReg = new Array[Double](kmax)
    val yReg = new Array[Double](kmax)
    var k = 1
    while (k <= kmax) {
      var mLm = 0.0
      var m = 0
      while (m < k) {
        var ll = 0.0
        val nMax = ((nTimes - m - 1).toDouble / k).toInt
        var j = 1
        while (j < nMax) {
          ll += math.abs(x(m + j * k) - x(m + (j - 1) * k))
          j += 1
        }
        ll /= k
        ll *= (nTimes - 1).toDouble / (k * nMax)
        mLm += ll
        m += 1
      }
      mLm /= k
      xReg(k - 1) = math.log(1.0 / k)
      yReg(k - 1) = math.log(mLm)
      k += 1
    }
    slopeLstsq(xReg, yReg)
  }

  /** compute_katz_fd (univariate.py:1031-1059). */
  def katzFd(x: Array[Double]): Double = {
    val n = x.length
    val dists = new Array[Double](n - 1)
    var i = 0
    while (i < n - 1) { dists(i) = math.abs(x(i + 1) - x(i)); i += 1 }
    val ll = pairwiseSum(dists)
    val a = ll / (n - 1)
    val ln = math.log10(ll / a)
    var d = Double.NegativeInfinity
    i = 1
    while (i < n) {
      val v = math.abs(x(i) - x(0))
      if (v > d) d = v
      i += 1
    }
    ln / (ln + math.log10(d / ll))
  }

  // ---- counting / length features ----------------------------------------

  /** compute_zero_crossings (univariate.py:1062-1094): clip |x| < threshold
    * to 0; count 0-runs entered (diff(sgn==0)==1) + first-sample zero +
    * strict sign changes (s_i * s_{i+1} < 0). */
  def zeroCrossings(x: Array[Double], threshold: Double = 2.220446049250313e-16): Double = {
    val n = x.length
    val sgn = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = if (math.abs(x(i)) < threshold) 0.0 else x(i)
      sgn(i) = math.signum(v)
      i += 1
    }
    var count = 0L
    if (sgn(0) == 0.0) count += 1
    i = 0
    while (i < n - 1) {
      val z0 = if (sgn(i) == 0.0) 1 else 0
      val z1 = if (sgn(i + 1) == 0.0) 1 else 0
      if (z1 - z0 == 1) count += 1
      if (sgn(i) * sgn(i + 1) < 0) count += 1
      i += 1
    }
    count.toDouble
  }

  /** compute_line_length (univariate.py:1097-1119): MEAN of |diff|. */
  def lineLength(x: Array[Double]): Double = {
    val dists = new Array[Double](x.length - 1)
    var i = 0
    while (i < dists.length) { dists(i) = math.abs(x(i + 1) - x(i)); i += 1 }
    pairwiseSum(dists) / dists.length
  }

  // ---- SVD embedding features (univariate.py:1166-1196, 1296-1327) --------

  /** compute_svd_entropy: normalized singular values of the (emb, tau)
    * delay embedding, Shannon entropy base 2. */
  def svdEntropy(x: Array[Double], tau: Int = 2, emb: Int = 10): Double = {
    val sv = Eig.embedSingularValues(x, emb, tau)
    val m = pairwiseSum(sv)
    var s = 0.0
    var i = 0
    while (i < sv.length) {
      val p = sv(i) / m
      s += p * (math.log(p) / math.log(2.0))
      i += 1
    }
    -s
  }

  /** compute_svd_fisher_info: sum diff(p)^2 / p[:-1]. */
  def svdFisherInfo(x: Array[Double], tau: Int = 2, emb: Int = 10): Double = {
    val sv = Eig.embedSingularValues(x, emb, tau)
    val m = pairwiseSum(sv)
    val p = sv.map(_ / m)
    var s = 0.0
    var i = 0
    while (i < p.length - 1) {
      val d = p(i + 1) - p(i)
      s += d * d / p(i)
      i += 1
    }
    s
  }

  // ---- filtered band energies (univariate.py:1330-1409) -------------------

  /** compute_energy_freq_bands: optional derivative pre-filter, FIR
    * band-pass per band, sum of squares. Property-level parity (the
    * reference's own bar, tests/test_univariate.py:501-515). */
  def energyFreqBands(x: Array[Double], sfreq: Double,
                      bands: Array[(Double, Double)],
                      derivFilt: Boolean): Array[Double] = {
    val sig = if (derivFilt) Firwin.derivFilter(x) else x
    bands.map { case (lo, hi) =>
      val f = Firwin.filterBand(sig, sfreq, lo, hi)
      var s = 0.0
      var i = 0
      while (i < f.length) { s += f(i) * f(i); i += 1 }
      s
    }
  }

  // ---- wavelet features (univariate.py:1508-1632) -------------------------

  /** compute_wavelet_coef_energy: sum c^2 per DETAIL level; output index i
    * = coefs[levdec - i], i.e. index 0 = finest detail cD1. */
  def waveletCoefEnergy(x: Array[Double]): Array[Double] = {
    val lev = Dwt.refLevel(x.length)
    val coefs = Dwt.wavedec(x, lev) // [cA_lev, cD_lev, ..., cD_1]
    val levdec = coefs.length - 1
    Array.tabulate(levdec) { i =>
      val c = coefs(levdec - i)
      var s = 0.0
      var k = 0
      while (k < c.length) { s += c(k) * c(k); k += 1 }
      s
    }
  }

  /** `_tk_energy` (univariate.py:1561-1581): x[i]^2 - x[i-1]*x[i+1]. */
  def tkEnergy(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](x.length - 2)
    var i = 1
    while (i < x.length - 1) {
      out(i - 1) = x(i) * x(i) - x(i - 1) * x(i + 1)
      i += 1
    }
    out
  }

  /** compute_teager_kaiser_energy (univariate.py:1584-1618): TK operator on
    * every DWT level (approximation first), output per level = [mean,
    * std(ddof=1)], raveled level-major. */
  def teagerKaiserEnergy(x: Array[Double]): Array[Double] = {
    val lev = Dwt.refLevel(x.length)
    val coefs = Dwt.wavedec(x, lev)
    val out = new Array[Double](coefs.length * 2)
    var l = 0
    while (l < coefs.length) {
      val tk = tkEnergy(coefs(l))
      out(2 * l) = mean(tk)
      out(2 * l + 1) = std(tk, 1)
      l += 1
    }
    out
  }
}
