package graft.core

/** One-sided Power Spectral Density, porting the semantics of
  * `power_spectrum` (reference utils.py:91-177).
  *
  * - method "fft": exact port of the reference's own branch
  *   (utils.py:160-175): de-mean, rfft, psd = 2|F|^2/n^2 with DC (and
  *   Nyquist for even n) halved, then the [fmin, fmax] mask. This is the
  *   parity target — every exact spectral test in the reference suite
  *   uses psd_method='fft'.
  * - method "welch": Welch periodogram average with a periodic Hamming
  *   window, per-segment constant detrend, density scaling
  *   1/(sfreq * sum(w^2)), one-sided doubling except DC/Nyquist —
  *   the published algorithm behind mne.time_frequency.psd_array_welch
  *   (reference utils.py:155-160 delegates to it). Default
  *   n_fft = min(n_times, 256), n_per_seg = n_fft, n_overlap = 0
  *   (utils.py:154-159).
  */
object Psd {

  final case class Spectrum(psd: Array[Double], freqs: Array[Double])

  val DefaultFmin = 0.0
  val DefaultFmax = 256.0

  def compute(x: Array[Double], sfreq: Double, method: String,
              fmin: Double = DefaultFmin, fmax: Double = DefaultFmax,
              welchNFft: Int = 256, welchNPerSeg: Int = -1,
              welchNOverlap: Int = 0, mtHalfNbw: Double = 4.0,
              mtLowBias: Boolean = true,
              mtAdaptive: Boolean = false): Spectrum = {
    val fLo = math.max(0.0, fmin)
    val fHi = math.min(fmax, sfreq / 2)
    method match {
      case "fft"   => fftPsd(x, sfreq, fLo, fHi)
      case "welch" => welchPsd(x, sfreq, fLo, fHi, welchNFft, welchNPerSeg,
                               welchNOverlap)
      case "multitaper" => multitaperPsd(x, sfreq, fLo, fHi, mtHalfNbw,
                                         mtLowBias, mtAdaptive)
      case other => throw new IllegalArgumentException(
        s"psd_method '$other' not supported (valid: fft, welch, multitaper)")
    }
  }

  /** Multitaper (Thomson) PSD, non-adaptive eigenvalue weighting — the
    * published estimator behind mne.time_frequency.psd_array_multitaper
    * (reference utils.py:152-154 delegates psd_method='multitaper' there):
    * S(f) = 2 / (sfreq * sum(lambda)) * sum_k lambda_k |X_k(f)|^2 with
    * DPSS tapers (Dpss.tapers: half_nbw default 4, low-bias selection),
    * DC and Nyquist not doubled. */
  private def multitaperPsd(x: Array[Double], sfreq: Double, fLo: Double,
                            fHi: Double, halfNbw: Double,
                            lowBias: Boolean, adaptive: Boolean): Spectrum = {
    val n = x.length
    val tp = Dpss.tapers(n, halfNbw, lowBias)
    val half = n / 2 + 1
    val nTap = tp.tapers.length
    // per-taper eigenspectra |X_k(f)|^2
    val spectra = new Array[Array[Double]](nTap)
    var k = 0
    while (k < nTap) {
      val taper = tp.tapers(k)
      val xt = new Array[Double](n)
      var i = 0
      while (i < n) { xt(i) = x(i) * taper(i); i += 1 }
      val (re, im) = Fft.rfft(xt)
      val sk = new Array[Double](half)
      i = 0
      while (i < half) { sk(i) = re(i) * re(i) + im(i) * im(i); i += 1 }
      spectra(k) = sk
      k += 1
    }
    val comb = new Array[Double](half)
    if (!adaptive || nTap < 3) {
      // eigenvalue-weighted combination (mne's non-adaptive default).
      // EXACT arithmetic shape of the r2 path — acc / (sfreq * lamSum) in
      // one division — preserved below via lamScale (the multitaper
      // oracle replicates it bit-for-bit).
      var i = 0
      while (i < half) {
        var a = 0.0
        k = 0
        while (k < nTap) { a += tp.lambdas(k) * spectra(k)(i); k += 1 }
        comb(i) = a
        i += 1
      }
    } else {
      // Thomson adaptive weights (Percival & Walden eq. 370, the
      // published recipe behind mne's adaptive=True): iterate
      //   b_k(f) = S(f) / (lambda_k S(f) + (1 - lambda_k) sigma^2)
      //   S(f)  <- sum_k b_k^2 lambda_k S_k(f) / sum_k b_k^2 lambda_k
      // from the average of the two lowest-bias eigenspectra; sigma^2 is
      // the process variance estimate (biased sample variance).
      var sig2 = 0.0
      var mean = 0.0
      var i = 0
      while (i < n) { mean += x(i); i += 1 }
      mean /= n
      i = 0
      while (i < n) { val d = x(i) - mean; sig2 += d * d; i += 1 }
      sig2 /= n
      i = 0
      while (i < half) { comb(i) = 0.5 * (spectra(0)(i) + spectra(1)(i)); i += 1 }
      var iter = 0
      var maxRel = Double.MaxValue
      while (iter < 150 && maxRel > 1e-10) {
        maxRel = 0.0
        i = 0
        while (i < half) {
          val s = comb(i)
          var num = 0.0
          var den = 0.0
          k = 0
          while (k < nTap) {
            val lam = tp.lambdas(k)
            val b = s / (lam * s + (1.0 - lam) * sig2)
            val w = b * b * lam
            num += w * spectra(k)(i)
            den += w
            k += 1
          }
          val sNew = if (den > 0) num / den else s
          val rel = math.abs(sNew - s) / math.max(s, 1e-300)
          if (rel > maxRel) maxRel = rel
          comb(i) = sNew
          i += 1
        }
        iter += 1
      }
    }
    val adaptiveUsed = adaptive && nTap >= 3
    var lamSum = 0.0
    k = 0
    while (k < nTap) { lamSum += tp.lambdas(k); k += 1 }
    val scaleDen = if (adaptiveUsed) sfreq else sfreq * lamSum
    val psd = new Array[Double](half)
    var i = 0
    while (i < half) {
      var v = comb(i) / scaleDen
      if (i != 0 && !(n % 2 == 0 && i == half - 1)) v *= 2.0
      psd(i) = v
      i += 1
    }
    mask(psd, Fft.rfftfreq(n, 1.0 / sfreq), fLo, fHi)
  }

  private def fftPsd(x: Array[Double], sfreq: Double,
                     fLo: Double, fHi: Double): Spectrum = {
    val n = x.length
    val m = NumKit.mean(x)
    val centered = new Array[Double](n)
    var i = 0
    while (i < n) { centered(i) = x(i) - m; i += 1 }
    val (re, im) = Fft.rfft(centered)
    val freqs = Fft.rfftfreq(n, 1.0 / sfreq)
    val psd = new Array[Double](re.length)
    i = 0
    while (i < re.length) {
      psd(i) = (re(i) * re(i) + im(i) * im(i)) / (n.toDouble * n) * 2.0
      i += 1
    }
    psd(0) /= 2.0
    if (n % 2 == 0) psd(psd.length - 1) /= 2.0
    mask(psd, freqs, fLo, fHi)
  }

  /** Periodic ("fftbins") Hamming window, scipy get_window default. */
  private def hamming(n: Int): Array[Double] = {
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { w(i) = 0.54 - 0.46 * math.cos(2 * math.Pi * i / n); i += 1 }
    w
  }

  private def welchPsd(x: Array[Double], sfreq: Double, fLo: Double,
                       fHi: Double, nFftReq: Int, nPerSegReq: Int,
                       nOverlap: Int): Spectrum = {
    val nTimes = x.length
    val nFft = math.min(nTimes, nFftReq)
    val nPerSeg = if (nPerSegReq <= 0) nFft else math.min(nPerSegReq, nFft)
    val step = nPerSeg - math.min(nOverlap, nPerSeg - 1)
    val win = hamming(nPerSeg)
    var winSq = 0.0
    var i = 0
    while (i < nPerSeg) { winSq += win(i) * win(i); i += 1 }
    val scale = 1.0 / (sfreq * winSq)
    val half = nFft / 2 + 1
    val acc = new Array[Double](half)
    var nSeg = 0
    var start = 0
    while (start + nPerSeg <= nTimes) {
      val seg = new Array[Double](nFft) // zero-padded to nFft
      var s = 0.0
      var k = 0
      while (k < nPerSeg) { s += x(start + k); k += 1 }
      val segMean = s / nPerSeg
      k = 0
      while (k < nPerSeg) { seg(k) = (x(start + k) - segMean) * win(k); k += 1 }
      val (re, im) = Fft.rfft(seg)
      k = 0
      while (k < half) { acc(k) += (re(k) * re(k) + im(k) * im(k)) * scale; k += 1 }
      nSeg += 1
      start += step
    }
    val psd = new Array[Double](half)
    i = 0
    while (i < half) {
      var v = acc(i) / math.max(nSeg, 1)
      if (i != 0 && !(nFft % 2 == 0 && i == half - 1)) v *= 2.0
      psd(i) = v
      i += 1
    }
    val freqs = Fft.rfftfreq(nFft, 1.0 / sfreq)
    mask(psd, freqs, fLo, fHi)
  }

  private def mask(psd: Array[Double], freqs: Array[Double],
                   fLo: Double, fHi: Double): Spectrum = {
    var cnt = 0
    var i = 0
    while (i < freqs.length) {
      if (freqs(i) >= fLo && freqs(i) <= fHi) cnt += 1
      i += 1
    }
    if (cnt == freqs.length) return Spectrum(psd, freqs)
    val p = new Array[Double](cnt)
    val f = new Array[Double](cnt)
    var j = 0
    i = 0
    while (i < freqs.length) {
      if (freqs(i) >= fLo && freqs(i) <= fHi) { p(j) = psd(i); f(j) = freqs(i); j += 1 }
      i += 1
    }
    Spectrum(p, f)
  }
}
