package graft.core

/** Windowed-sinc FIR design + zero-phase filtering for
  * `compute_energy_freq_bands` (reference univariate.py:1330-1409, via
  * `_filt` -> mne.filter.filter_data with fir_design='firwin',
  * reference utils.py:214-254).
  *
  * The reference's own test bar for this feature is a property — >= 98%
  * of the energy of a band-limited signal lands in the covering band
  * (reference tests/test_univariate.py:501-515) — not exact values, so
  * this is a clean-room firwin (Hamming window, odd taps, transition
  * bandwidths from mne's published "auto" rule: trans = min(max(0.25*f, 2),
  * available headroom)), applied zero-phase by compensating the
  * linear-phase group delay with edge reflection padding.
  */
object Firwin {

  /** Hamming-windowed sinc low-pass with cutoff fc (normalized to Nyquist=1),
    * odd numtaps, unit DC gain. */
  def lowpass(numtaps: Int, fc: Double): Array[Double] = {
    require(numtaps % 2 == 1, "numtaps must be odd")
    val m = numtaps - 1
    val h = new Array[Double](numtaps)
    var i = 0
    var s = 0.0
    while (i < numtaps) {
      val k = i - m / 2
      val sinc = if (k == 0) fc else math.sin(math.Pi * fc * k) / (math.Pi * k)
      val w = 0.54 - 0.46 * math.cos(2 * math.Pi * i / m) // symmetric Hamming
      h(i) = sinc * w
      s += h(i)
      i += 1
    }
    i = 0
    while (i < numtaps) { h(i) /= s; i += 1 } // unit gain at DC
    h
  }

  /** Band-pass as difference of two low-passes (unit gain at band center). */
  def bandpass(numtaps: Int, fLo: Double, fHi: Double): Array[Double] = {
    val lo = lowpass(numtaps, fHi)
    val hi = lowpass(numtaps, fLo)
    val h = new Array[Double](numtaps)
    var i = 0
    while (i < numtaps) { h(i) = lo(i) - hi(i); i += 1 }
    h
  }

  /** mne "auto" transition bandwidth: min(max(0.25 * f, 2 Hz), f) on the low
    * edge; min(max(0.25 * f, 2 Hz), nyq - f) on the high edge. */
  def autoTransLow(f: Double): Double = math.min(math.max(0.25 * f, 2.0), f)
  def autoTransHigh(f: Double, nyq: Double): Double =
    math.min(math.max(0.25 * f, 2.0), math.max(nyq - f, 1e-9))

  /** Zero-phase band-pass of x in [fLo, fHi] Hz at sampling rate sfreq. */
  def filterBand(x: Array[Double], sfreq: Double, fLo: Double, fHi: Double): Array[Double] = {
    val nyq = sfreq / 2.0
    val tLo = autoTransLow(fLo)
    val tHi = autoTransHigh(fHi, nyq)
    val minTrans = math.min(tLo, tHi)
    // mne auto length: 3.3 / trans_bw * sfreq, forced odd, capped to signal
    var numtaps = math.ceil(3.3 * sfreq / minTrans).toInt | 1
    val maxTaps = math.max(3, (x.length - 1) | 1)
    if (numtaps > maxTaps) numtaps = maxTaps
    // When the cap bites, the achievable Hamming transition bandwidth is
    // ~3.3*sfreq/numtaps Hz; widen the designed transitions to match so the
    // passband edges stay in the flat region (keeps the reference's 98%%
    // energy-capture property even for short signals).
    val transEff = 3.3 * sfreq / numtaps
    val tLoEff = math.max(tLo, transEff)
    val tHiEff = math.max(tHi, transEff)
    val cLoHz = fLo - tLoEff / 2.0
    val cHiHz = fHi + tHiEff / 2.0
    val cHi = math.min(cHiHz / nyq, 1.0 - 1e-9)
    val h =
      if (cLoHz <= 0.0) lowpass(numtaps, cHi) // low edge under DC: pure low-pass
      else bandpass(numtaps, cLoHz / nyq, cHi)
    convolveZeroPhase(x, h)
  }

  /** 'same'-size convolution with reflect padding, compensating the
    * (numtaps-1)/2 linear-phase delay — net zero-phase for symmetric h. */
  def convolveZeroPhase(x: Array[Double], h: Array[Double]): Array[Double] = {
    val n = x.length
    val l = h.length
    val half = (l - 1) / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var k = 0
      while (k < l) {
        var idx = i + half - k
        // reflect (without repeating the edge), scipy 'reflect'/'mirror'-ish
        if (idx < 0) idx = -idx
        if (idx >= n) idx = 2 * n - 2 - idx
        if (idx < 0) idx = 0 // degenerate tiny-n guard
        if (idx >= n) idx = n - 1
        s += h(k) * x(idx)
        k += 1
      }
      out(i) = s
      i += 1
    }
    out
  }

  /** Derivative pre-filter: scipy.ndimage.convolve1d(x, [1, 0, -1],
    * mode='nearest') = x[i+1] - x[i-1] with edge replication
    * (reference univariate.py:1384-1386). */
  def derivFilter(x: Array[Double]): Array[Double] = {
    val n = x.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val nxt = if (i + 1 < n) x(i + 1) else x(n - 1)
      val prv = if (i - 1 >= 0) x(i - 1) else x(0)
      out(i) = nxt - prv
      i += 1
    }
    out
  }
}
