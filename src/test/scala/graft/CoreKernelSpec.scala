package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Parity suite: every closed-form oracle from the reference test module
  * /root/reference/mne_features/tests/test_univariate.py, evaluated on the
  * same fixtures (FIXTURES.md). Tolerance = the reference's own
  * assert_almost_equal decimal=7 bar unless the reference itself asserts
  * looser (decimal=1 for statistical tests).
  */
class CoreKernelSpec extends AnyFunSuite {
  val ch0: Array[Double] = Array(0, 0, 2, -2, 0, -1, -1, 0)
  val ch1: Array[Double] = Array(1, 1, -1, -1, 0, 1, 1, 0)
  val samp1: Array[Double] = Array(1, -1, 1, -1, 0, 1, -1, 1)

  // data_sin: 0.1*sin(5 * 2pi k/512) + 0.05*sin(33 * 2pi k/512), sfreq 512
  val sfreq = 512.0
  val dataSin: Array[Double] = Array.tabulate(512) { k =>
    val tp = 2 * math.Pi * k / 512.0
    0.1 * math.sin(5 * tp) + 0.05 * math.sin(33 * tp)
  }
  val p1 = 0.1 * 0.1 / 2 // power_sin1
  val p2 = 0.05 * 0.05 / 2 // power_sin2

  def close(a: Double, b: Double, tol: Double = 1e-7): Unit =
    assert(math.abs(a - b) <= tol * math.max(1.0, math.abs(b)),
      s"got $a expected $b")

  test("mean (test_univariate.py:83-85)") {
    close(Features.meanF(ch0), -0.25)
    close(Features.meanF(ch1), 0.25)
  }
  test("variance ddof=1 (:88-90)") {
    close(Features.varianceF(ch0), 19.0 / 14)
    close(Features.varianceF(ch1), 11.0 / 14)
  }
  test("std (:93-95)") {
    close(Features.stdF(ch0), math.sqrt(19.0 / 14))
  }
  test("skewness biased g1 (:98-100)") {
    close(Features.skewness(ch0), 42.0 / (19 * math.sqrt(19.0)))
    close(Features.skewness(ch1), -18.0 / (11 * math.sqrt(11.0)))
  }
  test("kurtosis Pearson (:103-105)") {
    close(Features.kurtosis(ch0), 1141.0 / 361)
    close(Features.kurtosis(ch1), 197.0 / 121)
  }
  test("ptp (:108-110)") {
    close(Features.ptpAmp(ch0), 4.0)
    close(Features.ptpAmp(ch1), 2.0)
  }
  test("rms (:113-115)") {
    close(Features.rms(ch0), math.sqrt(1.25))
    close(Features.rms(ch1), math.sqrt(0.75))
  }
  test("quantile linear interp (:118-123)") {
    close(Features.quantiles(ch0, Array(0.75))(0), 0.0)
    close(Features.quantiles(ch1, Array(0.75))(0), 1.0)
    val multi0 = Features.quantiles(ch0, Array(0.25, 0.75))
    val multi1 = Features.quantiles(ch1, Array(0.25, 0.75))
    close(multi0(0), -1.0); close(multi0(1), 0.0)
    close(multi1(0), -0.25); close(multi1(1), 1.0)
  }
  test("line_length (:125-127)") {
    close(Features.lineLength(ch0), 10.0 / 7)
    close(Features.lineLength(ch1), 5.0 / 7)
  }
  test("zero_crossings (:129-137)") {
    close(Features.zeroCrossings(ch0), 4.0)
    close(Features.zeroCrossings(ch1), 3.0)
    val sin20 = Array.tabulate(20)(i => math.sin(4 * 2 * math.Pi * i / 19.0))
    close(Features.zeroCrossings(sin20, 1e-12), 9.0)
    close(Features.zeroCrossings(sin20), 8.0)
    val tail = Array(0.0, 0, 0, 0, 0, 0, 0.1)
    close(Features.zeroCrossings(tail), 1.0)
  }
  test("app_entropy (:159-166)") {
    close(Features.appEntropy(ch0), -math.log(7) + math.log(6))
    close(Features.appEntropy(ch1), (2 * math.log(2) - 7 * math.log(7)) / 7 + math.log(6))
    // AppEn ~ 0 for period-2 signal
    val alt = Array.tabulate(512)(i => if (i % 2 == 0) 1.0 else -1.0)
    assert(math.abs(Features.appEntropy(alt)) < 1e-5)
  }
  test("samp_entropy (:172-180)") {
    close(Features.sampEntropy(samp1), math.log(3.0))
    assert(Features.sampEntropy(ch0).isNaN) // reference raises ValueError
  }
  test("hjorth_mobility (:453-456)") {
    close(Features.hjorthMobility(ch0), 6 * math.sqrt(26.0) / (math.sqrt(7.0) * math.sqrt(43.0)))
    close(Features.hjorthMobility(ch1), 6 * math.sqrt(8.0) / (5 * math.sqrt(7.0)))
  }
  test("hjorth_complexity (:459-462)") {
    close(Features.hjorthComplexity(ch0), math.sqrt(29885.0) / 156)
    close(Features.hjorthComplexity(ch1), 5 * math.sqrt(103.0) / 48)
  }
  test("katz_fd (:489-498)") {
    def log10(v: Double) = math.log10(v)
    close(Features.katzFd(ch0), log10(7) / (log10(2.0 / 10) + log10(7)))
    close(Features.katzFd(ch1), log10(7) / (log10(2.0 / 5) + log10(7)))
  }
  test("higuchi_fd of Weierstrass cosine ~ 2-H (:465-486)") {
    val t = Array.tabulate(1024)(j => j / 1023.0)
    val wcf = t.map { tj =>
      (0 until 26).map(i => math.pow(5, -0.5 * i) * math.cos(2 * math.Pi * math.pow(5, i) * tj)).sum
    }
    val fd = Features.higuchiFd(wcf, 10)
    assert(math.abs(fd - 1.5) < 0.1, s"higuchi fd $fd")
  }
  test("hurst_exp ~ 0.5 on white noise (:139-156)") {
    // deterministic pseudo-noise (SplitMix64) standing in for RandomState(42)
    val rng = new graft.gen.SplitMix64(42L)
    val x = Array.fill(512)(rng.nextGaussian())
    val h = Features.hurstExp(x)
    assert(math.abs(h - 0.5) < 0.15, s"hurst $h")
  }
  test("decorr_time > 0 on noise (:183-188)") {
    val rng = new graft.gen.SplitMix64(7L)
    val x = Array.fill(512)(rng.nextGaussian())
    assert(Features.decorrTime(x, sfreq) > 0)
  }

  // ---- spectral oracles on data_sin (psd_method='fft') --------------------

  test("pow_freq_bands normalized (:202-207)") {
    val bands = Array((0.5, 4.0), (4.0, 8.0), (8.0, 13.0), (13.0, 30.0), (30.0, 100.0))
    val out = Features.powFreqBands(dataSin, sfreq, bands, normalize = true,
      None, ratiosTriu = false, "fft", logOut = false)
    val tot = p1 + p2
    val exp = Array(0.0, p1 / tot, 0.0, 0.0, p2 / tot)
    out.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-7) }
  }
  test("pow_freq_bands raw + ratios (:209-260)") {
    val fb = Array((4.0, 8.0), (30.0, 70.0))
    val all = Features.powFreqBands(dataSin, sfreq, fb, normalize = true,
      Some("all"), ratiosTriu = false, "fft", logOut = false)
    val tot = p1 + p2
    val exp = Array(p1 / tot, p2 / tot, p1 / p2, p2 / p1)
    all.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6 * math.max(1, b)) }
    val only = Features.powFreqBands(dataSin, sfreq, fb, normalize = true,
      Some("only"), ratiosTriu = true, "fft", logOut = false)
    assert(only.length == 1)
    assert(math.abs(only(0) - p1 / p2) < 1e-6 * (p1 / p2))
  }
  test("hjorth_mobility_spect (:435-439)") {
    close(Features.hjorthMobilitySpect(dataSin, sfreq, normalize = false, "fft"),
      p1 * 25 + p2 * 33 * 33, 1e-6)
  }
  test("hjorth_complexity_spect (:442-450)") {
    val exp = p1 * math.pow(5, 4) + p2 * math.pow(33, 4)
    close(Features.hjorthComplexitySpect(dataSin, sfreq, normalize = false, "fft"), exp, 1e-6)
    close(Features.hjorthComplexitySpect(dataSin, sfreq, normalize = true, "fft"),
      exp / (p1 + p2), 1e-6)
  }
  test("spect_entropy (:591-596)") {
    val tot = p1 + p2
    val exp = -(p1 / tot) * (math.log(p1 / tot) / math.log(2)) -
      (p2 / tot) * (math.log(p2 / tot) / math.log(2))
    close(Features.spectEntropy(dataSin, sfreq, "fft"), exp, 1e-6)
  }
  test("spect_edge_freq (:599-614)") {
    close(Features.spectEdgeFreq(dataSin, sfreq, 15.0, Array(0.5), "fft")(0), 5.0)
    close(Features.spectEdgeFreq(dataSin, sfreq, 50.0, Array(0.9), "fft")(0), 33.0)
  }
  test("energy_freq_bands >= 98% in [1,40] Hz (:501-515)") {
    val out = Features.energyFreqBands(dataSin, sfreq, Array((1.0, 40.0)), derivFilt = false)
    val tot = dataSin.map(v => v * v).sum
    assert(out(0) > 0.98 * tot, s"band energy ${out(0)} vs total $tot")
  }
  test("FFT overlap-add zero-phase == direct convolution to FFT rounding " +
    "(the long-signal scale path; short epochs stay on the direct path)") {
    val rng = new graft.gen.SplitMix64(17L)
    for ((n, sf, lo, hi) <- Seq((20000, 256.0, 0.5, 4.0),  // 1691 taps
                                (8192, 256.0, 8.0, 13.0),  // shorter taps
                                (3000, 512.0, 1.0, 40.0))) {
      val x = Array.fill(n)(rng.nextGaussian())
      val h = Firwin.designCached(sf, lo, hi)
      val direct = Firwin.applyZeroPhase(x, h)
      val fft = Firwin.applyZeroPhaseFft(x, h)
      assert(fft.length == direct.length)
      var worst = 0.0
      var i = 0
      while (i < n) {
        worst = math.max(worst,
          math.abs(fft(i) - direct(i)) / math.max(1.0, math.abs(direct(i))))
        i += 1
      }
      assert(worst < 1e-9, s"n=$n band=($lo,$hi): worst rel diff $worst")
    }
    // dispatch: the gate regime (short epochs) stays strictly direct
    assert(!Firwin.useFftPath(512, 1691))
    assert(!Firwin.useFftPath(88, 1691))
    assert(Firwin.useFftPath(20000, 1691))
  }

  test("svd_entropy / fisher positive on noise (:617-622)") {
    val rng = new graft.gen.SplitMix64(3L)
    val x = Array.fill(512)(rng.nextGaussian())
    assert(Features.svdEntropy(x, 2, 2) > 0)
    assert(Features.svdFisherInfo(x, 2, 2) > 0)
  }
  test("wavelet energy + teager kaiser shapes (:625-632)") {
    val rng = new graft.gen.SplitMix64(9L)
    val x = Array.fill(512)(rng.nextGaussian())
    assert(Features.waveletCoefEnergy(x).length == 6) // db4, n=512 -> levdec 6
    assert(Features.teagerKaiserEnergy(x).length == 14) // (6+1)*2
  }
  test("dwt sanity: constant signal -> cA = c*sqrt(2), cD = 0") {
    val c = Array.fill(64)(3.0)
    val (a, d) = Dwt.dwt(c)
    a.foreach(v => assert(math.abs(v - 3.0 * math.sqrt(2)) < 1e-12))
    d.foreach(v => assert(math.abs(v) < 1e-12))
  }
  test("dwt energy conservation (orthogonal db4, periodic-ish interior)") {
    val rng = new graft.gen.SplitMix64(11L)
    val x = Array.fill(256)(rng.nextGaussian())
    val (a, d) = Dwt.dwt(x)
    val ex = x.map(v => v * v).sum
    val ead = a.map(v => v * v).sum + d.map(v => v * v).sum
    // symmetric extension adds boundary energy; allow 15%
    assert(math.abs(ead - ex) / ex < 0.15, s"energy $ead vs $ex")
  }
  test("fft roundtrip & parseval (arbitrary n via Bluestein)") {
    for (n <- Seq(8, 100, 173, 512)) {
      val rng = new graft.gen.SplitMix64(n.toLong)
      val x = Array.fill(n)(rng.nextGaussian())
      val (re, im) = Fft.rfft(x)
      // Parseval: sum x^2 = (1/n) * [X0^2 + 2*sum_mid |Xk|^2 + (Xny^2 if even)]
      var acc = re(0) * re(0) + im(0) * im(0)
      var k = 1
      while (k < re.length) {
        val m = re(k) * re(k) + im(k) * im(k)
        val last = (n % 2 == 0) && k == re.length - 1
        acc += (if (last) m else 2 * m)
        k += 1
      }
      val lhs = x.map(v => v * v).sum
      assert(math.abs(lhs - acc / n) < 1e-8 * math.max(1, lhs), s"parseval n=$n")
    }
  }
  test("welch PSD: density integrates to signal variance (Parseval), " +
    "tones at 5/33 Hz dominate") {
    val sp = Psd.compute(dataSin, sfreq, "welch")
    val df = sp.freqs(1) - sp.freqs(0)
    val integral = sp.psd.sum * df
    val varSig = graft.core.NumKit.variance(dataSin, 0)
    assert(math.abs(integral - varSig) / varSig < 0.1,
      s"welch integral $integral vs variance $varSig")
    // tone mass: with n_fft=256 the grid is 2 Hz, so the 5 Hz tone leaks
    // into the 4/6 bins — check band mass ratios instead of bin peaks
    def band(lo: Double, hi: Double) =
      sp.psd.zip(sp.freqs).filter { case (_, f) => f >= lo && f <= hi }.map(_._1).sum
    val tot = sp.psd.sum
    assert(math.abs(band(3, 7) / tot - p1 / (p1 + p2)) < 0.1,
      s"5Hz band mass ${band(3, 7) / tot}")
    assert(math.abs(band(31, 35) / tot - p2 / (p1 + p2)) < 0.1,
      s"33Hz band mass ${band(31, 35) / tot}")
    // psd_params routing: n_per_seg = 128 with 64 overlap also integrates
    val sp2 = Psd.compute(dataSin, sfreq, "welch", welchNFft = 256,
      welchNPerSeg = 128, welchNOverlap = 64)
    val int2 = sp2.psd.sum * (sp2.freqs(1) - sp2.freqs(0))
    // short segments + per-segment de-mean lose tone power to scalloping;
    // coarse sanity bound only (exact parity contract is psd_method='fft')
    assert(math.abs(int2 - varSig) / varSig < 0.3)
  }

  test("unbiased autocorr lag0 = 1") {
    val rng = new graft.gen.SplitMix64(5L)
    val x = Array.fill(100)(rng.nextGaussian())
    val acf = Features.unbiasedAutocorr(x)
    assert(acf(0) == 1.0)
    assert(acf.length == 51)
  }
  test("spect_slope recovers planted 1/f law (~:537-588)") {
    // synthesize PSD ~ k1/f^theta via inverse FFT with random phases
    val k1 = 5.0
    val theta = 3.0
    val n = 512
    val rng = new graft.gen.SplitMix64(13L)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (f <- 1 until 128) {
      val mag = math.sqrt(k1) / math.pow(f, theta / 2)
      val ph = (rng.nextDouble() * 2 - 1) * math.Pi
      re(f) = mag * math.cos(ph); im(f) = mag * math.sin(ph)
      re(n - f) = re(f); im(n - f) = -im(f)
    }
    Fft.inverse(re, im)
    val sig = re
    val out = Features.spectSlope(sig, sfreq, 0.1, 50.0, "fft")
    val k1Est = math.pow(10, out(0) - math.log10(2) + 2 * math.log10(n.toDouble))
    assert(math.abs(k1Est - k1) < 0.5, s"k1 $k1Est")
    assert(math.abs(-out(1) - theta) < 0.1, s"theta ${-out(1)}")
    assert(out(3) > 0.95)
    assert(out(2) < 0.5)
  }
}
