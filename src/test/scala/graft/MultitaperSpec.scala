package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dpss, Psd}

/** DPSS taper + multitaper PSD properties (reference utils.py:127-177
  * delegates psd_method='multitaper' to mne's psd_array_multitaper; the
  * published estimator properties are the parity bar here). */
class MultitaperSpec extends AnyFunSuite {

  test("dpss tapers: orthonormal, high-concentration, symmetric leading taper") {
    val n = 64
    val tp = Dpss.tapers(n)
    assert(tp.tapers.length >= 4, s"low-bias kept ${tp.tapers.length}")
    // orthonormality
    for (i <- tp.tapers.indices; j <- tp.tapers.indices) {
      val dot = tp.tapers(i).zip(tp.tapers(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<$i,$j> = $dot")
    }
    // concentrations: in (0.9, 1], descending
    assert(tp.lambdas.forall(l => l > 0.9 && l <= 1.0 + 1e-12))
    assert(tp.lambdas.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // the 0th Slepian is symmetric and positive
    val t0 = tp.tapers(0)
    for (i <- 0 until n / 2)
      assert(math.abs(t0(i) - t0(n - 1 - i)) < 1e-9)
    assert(t0.forall(_ > -1e-12))
    // cache: second call returns the identical instance
    assert(Dpss.tapers(n) eq tp)
  }

  test("multitaper psd: pure-tone mass concentrates around the tone") {
    val n = 128
    val sfreq = 64.0
    val f0 = 8.0
    val x = Array.tabulate(n)(t => math.cos(2 * math.Pi * f0 * t / sfreq))
    val sp = Psd.compute(x, sfreq, "multitaper")
    val peak = sp.freqs(sp.psd.indexOf(sp.psd.max))
    assert(math.abs(peak - f0) <= sfreq / n + 1e-9, s"peak at $peak")
    // >= 85% of total mass within +- half_nbw bandwidth of the tone
    val bw = 4.0 * sfreq / n
    val near = sp.psd.indices.filter(i => math.abs(sp.freqs(i) - f0) <= bw)
      .map(sp.psd).sum
    assert(near / sp.psd.sum > 0.85, s"mass ratio ${near / sp.psd.sum}")
  }

  test("multitaper psd: broadband parity of scale (Parseval-ish) and " +
    "FeatureParams threading") {
    val rng = new graft.gen.SplitMix64(5L)
    val n = 96
    val sfreq = 256.0
    val x = Array.fill(n)(rng.nextGaussian())
    val sp = Psd.compute(x, sfreq, "multitaper")
    // density integral approximates signal power for white noise
    val df = sfreq / n
    val mass = sp.psd.sum * df
    val power = x.map(v => v * v).sum / n
    assert(mass > 0.5 * power && mass < 2.0 * power,
      s"mass $mass vs power $power")
    // spectral features accept the method end to end
    val e = graft.core.Features.spectEntropy(x, sfreq, "multitaper")
    assert(e > 0 && e.isFinite)
    val bands = graft.core.Features.powFreqBands(x, sfreq,
      Array((0.5, 4.0), (4.0, 8.0), (8.0, 13.0), (13.0, 30.0), (30.0, 100.0)),
      normalize = true, ratios = None, ratiosTriu = false,
      psdMethod = "multitaper", logOut = false)
    assert(bands.forall(b => b >= 0 && b <= 1))
  }
}
