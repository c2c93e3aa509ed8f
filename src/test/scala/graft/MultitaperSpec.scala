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

  test("dpss tridiagonal solver == dense Jacobi reference at several n; " +
    "orthonormal + concentrated across sizes incl. large n") {
    // cross-check the Sturm/inverse-iteration path against the engine's
    // dense Jacobi on the same tridiagonal (the r2 construction)
    for (n <- Seq(48, 64, 100)) {
      val w = 4.0 / n
      val cos2piW = math.cos(2 * math.Pi * w)
      val mat = new Array[Double](n * n)
      for (t <- 0 until n) {
        val d = (n - 1 - 2.0 * t) / 2.0
        mat(t * n + t) = d * d * cos2piW
        if (t + 1 < n) {
          val off = (t + 1) * (n - 1.0 - t) / 2.0
          mat(t * n + (t + 1)) = off
          mat((t + 1) * n + t) = off
        }
      }
      val (_, vecs) = graft.core.Eig.symEigen(mat, n)
      val tp = Dpss.tapers(n)
      for (k <- tp.tapers.indices) {
        val a = tp.tapers(k)
        val ref = vecs(k)
        val nrm = math.sqrt(ref.map(x => x * x).sum)
        val dot = math.abs(a.zip(ref).map { case (x, y) => x * y / nrm }.sum)
        assert(math.abs(dot - 1.0) < 1e-9, s"n=$n taper $k |dot|=$dot")
      }
    }
    // size-independence: orthonormality and lambda range at lengths the
    // dense path could not touch (n^2 doubles / O(n^3) time)
    for (n <- Seq(500, 4096, 50000)) {
      val tp = Dpss.tapers(n)
      assert(tp.tapers.length >= 4, s"n=$n kept ${tp.tapers.length}")
      for (i <- tp.tapers.indices; j <- i until tp.tapers.length) {
        val dot = tp.tapers(i).zip(tp.tapers(j)).map { case (a, b) => a * b }.sum
        val expect = if (i == j) 1.0 else 0.0
        assert(math.abs(dot - expect) < 1e-8, s"n=$n <$i,$j> = $dot")
      }
      assert(tp.lambdas.forall(l => l > 0.9 && l <= 1.0 + 1e-9), s"n=$n")
    }
    // guard rails: too-short and beyond-cap epochs get a clear error
    intercept[IllegalArgumentException](Dpss.tapers(3))
    intercept[IllegalArgumentException](Dpss.tapers(Dpss.MaxN + 1))
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

  test("adaptive multitaper (Thomson weights): converges, stays Parseval-" +
    "scaled, concentrates a tone, routes via mt_adaptive") {
    val n = 128
    val sfreq = 64.0
    val rng = new graft.gen.SplitMix64(11L)
    // white noise: adaptive and non-adaptive must agree in overall scale
    val wn = Array.fill(n)(rng.nextGaussian())
    val pa = Psd.compute(wn, sfreq, "multitaper", mtAdaptive = true)
    val pn = Psd.compute(wn, sfreq, "multitaper")
    assert(pa.psd.forall(v => v > 0 && v.isFinite))
    assert(pa.freqs.toSeq == pn.freqs.toSeq)
    val df = sfreq / n
    val power = wn.map(v => v * v).sum / n
    val mass = pa.psd.sum * df
    assert(mass > 0.5 * power && mass < 2.0 * power, s"mass $mass vs $power")
    // per-bin agreement within the estimator variance envelope
    pa.psd.indices.foreach { i =>
      val r = pa.psd(i) / pn.psd(i)
      assert(r > 0.1 && r < 10.0, s"bin $i ratio $r")
    }
    // tone + weak noise: adaptive weighting must keep the tone peak and
    // NOT leak more out-of-band mass than the non-adaptive estimate
    val f0 = 8.0
    val tone = Array.tabulate(n)(t =>
      math.cos(2 * math.Pi * f0 * t / sfreq) + 0.01 * rng.nextGaussian())
    val ta = Psd.compute(tone, sfreq, "multitaper", mtAdaptive = true)
    val tn = Psd.compute(tone, sfreq, "multitaper")
    val peakA = ta.freqs(ta.psd.indexOf(ta.psd.max))
    assert(math.abs(peakA - f0) <= sfreq / n + 1e-9)
    val bw = 4.0 * sfreq / n
    def outOfBand(sp: Psd.Spectrum): Double =
      sp.psd.indices.filter(i => math.abs(sp.freqs(i) - f0) > bw)
        .map(sp.psd).sum / sp.psd.sum
    assert(outOfBand(ta) <= outOfBand(tn) + 1e-9,
      s"adaptive leaked more: ${outOfBand(ta)} vs ${outOfBand(tn)}")
    // FeatureParams routing end to end
    val e = graft.core.Features.spectEntropy(wn, sfreq, "multitaper",
      graft.core.PsdConf(mtAdaptive = true))
    assert(e > 0 && e.isFinite)
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
