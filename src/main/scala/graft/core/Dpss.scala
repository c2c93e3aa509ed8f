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
  * The eigendecomposition reuses the engine's Jacobi (Eig.symEigen) on the
  * dense form — O(n^3)-per-sweep, cached per (n, half_nbw): tapers depend
  * only on the epoch length, so each executor pays the solve once per
  * distinct length. Practical for the engine's epoch regime (n up to a few
  * hundred); longer epochs should use 'welch'.
  */
object Dpss {

  final case class Tapers(tapers: Array[Array[Double]], lambdas: Array[Double])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double, Boolean), Tapers]

  def tapers(n: Int, halfNbw: Double = 4.0, lowBias: Boolean = true): Tapers = {
    cache.computeIfAbsent((n, halfNbw, lowBias), _ => compute(n, halfNbw, lowBias))
  }

  private def compute(n: Int, halfNbw: Double, lowBias: Boolean): Tapers = {
    val nTapers = math.max(1, (2 * halfNbw).toInt - 1)
    val w = halfNbw / n
    val cos2piW = math.cos(2 * math.Pi * w)
    val mat = new Array[Double](n * n)
    var t = 0
    while (t < n) {
      val d = (n - 1 - 2.0 * t) / 2.0
      mat(t * n + t) = d * d * cos2piW
      if (t + 1 < n) {
        val off = (t + 1) * (n - 1.0 - t) / 2.0
        mat(t * n + (t + 1)) = off
        mat((t + 1) * n + t) = off
      }
      t += 1
    }
    val (_, vecs) = Eig.symEigen(mat, n)
    // top-nTapers eigenvectors; polarity convention: positive mean for
    // symmetric tapers, positive first lobe otherwise (mne dpss_windows)
    val top = vecs.take(math.min(nTapers, n)).map { v =>
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
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (if (flip) -x else x) / norm)
    }
    // concentration ratios via the sinc-kernel quadratic form
    val lambdas = top.map { v =>
      var acc = 0.0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          val a =
            if (i == j) 2.0 * w
            else math.sin(2 * math.Pi * w * (i - j)) / (math.Pi * (i - j))
          acc += v(i) * a * v(j)
          j += 1
        }
        i += 1
      }
      acc
    }
    if (!lowBias) Tapers(top, lambdas)
    else {
      val keep = lambdas.zipWithIndex.filter(_._1 > 0.9).map(_._2)
      val idx = if (keep.isEmpty) Array(0) else keep
      Tapers(idx.map(top), idx.map(lambdas))
    }
  }
}
