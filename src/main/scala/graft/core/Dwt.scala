package graft.core

/** Discrete Wavelet Transform (Mallat cascade) with Daubechies-4 filters
  * and symmetric signal extension — the pywt conventions behind
  * `_wavelet_coefs` (reference utils.py:340-362): `pywt.wavedec(data,
  * 'db4', level=min(dwt_max_level, 6))` with pywt's default mode
  * 'symmetric', output `[cA_n, cD_n, ..., cD_1]`, per-level output length
  * floor((n + L - 1) / 2).
  */
object Dwt {

  /** db4 decomposition low-pass filter (reverse of the published
    * Daubechies-4 scaling coefficients; standard 16-digit values). */
  val Db4DecLo: Array[Double] = Array(
    -0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
    -0.18703481171888114, -0.02798376941698385, 0.6308807679295904,
    0.7148465705525415, 0.23037781330885523)

  /** Quadrature mirror: dec_hi[k] = (-1)^(k+1) * dec_lo[L-1-k]. */
  val Db4DecHi: Array[Double] = {
    val l = Db4DecLo.length
    Array.tabulate(l) { k =>
      val v = Db4DecLo(l - 1 - k)
      if (k % 2 == 0) -v else v
    }
  }

  /** Symmetric ("half-sample") mirror index: ...x1 x0 | x0 x1 ... xn-1 | xn-1... */
  private def symIndex(i: Int, n: Int): Int = {
    var k = i
    // fold into [0, 2n) then mirror; loop handles pads longer than n
    val period = 2 * n
    k = ((k % period) + period) % period
    if (k < n) k else period - 1 - k
  }

  /** One DWT level: (approximation, detail). */
  def dwt(x: Array[Double], lo: Array[Double] = Db4DecLo,
          hi: Array[Double] = Db4DecHi): (Array[Double], Array[Double]) = {
    val n = x.length
    val l = lo.length
    val outLen = (n + l - 1) / 2
    val a = new Array[Double](outLen)
    val d = new Array[Double](outLen)
    var i = 0
    while (i < outLen) {
      // full-convolution index m = L + 2i over the symmetric extension,
      // shifted so ext index e = m - k - (L - 1) maps into the signal
      var sa = 0.0
      var sd = 0.0
      var k = 0
      while (k < l) {
        val e = 2 * i + 1 - k // position in the (virtual) extended signal - (L-1)
        val xi = x(symIndex(e, n))
        sa += lo(k) * xi
        sd += hi(k) * xi
        k += 1
      }
      a(i) = sa
      d(i) = sd
      i += 1
    }
    (a, d)
  }

  /** pywt.dwt_max_level: floor(log2(n / (L - 1))). */
  def maxLevel(n: Int, filterLen: Int = Db4DecLo.length): Int = {
    val denom = filterLen - 1
    if (n < denom || denom <= 0) 0
    else (math.log(n.toDouble / denom) / math.log(2.0)).toInt
  }

  /** pywt.wavedec: returns [cA_lev, cD_lev, ..., cD_1]. */
  def wavedec(x: Array[Double], level: Int): Array[Array[Double]] = {
    var a = x
    val details = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var j = 0
    while (j < level) {
      val (na, nd) = dwt(a)
      details += nd
      a = na
      j += 1
    }
    (a +: details.reverse).toArray
  }

  /** Reference decomposition level: min(dwt_max_level, 6) (utils.py:361). */
  def refLevel(n: Int): Int = math.min(maxLevel(n), 6)
}
