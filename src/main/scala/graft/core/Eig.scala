package graft.core

/** Symmetric eigen / small-matrix helpers for the SVD-embedding features.
  *
  * `compute_svd_entropy` / `compute_svd_fisher_info` (reference
  * univariate.py:1166-1196, 1296-1327) take singular values of the
  * time-delay-embedded matrix X (m x d, d = emb, default 10). We avoid a
  * full SVD: sigma_i = sqrt(eigenvalues of X^T X), computed with cyclic
  * Jacobi rotations on the d x d Gram matrix — deterministic and exact to
  * machine precision for these tiny d.
  */
object Eig {

  /** Eigenvalues of a symmetric matrix (row-major d x d), descending. */
  def symEigenvalues(mat: Array[Double], d: Int): Array[Double] =
    symEigen(mat, d)._1

  /** Full symmetric eigendecomposition (cyclic Jacobi, rotations
    * accumulated): returns (eigenvalues descending, eigenvectors as rows
    * matching the value order). O(d^3) per sweep — fine for the small/
    * medium matrices the engine feeds it (Gram d=10, DPSS tridiagonals up
    * to a few hundred; cache results for repeated n). */
  def symEigen(mat: Array[Double], d: Int): (Array[Double], Array[Array[Double]]) = {
    val a = java.util.Arrays.copyOf(mat, mat.length)
    val v = new Array[Double](d * d)
    var vi = 0
    while (vi < d) { v(vi * d + vi) = 1.0; vi += 1 }
    @inline def at(i: Int, j: Int) = a(i * d + j)
    @inline def set(i: Int, j: Int, v: Double): Unit = a(i * d + j) = v
    var sweep = 0
    val maxSweeps = 100
    var off = offDiag(a, d)
    val tol = 1e-14 * (1.0 + frobenius(a, d))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = at(p, q)
          if (math.abs(apq) > 0) {
            val app = at(p, p)
            val aqq = at(q, q)
            val theta = (aqq - app) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val tt = if (theta == 0.0) 1.0 else t
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var k = 0
            while (k < d) {
              val akp = at(k, p)
              val akq = at(k, q)
              set(k, p, c * akp - s * akq)
              set(k, q, s * akp + c * akq)
              // accumulate the rotation into V (columns p, q)
              val vkp = v(k * d + p)
              val vkq = v(k * d + q)
              v(k * d + p) = c * vkp - s * vkq
              v(k * d + q) = s * vkp + c * vkq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = at(p, k)
              val aqk = at(q, k)
              set(p, k, c * apk - s * aqk)
              set(q, k, s * apk + c * aqk)
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a, d)
      sweep += 1
    }
    val order = Array.tabulate(d)(identity).sortBy(i => -at(i, i))
    val values = order.map(i => at(i, i))
    val vectors = order.map(i => Array.tabulate(d)(k => v(k * d + i)))
    (values, vectors)
  }

  private def offDiag(a: Array[Double], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        if (i != j) s += math.abs(a(i * d + j))
        j += 1
      }
      i += 1
    }
    s
  }

  private def frobenius(a: Array[Double], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  /** Singular values (descending) of the delay embedding of x with
    * dimension d and delay tau — via the Gram matrix eigenvalues.
    * Embedding rows: e_i = [x(i), x(i+tau), ..., x(i+(d-1)tau)],
    * i in [0, n - (d-1)*tau) — the stride layout of `_embed`
    * (reference utils.py:56-88), with the same tau clamp
    * tau_max = floor((n-1)/(d-1)).
    */
  def embedSingularValues(x: Array[Double], d: Int, tauIn: Int): Array[Double] = {
    val n = x.length
    val tauMax = (n - 1) / (d - 1)
    val tau = math.min(tauIn, tauMax)
    val m = n - d * tau + tau // = n - (d-1)*tau
    val gram = new Array[Double](d * d)
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) {
        var s = 0.0
        var i = 0
        while (i < m) {
          s += x(i + a * tau) * x(i + b * tau)
          i += 1
        }
        gram(a * d + b) = s
        gram(b * d + a) = s
        b += 1
      }
      a += 1
    }
    val ev = symEigenvalues(gram, d)
    // an m x d matrix has min(m, d) singular values; the Gram route pads
    // with ~0 eigenvalues when m < d — drop them to match np.linalg.svd
    ev.take(math.min(m, d)).map(v => math.sqrt(math.max(v, 0.0)))
  }
}
