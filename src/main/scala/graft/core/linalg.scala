package graft.core

/** Tiny dense linear algebra for model-sized matrices (covariance inverse
  * for Mahalanobis, PCA rotation). Runs on the driver over fitted models
  * (d×d with d = #schema attrs), never over data. */
object linalg {

  /** Gauss-Jordan inverse with partial pivoting. */
  def inverse(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val m = Array.tabulate(n, 2 * n) { (i, j) =>
      if (j < n) a(i)(j) else if (j - n == i) 1.0 else 0.0
    }
    for (c <- 0 until n) {
      var p = c
      for (r <- c + 1 until n) if (math.abs(m(r)(c)) > math.abs(m(p)(c))) p = r
      val t = m(c); m(c) = m(p); m(p) = t
      require(math.abs(m(c)(c)) > 1e-12, "singular matrix")
      val piv = m(c)(c)
      for (j <- 0 until 2 * n) m(c)(j) /= piv
      for (r <- 0 until n if r != c) {
        val f = m(r)(c)
        if (f != 0.0) for (j <- 0 until 2 * n) m(r)(j) -= f * m(c)(j)
      }
    }
    Array.tabulate(n, n)((i, j) => m(i)(j + n))
  }

  /** Symmetric eigen-decomposition via cyclic Jacobi — for PCA on the
    * fitted covariance (d small). Returns (eigenvalues desc, eigenvectors
    * as rows, matching order). */
  def symEigen(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100 && offDiag(m) > 1e-12) {
      for (p <- 0 until n - 1; q <- p + 1 until n if math.abs(m(p)(q)) > 1e-15) {
        val theta = (m(q)(q) - m(p)(p)) / (2 * m(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
        val c = 1 / math.sqrt(t * t + 1)
        val s = t * c
        for (k <- 0 until n) {
          val (mkp, mkq) = (m(k)(p), m(k)(q))
          m(k)(p) = c * mkp - s * mkq
          m(k)(q) = s * mkp + c * mkq
        }
        for (k <- 0 until n) {
          val (mpk, mqk) = (m(p)(k), m(q)(k))
          m(p)(k) = c * mpk - s * mqk
          m(q)(k) = s * mpk + c * mqk
        }
        for (k <- 0 until n) {
          val (vkp, vkq) = (v(k)(p), v(k)(q))
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -m(i)(i)).toArray
    (order.map(i => m(i)(i)), order.map(i => (0 until n).map(k => v(k)(i)).toArray))
  }

  private def offDiag(m: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- m.indices; j <- m.indices if i != j) s += m(i)(j) * m(i)(j)
    math.sqrt(s)
  }
}
