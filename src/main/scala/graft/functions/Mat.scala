package graft.functions

/** Tiny dense matrix helpers (row-major `Array[Array[Double]]`) for the
  * observer/filter kernels. Deliberately hand-rolled with a FIXED
  * operation order (plain triple loops, sequential sums) so scalar (1×1)
  * instances produce bit-identical float sequences to a DuckDB
  * `list_reduce` replay — BLAS-backed breeze is used only for design-time
  * gain computations (eigenvalues/SVD), never in the per-row kernel.
  * Dimensions here are state-space sizes (n, p ≤ ~10), so O(n³) is
  * irrelevant.
  */
object Mat {

  def matVec(a: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) {
      val row = a(i); var s = 0d; var j = 0
      while (j < row.length) { s += row(j) * x(j); j += 1 }
      out(i) = s; i += 1
    }
    out
  }

  def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length; val m = b(0).length; val k = b.length
    Array.tabulate(n, m) { (i, j) =>
      var s = 0d; var t = 0
      while (t < k) { s += a(i)(t) * b(t)(j); t += 1 }
      s
    }
  }

  def transpose(a: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a(0).length, a.length)((i, j) => a(j)(i))

  def addM(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a.length, a(0).length)((i, j) => a(i)(j) + b(i)(j))

  def addV(a: Array[Double], b: Array[Double]): Array[Double] =
    Array.tabulate(a.length)(i => a(i) + b(i))

  def subV(a: Array[Double], b: Array[Double]): Array[Double] =
    Array.tabulate(a.length)(i => a(i) - b(i))

  def identity(n: Int): Array[Array[Double]] =
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

  /** Gauss–Jordan inverse with partial pivoting (p is small). The 1×1
    * case reduces to `1.0 / a(0)(0)` (pivot-normalize), which is the
    * SQL-mirrorable path.
    */
  def inv(a0: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a0.length
    val a = Array.tabulate(n, 2 * n)((i, j) =>
      if (j < n) a0(i)(j) else if (j - n == i) 1.0 else 0.0)
    var col = 0
    while (col < n) {
      var piv = col
      var i = col + 1
      while (i < n) { if (math.abs(a(i)(col)) > math.abs(a(piv)(col))) piv = i; i += 1 }
      require(a(piv)(col) != 0.0, "singular matrix")
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t }
      val inv = 1.0 / a(col)(col)
      var j = 0
      while (j < 2 * n) { a(col)(j) *= inv; j += 1 }
      i = 0
      while (i < n) {
        if (i != col && a(i)(col) != 0.0) {
          val f = a(i)(col)
          var j2 = 0
          while (j2 < 2 * n) { a(i)(j2) -= f * a(col)(j2); j2 += 1 }
        }
        i += 1
      }
      col += 1
    }
    Array.tabulate(n, n)((i, j) => a(i)(j + n))
  }
}
