package graft.functions

/** Cubic spline interpolation with not-a-knot boundary conditions — the
  * textbook algorithm scipy's `interp1d(kind='cubic')` and `splrep(k=3, s=0)`
  * implement (reference uses both: `fdi_flow/preprocessing/segmenters.py:153`
  * and `:224`). Solved via second-derivative (M) formulation with a Thomas
  * tridiagonal solve — O(n) per series.
  */
object Spline {

  /** Second derivatives M_i of the not-a-knot cubic spline through
    * (xs, ys); xs strictly increasing, n ≥ 2.
    */
  private def secondDerivatives(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    val m = new Array[Double](n)
    if (n == 2) return m // linear: M = 0
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val d = Array.tabulate(n - 1)(i => (ys(i + 1) - ys(i)) / h(i))
    if (n == 3) {
      // not-a-knot with 3 points: single parabola, constant M
      val v = (d(1) - d(0)) / ((h(0) + h(1)) / 2d)
      java.util.Arrays.fill(m, v)
      return m
    }
    // Interior equations i = 1..n-2:
    //   h(i-1)/6·M(i-1) + (h(i-1)+h(i))/3·M(i) + h(i)/6·M(i+1) = d(i) - d(i-1)
    // Not-a-knot: M0 = (1+h0/h1)M1 − (h0/h1)M2,
    //             M(n-1) = (1+h(n-2)/h(n-3))M(n-2) − (h(n-2)/h(n-3))M(n-3)
    // Substitute into the first/last interior rows → tridiagonal in M1..M(n-2).
    val k = n - 2 // unknowns M1..M(n-2)
    val lower = new Array[Double](k)
    val diag = new Array[Double](k)
    val upper = new Array[Double](k)
    val rhs = new Array[Double](k)
    var i = 1
    while (i <= n - 2) {
      val j = i - 1
      lower(j) = h(i - 1) / 6d
      diag(j) = (h(i - 1) + h(i)) / 3d
      upper(j) = h(i) / 6d
      rhs(j) = d(i) - d(i - 1)
      i += 1
    }
    // row 0 (i=1) had a M0 term with coefficient h0/6
    val r0 = h(0) / h(1)
    diag(0) += (h(0) / 6d) * (1d + r0)
    upper(0) += (h(0) / 6d) * (-r0)
    // last row (i=n-2) had a M(n-1) term with coefficient h(n-2)/6
    val r1 = h(n - 2) / h(n - 3)
    diag(k - 1) += (h(n - 2) / 6d) * (1d + r1)
    lower(k - 1) += (h(n - 2) / 6d) * (-r1)
    // Thomas solve
    val cp = new Array[Double](k)
    val dp = new Array[Double](k)
    cp(0) = upper(0) / diag(0)
    dp(0) = rhs(0) / diag(0)
    i = 1
    while (i < k) {
      val denom = diag(i) - lower(i) * cp(i - 1)
      cp(i) = upper(i) / denom
      dp(i) = (rhs(i) - lower(i) * dp(i - 1)) / denom
      i += 1
    }
    m(k) = dp(k - 1) // M(n-2)
    i = k - 2
    while (i >= 0) {
      m(i + 1) = dp(i) - cp(i) * m(i + 2)
      i -= 1
    }
    m(0) = (1d + r0) * m(1) - r0 * m(2)
    m(n - 1) = (1d + r1) * m(n - 2) - r1 * m(n - 3)
    m
  }

  /** Evaluate the not-a-knot cubic spline through (xs, ys) at `at`
    * (extrapolates with the boundary polynomials, matching
    * `fill_value="extrapolate"`).
    */
  def cubic(xs: Array[Double], ys: Array[Double], at: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2, "spline needs at least 2 points")
    val m = secondDerivatives(xs, ys)
    at.map { x =>
      // locate interval (clamped → boundary cubic extrapolates)
      var lo = java.util.Arrays.binarySearch(xs, x)
      var i =
        if (lo >= 0) math.min(lo, n - 2)
        else {
          val ip = -lo - 1 // insertion point
          math.max(0, math.min(ip - 1, n - 2))
        }
      val h = xs(i + 1) - xs(i)
      val a = (xs(i + 1) - x) / h
      val b = (x - xs(i)) / h
      a * ys(i) + b * ys(i + 1) +
        ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) * h * h / 6d
    }
  }

  /** Interpolating quadratic (k=2) B-spline through (xs, ys), evaluated
    * at `at` — the textbook construction scipy's `splrep(k=2, s=0)` /
    * `make_interp_spline(k=2)` implement (reference G3 uses it for
    * `spline_degree=2`, `segmenters.py:215-225`):
    *
    *  - clamped knot vector `t0..t_{n+2}` with triple boundary knots and
    *    interior knots at the data midpoints `(x_j + x_{j+1})/2`,
    *    `j = 1..n−3` (the even-degree interpolation knot choice that
    *    satisfies Schoenberg–Whitney);
    *  - B-spline coefficients from the banded collocation solve
    *    `B c = y` (bandwidth ≤ k; totally positive, so no pivoting —
    *    de Boor, "A Practical Guide to Splines");
    *  - evaluation via the Cox–de Boor basis recursion.
    *
    * O(n) per series. `n = 2` falls back to the line through the points
    * (scipy requires n > k).
    */
  def quadratic(xs: Array[Double], ys: Array[Double], at: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2, "spline needs at least 2 points")
    if (n == 2) return linear(xs, ys, at)
    val k = 2
    val t = new Array[Double](n + k + 1)
    var i = 0
    while (i <= k) { t(i) = xs(0); t(n + i) = xs(n - 1); i += 1 }
    var j = 1
    while (j <= n - 3) { t(k + j) = (xs(j) + xs(j + 1)) / 2d; j += 1 }
    val c = collocationSolve(t, k, xs, ys)
    at.map { x =>
      val span = findSpan(t, k, n, x)
      val bas = basis(t, k, span, x)
      var s = 0d
      var r = 0
      while (r <= k) { s += bas(r) * c(span - k + r); r += 1 }
      s
    }
  }

  /** Knot span index: largest `span` in [k, n−1] with t(span) ≤ x
    * (clamped right so x = t(n) lands in the last interval).
    */
  private def findSpan(t: Array[Double], k: Int, n: Int, x: Double): Int = {
    if (x >= t(n)) return n - 1
    if (x <= t(k)) return k
    var lo = k
    var hi = n
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (t(mid) <= x) lo = mid else hi = mid
    }
    lo
  }

  /** Nonzero B-spline basis values `B_{span−k..span, k}(x)` — the Cox–de
    * Boor recursion (Piegl–Tiller "The NURBS Book", algorithm A2.2).
    */
  private def basis(t: Array[Double], k: Int, span: Int, x: Double): Array[Double] = {
    val left = new Array[Double](k + 1)
    val right = new Array[Double](k + 1)
    val out = new Array[Double](k + 1)
    out(0) = 1d
    var j = 1
    while (j <= k) {
      left(j) = x - t(span + 1 - j)
      right(j) = t(span + j) - x
      var saved = 0d
      var r = 0
      while (r < j) {
        val tmp = out(r) / (right(r + 1) + left(j - r))
        out(r) = saved + right(r + 1) * tmp
        saved = left(j - r) * tmp
        r += 1
      }
      out(j) = saved
      j += 1
    }
    out
  }

  /** Solve the banded collocation system `B c = y` (row i = basis values
    * at x_i): banded Gaussian elimination without pivoting, bandwidth k
    * each side — O(n·k²).
    */
  private def collocationSolve(
      t: Array[Double], k: Int, xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    val w = 2 * k + 1
    val ab = Array.ofDim[Double](n, w) // ab(i)(j − i + k) = B(i, j)
    val rhs = ys.clone()
    var i = 0
    while (i < n) {
      val span = findSpan(t, k, n, xs(i))
      val bas = basis(t, k, span, xs(i))
      var r = 0
      while (r <= k) {
        val col = span - k + r
        ab(i)(col - i + k) = bas(r)
        r += 1
      }
      i += 1
    }
    var m = 0
    while (m < n) {
      val piv = ab(m)(k)
      var r = m + 1
      while (r <= math.min(m + k, n - 1)) {
        val f = ab(r)(m - r + k) / piv
        if (f != 0d) {
          var col = m
          while (col <= math.min(m + k, n - 1)) {
            ab(r)(col - r + k) -= f * ab(m)(col - m + k)
            col += 1
          }
          rhs(r) -= f * rhs(m)
        }
        ab(r)(m - r + k) = 0d
        r += 1
      }
      m += 1
    }
    val c = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = rhs(i)
      var col = i + 1
      while (col <= math.min(i + k, n - 1)) {
        s -= ab(i)(col - i + k) * c(col)
        col += 1
      }
      c(i) = s / ab(i)(k)
      i -= 1
    }
    c
  }

  /** Linear interpolation with extrapolation (splrep k=1 / interp1d linear). */
  def linear(xs: Array[Double], ys: Array[Double], at: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2, "linear interp needs at least 2 points")
    at.map { x =>
      var lo = java.util.Arrays.binarySearch(xs, x)
      val i =
        if (lo >= 0) math.min(lo, n - 2)
        else math.max(0, math.min(-lo - 2, n - 2))
      val t = (x - xs(i)) / (xs(i + 1) - xs(i))
      ys(i) + t * (ys(i + 1) - ys(i))
    }
  }
}
