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
