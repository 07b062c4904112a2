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

  /** Cubic smoothing spline with the FITPACK residual-bound semantics
    * (`splrep(k=3, s=S)`): the natural cubic spline minimizing the
    * roughness `∫ g''²` subject to `Σ (g(x_i) − y_i)² ≤ S` — the classic
    * Reinsch (1967) problem, solved in the Green–Silverman formulation
    * ("Nonparametric Regression and Generalized Linear Models" §2):
    * for a smoothing parameter λ, the interior second derivatives γ
    * solve the pentadiagonal SPD system `(T + λ QᵀQ) γ = Qᵀy`, fitted
    * values are `g = y − λQγ`, and the residual `R(λ) = λ²‖Qγ‖²` is
    * monotone in λ — so the bound S is met by bisection on log λ.
    * O(n) per solve. `S` large enough returns the least-squares line
    * (the λ→∞ limit); `S = 0` is the interpolating natural spline.
    */
  def smoothing(
      xs: Array[Double], ys: Array[Double], s: Double,
      at: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2, "spline needs at least 2 points")
    require(s >= 0, s"smoothing must be >= 0, got $s")
    if (n <= 2) return linear(xs, ys, at)
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val d = Array.tabulate(n - 1)(i => (ys(i + 1) - ys(i)) / h(i))
    val k = n - 2 // interior points 1..n-2
    val qty = Array.tabulate(k)(j => d(j + 1) - d(j)) // (Qᵀy)
    // fitted values and residual at one λ
    def solveAt(lam: Double): (Array[Double], Array[Double], Double) = {
      // pentadiagonal A = T + λ QᵀQ over interior indices (0-based j ↔ data i=j+1)
      val diag = new Array[Double](k)
      val off1 = new Array[Double](math.max(k - 1, 0))
      val off2 = new Array[Double](math.max(k - 2, 0))
      var j = 0
      while (j < k) {
        val i = j + 1
        val a = 1.0 / h(i - 1); val b = 1.0 / h(i)
        diag(j) = (h(i - 1) + h(i)) / 3.0 + lam * (a * a + (a + b) * (a + b) + b * b)
        if (j < k - 1) {
          val bn = 1.0 / h(i + 1)
          off1(j) = h(i) / 6.0 + lam * (-(a + b) * b - b * (b + bn))
        }
        if (j < k - 2) off2(j) = lam * (1.0 / h(i) * (1.0 / h(i + 1)))
        j += 1
      }
      val gam = pentaSolve(diag, off1, off2, qty.clone())
      // g = y − λ Q γ ; (Qγ)_i over all data rows
      val qg = new Array[Double](n)
      j = 0
      while (j < k) {
        val i = j + 1
        qg(i - 1) += gam(j) / h(i - 1)
        qg(i) -= gam(j) * (1.0 / h(i - 1) + 1.0 / h(i))
        qg(i + 1) += gam(j) / h(i)
        j += 1
      }
      val g = Array.tabulate(n)(i => ys(i) - lam * qg(i))
      var r = 0.0
      var i = 0
      while (i < n) { val e = lam * qg(i); r += e * e; i += 1 }
      (g, gam, r)
    }
    // λ → ∞ limit: least-squares line. If its residual ≤ S, return it.
    val (lineRes, lineEval) = {
      val mx = xs.sum / n; val my = ys.sum / n
      var sxx = 0.0; var sxy = 0.0
      var i = 0
      while (i < n) { sxx += (xs(i) - mx) * (xs(i) - mx); sxy += (xs(i) - mx) * (ys(i) - my); i += 1 }
      val slope = if (sxx > 0) sxy / sxx else 0.0
      var r = 0.0
      i = 0
      while (i < n) { val e = ys(i) - (my + slope * (xs(i) - mx)); r += e * e; i += 1 }
      (r, (x: Double) => my + slope * (x - mx))
    }
    if (lineRes <= s) return at.map(lineEval)
    // bisect log λ to R(λ) = S (R monotone increasing in λ)
    var lo = 0.0 // R(0) = 0 ≤ S
    var hi = 1.0
    while (solveAt(hi)._3 < s && hi < 1e18) hi *= 8
    var it = 0
    while (it < 80) { // ~1e-24 relative bracket
      val mid = if (lo == 0.0) hi / 1e12 max Double.MinPositiveValue else math.sqrt(lo * hi)
      if (solveAt(mid)._3 < s) lo = mid else hi = mid
      it += 1
    }
    // lo is the feasible side (R ≤ S — the constraint FITPACK honors)
    val (g, gam, _) = solveAt(if (lo > 0) lo else hi)
    // natural cubic through (xs, g) with interior second derivatives γ·? —
    // the Green–Silverman γ IS the second-derivative vector of the fitted
    // natural spline at the interior knots (γ_0 = γ_{n−1} = 0)
    val m = new Array[Double](n)
    var j = 0
    while (j < k) { m(j + 1) = gam(j); j += 1 }
    at.map { x =>
      val lo2 = java.util.Arrays.binarySearch(xs, x)
      val i =
        if (lo2 >= 0) math.min(lo2, n - 2)
        else math.max(0, math.min(-lo2 - 2, n - 2))
      val hh = xs(i + 1) - xs(i)
      val a = (xs(i + 1) - x) / hh
      val b = (x - xs(i)) / hh
      a * g(i) + b * g(i + 1) +
        ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) * hh * hh / 6.0
    }
  }

  /** Symmetric pentadiagonal solve (Cholesky-free banded elimination
    * without pivoting — the smoothing system is SPD). Overwrites `rhs`.
    */
  private def pentaSolve(
      diag: Array[Double], off1: Array[Double], off2: Array[Double],
      rhs: Array[Double]): Array[Double] = {
    val k = diag.length
    // expand to general banded storage (lower/upper bandwidth 2)
    val ab = Array.ofDim[Double](k, 5)
    var i = 0
    while (i < k) {
      ab(i)(2) = diag(i)
      if (i < k - 1) { ab(i)(3) = off1(i); ab(i + 1)(1) = off1(i) }
      if (i < k - 2) { ab(i)(4) = off2(i); ab(i + 2)(0) = off2(i) }
      i += 1
    }
    var m = 0
    while (m < k) {
      val piv = ab(m)(2)
      var r = m + 1
      while (r <= math.min(m + 2, k - 1)) {
        val f = ab(r)(m - r + 2) / piv
        if (f != 0d) {
          var c = m
          while (c <= math.min(m + 2, k - 1)) {
            ab(r)(c - r + 2) -= f * ab(m)(c - m + 2)
            c += 1
          }
          rhs(r) -= f * rhs(m)
        }
        ab(r)(m - r + 2) = 0d
        r += 1
      }
      m += 1
    }
    val out = new Array[Double](k)
    i = k - 1
    while (i >= 0) {
      var acc = rhs(i)
      var c = i + 1
      while (c <= math.min(i + 2, k - 1)) { acc -= ab(i)(c - i + 2) * out(c); c += 1 }
      out(i) = acc / ab(i)(2)
      i -= 1
    }
    out
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
