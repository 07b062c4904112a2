package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.HashRandom

/** Dynamic-system simulation sources (reference M1–M5,
  * `fdi_flow/models/linear_models.py:4-147`, `nonlinear_models.py:5-126`,
  * `data_generators.py:3-90`).
  *
  * Spark mapping (SURVEY §2.4): a simulation batch is
  * `spark.range(numSimulations).mapPartitions(integrate)` — embarrassingly
  * parallel across simulations (the engine's native data-generator
  * source); a single trajectory streams its steps through an iterator
  * (O(state) memory, no per-sim buffering). All randomness is
  * [[HashRandom]]-derived per (seed, simId, dim) so any simulation is
  * reproducible on any executor without RNG state.
  *
  * Integration methods — one per `solve_ivp` family the reference
  * accepts (`linear_models.py:70-75` passes the method string through):
  * fixed-step explicit Euler (bit-parity with the reference's `'euler'`
  * branch, including its post-update output quirk), classic fixed-step
  * RK4, adaptive explicit embedded pairs `'rk45'` (Dormand–Prince 5(4),
  * the `solve_ivp` default), `'rk23'` (Bogacki–Shampine 3(2)) and
  * `'dop853'` (Hairer's 12-stage Dormand–Prince 8(5,3)) with
  * error-controlled internal sub-steps between eval-grid points so fast
  * dynamics stay stable on coarse grids, implicit adaptive `'radau'`
  * (Radau IIA(5)) and `'bdf'` (variable-step BDF2, Gear's family) whose
  * A-stability lets step size follow accuracy instead of the explicit
  * stability limit on stiff systems, and `'lsoda'` — automatic
  * nonstiff/stiff switching (explicit pair until its sub-step budget
  * trips, then Radau, retrying explicit periodically), in the spirit of
  * Petzold's LSODA. Solver branches emit states at the eval grid
  * starting from x0 (matching `solve_ivp(t_eval=time)`), while the
  * Euler branch emits post-update states (`linear_models.py:62-64`).
  */
object Simulators {

  /** One simulation step (long-format trajectory row). */
  final case class SimStep(
      sim_id: Long, step: Long, time: Double,
      state: Array[Double], input: Array[Double], output: Array[Double])

  // ── tiny dense linear algebra (row-major; n,m,p are small) ──
  private[graft] def matVec(a: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) {
      val row = a(i); var s = 0d; var j = 0
      while (j < row.length) { s += row(j) * x(j); j += 1 }
      out(i) = s; i += 1
    }
    out
  }
  private def addScaled(x: Array[Double], d: Array[Double], h: Double): Array[Double] = {
    val out = new Array[Double](x.length)
    var i = 0
    while (i < x.length) { out(i) = x(i) + d(i) * h; i += 1 }
    out
  }
  private def add2(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  /** Common simulate surface: `u` is (nSteps, m); continuous models use
    * `tFinal`/`dt`, discrete ones step over `u` with `dt` spacing.
    */
  trait StateSpaceModel extends Serializable {
    def inputDim: Int
    def simulate(simId: Long, u: IndexedSeq[Array[Double]], x0: Array[Double],
                 tFinal: Double, dt: Double): Iterator[SimStep]
  }

  /** np.linspace(0, tFinal, n) — endpoint included (`linear_models.py:44`). */
  private def linspace(tFinal: Double, n: Int)(i: Int): Double =
    if (n > 1) i.toDouble * tFinal / (n - 1) else 0.0

  /** ZOH input lookup `u_interp` (`linear_models.py:46-48`). */
  private def zoh(u: IndexedSeq[Array[Double]], dt: Double)(t: Double): Array[Double] =
    u(math.min((t / dt).toInt, u.length - 1))

  /** Shared continuous integrator over a RHS f(x, u, t). */
  private def integrate(
      simId: Long, f: (Array[Double], Array[Double], Double) => Array[Double],
      out: (Array[Double], Array[Double], Double) => Array[Double],
      u: IndexedSeq[Array[Double]], x0: Array[Double],
      tFinal: Double, dt: Double, method: String): Iterator[SimStep] = {
    val nSteps = (tFinal / dt).toInt
    val t = linspace(tFinal, nSteps) _
    val uAt = zoh(u, dt) _
    method match {
      case "euler" =>
        // reference quirk (`linear_models.py:60-68`): x is updated BEFORE
        // the output, so states[i]/outputs[i] reflect the post-step state;
        // the input indexes the raw step counter, not the linspace grid
        var x = x0
        Iterator.tabulate(nSteps) { i =>
          val ui = u(math.min(i, u.length - 1))
          x = addScaled(x, f(x, ui, t(i)), dt)
          SimStep(simId, i.toLong, t(i), x, ui, out(x, ui, t(i)))
        }
      case "rk4" =>
        // solve_ivp branch shape: states at the eval grid, states[0] = x0
        var x = x0
        Iterator.tabulate(nSteps) { i =>
          if (i > 0) {
            val h = t(i) - t(i - 1)
            val t0 = t(i - 1)
            val k1 = f(x, uAt(t0), t0)
            val k2 = f(addScaled(x, k1, h / 2), uAt(t0 + h / 2), t0 + h / 2)
            val k3 = f(addScaled(x, k2, h / 2), uAt(t0 + h / 2), t0 + h / 2)
            val k4 = f(addScaled(x, k3, h), uAt(t0 + h), t0 + h)
            // x += h/6 · (k1 + 2k2 + 2k3 + k4)
            x = addScaled(x, add2(k1, addScaled(k4, add2(k2, k3), 2.0)), h / 6)
          }
          val ui = uAt(t(i))
          SimStep(simId, i.toLong, t(i), x, ui, out(x, ui, t(i)))
        }
      case "rk45" | "rk23" | "dop853" =>
        // adaptive explicit branch: states at the eval grid, states[0] =
        // x0, each interval advanced by adaptive embedded-pair sub-steps
        // (Dormand–Prince 5(4), Bogacki–Shampine 3(2), or the 12-stage
        // Dormand–Prince 8(5,3) behind scipy's DOP853)
        val pair = method match {
          case "rk45" => Dopri54
          case "rk23" => Bs32
          case _ => Dop853
        }
        var x = x0
        Iterator.tabulate(nSteps) { i =>
          if (i > 0) x = rkAdvance(pair, f, uAt, x, t(i - 1), t(i)).get
          val ui = uAt(t(i))
          SimStep(simId, i.toLong, t(i), x, ui, out(x, ui, t(i)))
        }
      case "bdf" =>
        // implicit multistep branch for STIFF systems (Gear's BDF family,
        // scipy solve_ivp(method='BDF')): variable-step BDF2 with Newton,
        // same eval-grid contract as the other solve_ivp branches
        var x = x0
        Iterator.tabulate(nSteps) { i =>
          if (i > 0) x = bdfAdvance(f, uAt, x, t(i - 1), t(i))
          val ui = uAt(t(i))
          SimStep(simId, i.toLong, t(i), x, ui, out(x, ui, t(i)))
        }
      case "lsoda" =>
        // automatic nonstiff/stiff switching in the spirit of LSODA
        // (Petzold 1983, scipy solve_ivp(method='LSODA')): run the cheap
        // explicit pair while it terminates within a sub-step budget;
        // when the stability limit makes it spin (the budget trips),
        // switch to implicit Radau, retrying the explicit path
        // periodically in case the stiff transient has passed
        var x = x0
        var stiff = false
        var sinceSwitch = 0
        Iterator.tabulate(nSteps) { i =>
          if (i > 0) {
            val (ta, tb) = (t(i - 1), t(i))
            val tryExplicit = !stiff || sinceSwitch >= LsodaRetryEvery
            val explicitRes =
              if (tryExplicit) rkAdvance(Dopri54, f, uAt, x, ta, tb,
                maxSteps = LsodaExplicitBudget)
              else None
            explicitRes match {
              case Some(nx) =>
                x = nx
                stiff = false
              case None =>
                if (tryExplicit) sinceSwitch = 0 else sinceSwitch += 1
                stiff = true
                x = radauAdvance(f, uAt, x, ta, tb)
            }
          }
          val ui = uAt(t(i))
          SimStep(simId, i.toLong, t(i), x, ui, out(x, ui, t(i)))
        }
      case "radau" =>
        // implicit adaptive branch for STIFF systems: same eval-grid
        // contract as rk45, each interval advanced by adaptive Radau IIA
        // steps (A-stable — step size is chosen by accuracy, not the
        // stability limit that throttles explicit methods on stiff RHS)
        var x = x0
        Iterator.tabulate(nSteps) { i =>
          if (i > 0) x = radauAdvance(f, uAt, x, t(i - 1), t(i))
          val ui = uAt(t(i))
          SimStep(simId, i.toLong, t(i), x, ui, out(x, ui, t(i)))
        }
      case other => throw new IllegalArgumentException(
        s"method must be euler|rk4|rk45|rk23|dop853|radau|bdf|lsoda, got $other")
    }
  }

  /** Butcher tableau of an embedded explicit RK pair: `bHigh` is the
    * propagated (higher-order) solution, `bLow` the error estimator,
    * `errExp` the step-controller exponent `1/(errOrder+1)`. When
    * `err1`/`err2` are set (the 8(5,3) case), `bLow` is unused and the
    * error is Hairer's two-estimator combination instead: with
    * `S_m = Σ_i (Σ_j err_m[j]·k_j[i] / sc_i)²` the step error is
    * `|h|·S₁/√(n·(S₁ + 0.01·S₂))` — the 3rd-order estimate damps the
    * 5th-order one so a superconvergent point can't fool the controller
    * (Hairer, Nørsett & Wanner, "Solving ODEs I", §II.10, dop853's
    * published device).
    */
  private final case class RkPair(
      c: Array[Double], a: Array[Array[Double]],
      bHigh: Array[Double], bLow: Array[Double], errExp: Double,
      err1: Array[Double] = null, err2: Array[Double] = null)

  /** Dormand–Prince 5(4) — the pair scipy's `solve_ivp(method='RK45')`
    * uses (Dormand & Prince 1980; tableau is public knowledge).
    */
  private val Dopri54 = RkPair(
    c = Array(0d, 0.2, 0.3, 0.8, 8d / 9, 1d, 1d),
    a = Array(
      Array.empty[Double],
      Array(0.2),
      Array(3d / 40, 9d / 40),
      Array(44d / 45, -56d / 15, 32d / 9),
      Array(19372d / 6561, -25360d / 2187, 64448d / 6561, -212d / 729),
      Array(9017d / 3168, -355d / 33, 46732d / 5247, 49d / 176, -5103d / 18656),
      Array(35d / 384, 0d, 500d / 1113, 125d / 192, -2187d / 6784, 11d / 84)),
    bHigh = Array(35d / 384, 0d, 500d / 1113, 125d / 192, -2187d / 6784, 11d / 84, 0d),
    bLow = Array(5179d / 57600, 0d, 7571d / 16695, 393d / 640,
      -92097d / 339200, 187d / 2100, 1d / 40),
    errExp = 0.2)

  /** Bogacki–Shampine 3(2) — scipy's `solve_ivp(method='RK23')` pair
    * (Bogacki & Shampine 1989). Third order propagated, second-order
    * error estimate.
    */
  private val Bs32 = RkPair(
    c = Array(0d, 0.5, 0.75, 1d),
    a = Array(
      Array.empty[Double],
      Array(0.5),
      Array(0d, 0.75),
      Array(2d / 9, 1d / 3, 4d / 9)),
    bHigh = Array(2d / 9, 1d / 3, 4d / 9, 0d),
    bLow = Array(7d / 24, 0.25, 1d / 3, 0.125),
    errExp = 1d / 3)

  /** Dormand–Prince 8(5,3) — the pair behind Hairer's dop853 and scipy's
    * `solve_ivp(method='DOP853')` (Hairer, Nørsett & Wanner, "Solving
    * ODEs I", §II.5 table 5.2 / the published dop853.f). 12 stages for
    * the 8th-order solution; the 13th (FSAL/dense-output) stage has
    * `b₁₃ = 0` and no error weight, so it is omitted here. `err1`/`err2`
    * are the embedded 5th- and 3rd-order error estimators combined per
    * the [[RkPair]] doc. Constants are the double-rounded values of the
    * published rational tableau.
    */
  private val Dop853 = RkPair(
    c = Array(0d, 0.05260015195876774, 0.0789002279381516, 0.1183503419072274,
      0.28164965809277265, 0.3333333333333333, 0.25, 0.3076923076923077,
      0.6512820512820513, 0.6, 0.8571428571428571, 1d),
    a = Array(
      Array.empty[Double],
      Array(0.05260015195876774),
      Array(0.0197250569845379, 0.0591751709536137),
      Array(0.02958758547680685, 0.0, 0.08876275643042056),
      Array(0.24136513415926666, 0.0, -0.884549479328286, 0.9248340032617919),
      Array(0.037037037037037035, 0.0, 0.0, 0.1708286087294739, 0.12546768756682242),
      Array(0.037109375, 0.0, 0.0, 0.17025221101954402, 0.060216538980455966,
        -0.017578125),
      Array(0.03709200011850479, 0.0, 0.0, 0.17038392571223998, 0.1072620304463733,
        -0.015319437748624402, 0.008273789163814023),
      Array(0.6241109587160757, 0.0, 0.0, -3.360892629446941, -0.8682193468417261,
        27.59209969944671, 20.154067550477894, -43.48988418106996),
      Array(0.47766253643826434, 0.0, 0.0, -2.4881146199716677, -0.5902908268368431,
        21.230051448181193, 15.279233632882423, -33.28821096898486,
        -0.020331201708508627),
      Array(-0.9371424300859873, 0.0, 0.0, 5.186372428844064, 1.09143734899673,
        -8.149787010746927, -18.52006565999696, 22.739487099350505,
        2.4936055526796523, -3.0467644718982196),
      Array(2.273310147516538, 0.0, 0.0, -10.53449546673725, -2.000872058224863,
        -17.9589318631188, 27.94888452941996, -2.8589982771350235,
        -8.87285693353063, 12.360567175794303, 0.6433927460157636)),
    bHigh = Array(0.054293734116568765, 0.0, 0.0, 0.0, 0.0, 4.450312892752409,
      1.8915178993145003, -5.801203960010585, 0.3111643669578199,
      -0.1521609496625161, 0.20136540080403034, 0.04471061572777259),
    bLow = null,
    errExp = 0.125,
    err1 = Array(0.01312004499419488, 0.0, 0.0, 0.0, 0.0, -1.2251564463762044,
      -0.4957589496572502, 1.6643771824549864, -0.35032884874997366,
      0.3341791187130175, 0.08192320648511571, -0.022355307863886294),
    err2 = Array(-0.18980075407240762, 0.0, 0.0, 0.0, 0.0, 4.450312892752409,
      1.8915178993145003, -5.801203960010585, -0.42268232132379197,
      -0.1521609496625161, 0.20136540080403034, 0.022651792198360825))

  /** Advance from `t0` to `t1` with adaptive embedded-pair steps. Error
    * control per scipy's convention: RMS of the component errors scaled
    * by `atol + rtol·max(|x|, |x_new|)`, accept when ≤ 1, step factor
    * `0.9·err^{−errExp}` clamped to [0.2, 5]. Sub-steps land exactly on
    * `t1`, so grid states need no dense-output interpolant — unlike
    * fixed-step RK4 this keeps fast dynamics stable on a coarse eval
    * grid by shrinking the internal step. Returns None when more than
    * `maxSteps` attempted sub-steps are needed — the stiffness signal
    * the `lsoda` branch switches on (explicit steps pinned at the
    * stability limit, not the accuracy limit).
    */
  private def rkAdvance(
      pair: RkPair,
      f: (Array[Double], Array[Double], Double) => Array[Double],
      uAt: Double => Array[Double],
      x0: Array[Double], t0: Double, t1: Double,
      rtol: Double = 1e-6, atol: Double = 1e-9,
      maxSteps: Int = Int.MaxValue): Option[Array[Double]] = {
    val n = x0.length
    val nStages = pair.c.length
    var x = x0
    var t = t0
    var h = t1 - t0
    val hMin = math.max(1e-14 * (t1 - t0), java.lang.Double.MIN_NORMAL)
    var attempts = 0
    while (t < t1) {
      attempts += 1
      if (attempts > maxSteps) return None
      if (h > t1 - t) h = t1 - t
      val k = new Array[Array[Double]](nStages)
      var s = 0
      while (s < nStages) {
        val xs =
          if (s == 0) x
          else {
            val acc = x.clone()
            var j = 0
            while (j < s) {
              val kj = k(j); val aj = pair.a(s)(j)
              if (aj != 0d) { var i = 0; while (i < n) { acc(i) += h * aj * kj(i); i += 1 } }
              j += 1
            }
            acc
          }
        val ts = t + pair.c(s) * h
        k(s) = f(xs, uAt(ts), ts)
        s += 1
      }
      val xHi = x.clone()
      val xLo = if (pair.err1 == null) x.clone() else null
      var j = 0
      while (j < nStages) {
        val kj = k(j)
        var i = 0
        while (i < n) {
          xHi(i) += h * pair.bHigh(j) * kj(i)
          if (xLo != null) xLo(i) += h * pair.bLow(j) * kj(i)
          i += 1
        }
        j += 1
      }
      var err = 0d
      if (pair.err1 == null) {
        var errSq = 0d
        var i = 0
        while (i < n) {
          val sc = atol + rtol * math.max(math.abs(x(i)), math.abs(xHi(i)))
          val e = (xHi(i) - xLo(i)) / sc
          errSq += e * e
          i += 1
        }
        err = math.sqrt(errSq / n)
      } else {
        // Hairer's 8(5,3) combination (see RkPair doc): the k-weighted
        // estimator sums carry no h factor; |h| is applied at the end
        var s1 = 0d
        var s2 = 0d
        var i = 0
        while (i < n) {
          var v1 = 0d
          var v2 = 0d
          var j2 = 0
          while (j2 < nStages) {
            v1 += pair.err1(j2) * k(j2)(i)
            v2 += pair.err2(j2) * k(j2)(i)
            j2 += 1
          }
          val sc = atol + rtol * math.max(math.abs(x(i)), math.abs(xHi(i)))
          s1 += (v1 / sc) * (v1 / sc)
          s2 += (v2 / sc) * (v2 / sc)
          i += 1
        }
        var den = s1 + 0.01 * s2
        if (den <= 0d) den = 1d
        err = math.abs(h) * s1 / math.sqrt(n * den)
      }
      if (err <= 1d || h <= hMin) {
        t += h
        x = xHi
      }
      val factor =
        if (err == 0d) 5d
        else math.min(5d, math.max(0.2, 0.9 * math.pow(err, -pair.errExp)))
      h = math.max(h * factor, hMin)
    }
    Some(x)
  }

  /** `lsoda` switching knobs: an interval whose explicit advance needs
    * more than this many attempted sub-steps is declared stiff (nonstiff
    * dynamics on an eval-grid interval need a handful); once stiff, the
    * explicit path is retried every this-many intervals.
    */
  private val LsodaExplicitBudget = 24
  private val LsodaRetryEvery = 25

  // ── Radau IIA(5): 3-stage implicit collocation (Hairer & Wanner,
  //    "Solving ODEs II — Stiff and DAE Problems"; the tableau is public
  //    knowledge, and scipy's solve_ivp(method='Radau') is the same
  //    family). A-stable and stiffly accurate: x_new = last stage. ──
  private val Sqrt6 = math.sqrt(6.0)
  private val RadauC = Array((4.0 - Sqrt6) / 10.0, (4.0 + Sqrt6) / 10.0, 1.0)
  private val RadauA = Array(
    Array((88.0 - 7.0 * Sqrt6) / 360.0, (296.0 - 169.0 * Sqrt6) / 1800.0, (-2.0 + 3.0 * Sqrt6) / 225.0),
    Array((296.0 + 169.0 * Sqrt6) / 1800.0, (88.0 + 7.0 * Sqrt6) / 360.0, (-2.0 - 3.0 * Sqrt6) / 225.0),
    Array((16.0 - Sqrt6) / 36.0, (16.0 + Sqrt6) / 36.0, 1.0 / 9.0))

  /** One Radau IIA step of size `h` from (x, t): solve the 3n stage
    * equations `X_i = x + h Σ_j a_ij f(X_j)` by simplified Newton (one
    * finite-difference Jacobian and one 3n×3n factorization per step —
    * n is the model state dimension, small by construction). Returns
    * None when Newton fails to converge (caller halves h).
    */
  private def radauStep(
      f: (Array[Double], Array[Double], Double) => Array[Double],
      uAt: Double => Array[Double],
      x: Array[Double], t: Double, h: Double): Option[Array[Double]] = {
    val n = x.length
    // finite-difference Jacobian at (x, t)
    val f0 = f(x, uAt(t), t)
    val jac = Array.ofDim[Double](n, n)
    var j = 0
    while (j < n) {
      val d = math.sqrt(2.2e-16) * math.max(1.0, math.abs(x(j)))
      val xp = x.clone(); xp(j) += d
      val fp = f(xp, uAt(t), t)
      var r = 0
      while (r < n) { jac(r)(j) = (fp(r) - f0(r)) / d; r += 1 }
      j += 1
    }
    // iteration matrix M = I_{3n} − h·(A ⊗ J), factored once via inverse
    val m = Array.ofDim[Double](3 * n, 3 * n)
    var i = 0
    while (i < 3) {
      j = 0
      while (j < 3) {
        var r = 0
        while (r < n) {
          var s = 0
          while (s < n) {
            m(i * n + r)(j * n + s) =
              (if (i == j && r == s) 1.0 else 0.0) - h * RadauA(i)(j) * jac(r)(s)
            s += 1
          }
          r += 1
        }
        j += 1
      }
      i += 1
    }
    val mInv =
      try graft.functions.Mat.inv(m)
      catch { case _: IllegalArgumentException => return None }
    // simplified Newton on the stacked stages
    val stages = Array.fill(3)(x.clone())
    var iter = 0
    while (iter < 12) {
      val fs = Array.tabulate(3)(i2 =>
        f(stages(i2), uAt(t + RadauC(i2) * h), t + RadauC(i2) * h))
      val res = new Array[Double](3 * n)
      i = 0
      while (i < 3) {
        var r = 0
        while (r < n) {
          var acc = stages(i)(r) - x(r)
          var j2 = 0
          while (j2 < 3) { acc -= h * RadauA(i)(j2) * fs(j2)(r); j2 += 1 }
          res(i * n + r) = acc
          r += 1
        }
        i += 1
      }
      val delta = matVec(mInv, res)
      var dmax = 0.0
      i = 0
      while (i < 3) {
        var r = 0
        while (r < n) {
          stages(i)(r) -= delta(i * n + r)
          dmax = math.max(dmax, math.abs(delta(i * n + r)))
          r += 1
        }
        i += 1
      }
      if (dmax < 1e-12 * (1.0 + x.map(math.abs).max)) return Some(stages(2))
      iter += 1
    }
    // not converged to machine precision — accept if the last correction
    // was already small, else signal the caller to shrink h
    None
  }

  /** Advance from t0 to t1 with adaptive Radau IIA(5) steps; error
    * control by step doubling (one h step vs two h/2 steps, order-5
    * Richardson factor 2⁵−1), scipy-convention scaling like
    * [[rk45Advance]]. The h/2 solution is the one advanced (it is the
    * more accurate of the pair).
    */
  private def radauAdvance(
      f: (Array[Double], Array[Double], Double) => Array[Double],
      uAt: Double => Array[Double],
      x0: Array[Double], t0: Double, t1: Double,
      rtol: Double = 1e-6, atol: Double = 1e-9): Array[Double] = {
    val n = x0.length
    var x = x0
    var t = t0
    var h = t1 - t0
    val hMin = math.max(1e-14 * (t1 - t0), java.lang.Double.MIN_NORMAL)
    while (t < t1) {
      if (h > t1 - t) h = t1 - t
      val attempt = for {
        xh <- radauStep(f, uAt, x, t, h)
        xa <- radauStep(f, uAt, x, t, h / 2)
        x2 <- radauStep(f, uAt, xa, t + h / 2, h / 2)
      } yield (xh, x2)
      attempt match {
        case None =>
          // Newton failed — stiff transient too fast for this h
          h = math.max(h / 4, hMin)
          if (h <= hMin) throw new ArithmeticException(
            s"radau: Newton cannot converge at minimum step (t=$t)")
        case Some((xh, x2)) =>
          var errSq = 0.0
          var i = 0
          while (i < n) {
            val sc = atol + rtol * math.max(math.abs(x(i)), math.abs(x2(i)))
            val e = (x2(i) - xh(i)) / (31.0 * sc) // 2^5 − 1
            errSq += e * e
            i += 1
          }
          val err = math.sqrt(errSq / n)
          if (err <= 1.0 || h <= hMin) {
            t += h
            x = x2
          }
          val factor =
            if (err == 0.0) 5.0
            else math.min(5.0, math.max(0.2, 0.9 * math.pow(err, -0.2)))
          h = math.max(h * factor, hMin)
      }
    }
    x
  }

  /** Solve the implicit stage equation `z = rhsConst + gh·f(z, t)` by
    * Newton with one finite-difference Jacobian factored once (n is the
    * model state dimension, small by construction) — the shared kernel of
    * every BDF corrector (backward Euler is `gh = h, rhsConst = x`).
    * Returns None when Newton fails to converge (caller shrinks h).
    */
  private def implicitSolve(
      f: (Array[Double], Array[Double], Double) => Array[Double],
      uAt: Double => Array[Double],
      rhsConst: Array[Double], gh: Double, tNew: Double,
      guess: Array[Double]): Option[Array[Double]] = {
    val n = guess.length
    val u = uAt(tNew)
    val f0 = f(guess, u, tNew)
    val jac = Array.ofDim[Double](n, n)
    var j = 0
    while (j < n) {
      val d = math.sqrt(2.2e-16) * math.max(1.0, math.abs(guess(j)))
      val gp = guess.clone(); gp(j) += d
      val fp = f(gp, u, tNew)
      var r = 0
      while (r < n) { jac(r)(j) = (fp(r) - f0(r)) / d; r += 1 }
      j += 1
    }
    val m = Array.tabulate(n, n)((r, s) =>
      (if (r == s) 1.0 else 0.0) - gh * jac(r)(s))
    val mInv =
      try graft.functions.Mat.inv(m)
      catch { case _: IllegalArgumentException => return None }
    val z = guess.clone()
    var iter = 0
    while (iter < 12) {
      val fz = f(z, u, tNew)
      val res = new Array[Double](n)
      var r = 0
      while (r < n) { res(r) = z(r) - gh * fz(r) - rhsConst(r); r += 1 }
      val delta = matVec(mInv, res)
      var dmax = 0.0
      r = 0
      while (r < n) {
        z(r) -= delta(r)
        dmax = math.max(dmax, math.abs(delta(r)))
        r += 1
      }
      if (dmax < 1e-12 * (1.0 + z.map(math.abs).max)) return Some(z)
      iter += 1
    }
    None
  }

  /** Advance from t0 to t1 with variable-step BDF — Gear's backward
    * differentiation family (Gear 1971; scipy's `solve_ivp(method='BDF')`
    * is the same family at orders 1–5). Order 2 here: the first step is a
    * pair of backward-Euler half-steps (establishing history AND a
    * Richardson error estimate), every later step the variable-step BDF2
    * corrector
    * `x₊ = ((1+ρ)²xₙ − ρ²xₙ₋₁)/(1+2ρ) + h(1+ρ)/(1+2ρ)·f(x₊)`, ρ = h/hₚᵣₑᵥ
    * (uniform-ρ limit: the classic (4xₙ−xₙ₋₁)/3 + ⅔h·f). Local error is
    * estimated predictor-corrector style (Gear's device): the corrector
    * minus the linear extrapolant through the history, scaled like
    * [[rkAdvance]]. A-stable at order ≤ 2, so the step follows accuracy,
    * not the explicit stability limit, on stiff systems.
    */
  private def bdfAdvance(
      f: (Array[Double], Array[Double], Double) => Array[Double],
      uAt: Double => Array[Double],
      x0: Array[Double], t0: Double, t1: Double,
      rtol: Double = 1e-6, atol: Double = 1e-9): Array[Double] = {
    val n = x0.length
    val hMin = math.max(1e-14 * (t1 - t0), java.lang.Double.MIN_NORMAL)
    var t = t0
    var h = (t1 - t0) / 2
    var xPrev: Array[Double] = null // state at t − hPrev (null until bootstrap)
    var xCur = x0
    var hPrev = 0d
    def rms(a: Array[Double], b: Array[Double], base: Array[Double]): Double = {
      var errSq = 0d
      var i = 0
      while (i < n) {
        val sc = atol + rtol * math.max(math.abs(base(i)), math.abs(a(i)))
        val e = (a(i) - b(i)) / sc
        errSq += e * e
        i += 1
      }
      math.sqrt(errSq / n)
    }
    while (t < t1) {
      if (h > t1 - t) h = t1 - t
      if (xPrev == null) {
        // bootstrap: backward Euler over h vs two half-steps; the pair is
        // both the O(h²) Richardson error estimate (2¹−1 = 1) and, on
        // accept, a ready-made two-point history with spacing h/2
        val attempt = for {
          xf <- implicitSolve(f, uAt, xCur, h, t + h, xCur)
          xa <- implicitSolve(f, uAt, xCur, h / 2, t + h / 2, xCur)
          xb <- implicitSolve(f, uAt, xa, h / 2, t + h, xa)
        } yield (xf, xa, xb)
        attempt match {
          case None =>
            if (h <= hMin) throw new ArithmeticException(
              s"bdf: Newton cannot converge at minimum step (t=$t)")
            h = math.max(h / 4, hMin)
          case Some((xf, xa, xb)) =>
            val err = rms(xb, xf, xCur)
            if (err <= 1d || h <= hMin) {
              xPrev = xa; xCur = xb; hPrev = h / 2
              t += h
            }
            val factor =
              if (err == 0d) 5d
              else math.min(5d, math.max(0.2, 0.9 * math.pow(err, -0.5)))
            h = math.max(h * factor, hMin)
        }
      } else {
        val rho = h / hPrev
        val w = 1d + rho
        val den = 1d + 2d * rho
        val rhsConst = new Array[Double](n)
        val pred = new Array[Double](n)
        var i = 0
        while (i < n) {
          rhsConst(i) = (w * w * xCur(i) - rho * rho * xPrev(i)) / den
          pred(i) = xCur(i) + rho * (xCur(i) - xPrev(i))
          i += 1
        }
        implicitSolve(f, uAt, rhsConst, h * w / den, t + h, pred) match {
          case None =>
            if (h <= hMin) throw new ArithmeticException(
              s"bdf: Newton cannot converge at minimum step (t=$t)")
            h = math.max(h / 4, hMin)
          case Some(xNew) =>
            val err = rms(xNew, pred, xCur)
            if (err <= 1d || h <= hMin) {
              xPrev = xCur; xCur = xNew; hPrev = h
              t += h
            }
            // the estimate tracks the predictor's O(h²) error → exponent ½
            val factor =
              if (err == 0d) 5d
              else math.min(5d, math.max(0.2, 0.9 * math.pow(err, -0.5)))
            h = math.max(h * factor, hMin)
        }
      }
    }
    xCur
  }

  /** M1 — `LinearContinuousStateSpaceModel` (`linear_models.py:4-82`):
    * dx = Ax + Bu, y = Cx + Du.
    */
  final case class LinearContinuous(
      a: Array[Array[Double]], b: Array[Array[Double]],
      c: Array[Array[Double]], d: Array[Array[Double]],
      method: String = "euler") extends StateSpaceModel {
    override def inputDim: Int = b(0).length
    override def simulate(simId: Long, u: IndexedSeq[Array[Double]], x0: Array[Double],
                          tFinal: Double, dt: Double): Iterator[SimStep] =
      integrate(simId,
        (x, ui, _) => add2(matVec(a, x), matVec(b, ui)),
        (x, ui, _) => add2(matVec(c, x), matVec(d, ui)),
        u, x0, tFinal, dt, method)
  }

  /** M3 — `NonlinearStateSpaceModel` (`nonlinear_models.py:5-62`):
    * user-supplied f(x,u,t), g(x,u,t); fixed-step RK4 for the reference's
    * solve_ivp default.
    */
  final case class NonlinearContinuous(
      f: (Array[Double], Array[Double], Double) => Array[Double],
      g: (Array[Double], Array[Double], Double) => Array[Double],
      override val inputDim: Int,
      method: String = "rk4") extends StateSpaceModel {
    override def simulate(simId: Long, u: IndexedSeq[Array[Double]], x0: Array[Double],
                          tFinal: Double, dt: Double): Iterator[SimStep] =
      integrate(simId, f, g, u, x0, tFinal, dt, method)
  }

  /** M2/M4 — discrete systems. The reference is asymmetric: the LINEAR
    * discrete model stores the post-update state x[k+1] in states[k]
    * (`linear_models.py:133-138`) while the NONLINEAR one stores the
    * pre-update x[k] (`nonlinear_models.py:111-119`). The engine
    * standardizes on pre-update (M4 semantics); `postUpdateState = true`
    * reproduces M2 exactly (SURVEY §7.5.3). Outputs always use the
    * pre-update state in both.
    */
  final case class Discrete(
      f: (Array[Double], Array[Double], Long) => Array[Double],
      g: (Array[Double], Array[Double], Long) => Array[Double],
      override val inputDim: Int,
      postUpdateState: Boolean = false) extends StateSpaceModel {
    override def simulate(simId: Long, u: IndexedSeq[Array[Double]], x0: Array[Double],
                          tFinal: Double, dt: Double): Iterator[SimStep] = {
      var x = x0
      Iterator.tabulate(u.length) { k =>
        val uk = u(k)
        val yk = g(x, uk, k.toLong)
        val xNext = f(x, uk, k.toLong)
        val stored = if (postUpdateState) xNext else x
        x = xNext
        SimStep(simId, k.toLong, k * dt, stored, uk, yk)
      }
    }
  }

  /** M2 — `LinearDiscreteStateSpaceModel` (`linear_models.py:84-147`). */
  def linearDiscrete(
      a: Array[Array[Double]], b: Array[Array[Double]],
      c: Array[Array[Double]], d: Array[Array[Double]],
      postUpdateState: Boolean = false): Discrete =
    Discrete(
      (x, uk, _) => add2(matVec(a, x), matVec(b, uk)),
      (x, uk, _) => add2(matVec(c, x), matVec(d, uk)),
      b(0).length, postUpdateState)

  // ── M5 — DynamicSystemDataGenerator (`data_generators.py:3-90`) ──

  sealed trait InputSignal extends Serializable
  /** Constant input per simulation, drawn uniform on [minVal,maxVal] or
    * normal(μ=(min+max)/2, σ=(max−min)/6) (`data_generators.py:54-66`).
    */
  final case class ConstantSignal(
      minVal: Double = -1.0, maxVal: Double = 1.0,
      distribution: String = "uniform") extends InputSignal
  /** Per-channel random amplitude/offset/phase sine
    * (`data_generators.py:68-81`).
    */
  final case class SineSignal(
      amplitudeRange: (Double, Double) = (0.5, 1.0),
      offsetRange: (Double, Double) = (-1.0, 1.0),
      phaseRange: (Double, Double) = (0.0, HashRandom.twoPi),
      frequency: Double = 1.0) extends InputSignal

  // draw-stream tags so x0 / signal params never collide
  private val X0Stream = 0L
  private val ConstStream = 1L
  private val AmpStream = 2L
  private val OffStream = 3L
  private val PhaseStream = 4L

  /** Per-sim draw replay: the `(x0, input sequence)` a given `simId`
    * receives from [[generate]] — a pure function of `(seed, simId)`
    * with no Spark dependency, exposed so fitted-state oracle thunks can
    * recompute the drawn state DRIVER-side (bit-identical: same JVM
    * `HashRandom`/`Math.sin` calls the executors make), stash it as SQL
    * literals and replay only the integrator fold (the m3/m4
    * `list_reduce` device over the x39/x40 literal-thunk pattern).
    */
  def simDraws(
      inputDim: Int,
      x0Low: Array[Double], x0High: Array[Double],
      signal: InputSignal,
      tFinal: Double, dt: Double,
      seed: Long)(simId: Long): (Array[Double], IndexedSeq[Array[Double]]) = {
    val m = inputDim
    val simSeed = HashRandom.mix(seed ^ simId)
    val x0 = Array.tabulate(x0Low.length)(j =>
      HashRandom.uniform(simSeed, X0Stream, j.toLong, x0Low(j), x0High(j)))
    val nSteps = (tFinal / dt).toInt
    val u: IndexedSeq[Array[Double]] = signal match {
      case ConstantSignal(lo, hi, dist) =>
        val uVal = Array.tabulate(m) { j =>
          if (dist == "uniform") HashRandom.uniform(simSeed, ConstStream, j.toLong, lo, hi)
          else (lo + hi) / 2 + (hi - lo) / 6 * HashRandom.gaussian(simSeed, ConstStream, j.toLong)
        }
        IndexedSeq.fill(nSteps)(uVal)
      case SineSignal(ampR, offR, phR, freq) =>
        val amp = Array.tabulate(m)(j => HashRandom.uniform(simSeed, AmpStream, j.toLong, ampR._1, ampR._2))
        val off = Array.tabulate(m)(j => HashRandom.uniform(simSeed, OffStream, j.toLong, offR._1, offR._2))
        val ph = Array.tabulate(m)(j => HashRandom.uniform(simSeed, PhaseStream, j.toLong, phR._1, phR._2))
        val t = linspace(tFinal, nSteps) _
        IndexedSeq.tabulate(nSteps) { i =>
          Array.tabulate(m)(j => off(j) + amp(j) * math.sin(HashRandom.twoPi * freq * t(i) + ph(j)))
        }
    }
    (x0, u)
  }

  /** Monte-Carlo batch: `numSimulations` trajectories of `model` with
    * x0 ~ U(x0Low, x0High) and the given input signal, distributed over
    * `spark.range` partitions. Deterministic in `seed` (per-sim streams
    * are `mix(seed ^ simId)`-derived; see [[simDraws]]).
    */
  def generate(
      spark: SparkSession,
      model: StateSpaceModel,
      x0Low: Array[Double], x0High: Array[Double],
      numSimulations: Int,
      signal: InputSignal = ConstantSignal(),
      tFinal: Double = 10.0,
      dt: Double = 0.01,
      seed: Long = 42L): Dataset[SimStep] = {
    import spark.implicits._
    val m = model.inputDim
    spark.range(numSimulations.toLong).as[Long].mapPartitions { ids =>
      ids.flatMap { simId =>
        val (x0, u) = simDraws(m, x0Low, x0High, signal, tFinal, dt, seed)(simId)
        model.simulate(simId, u, x0, tFinal, dt)
      }
    }
  }

  /** Single-trajectory convenience (reference `model.simulate` surface). */
  def simulateOne(
      spark: SparkSession,
      model: StateSpaceModel,
      u: IndexedSeq[Array[Double]], x0: Array[Double],
      tFinal: Double, dt: Double): Dataset[SimStep] = {
    import spark.implicits._
    spark.createDataset(model.simulate(0L, u, x0, tFinal, dt).toSeq)
  }
}
