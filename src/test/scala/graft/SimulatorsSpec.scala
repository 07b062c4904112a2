package graft

import org.apache.spark.sql.functions._

import graft.sources.Simulators
import graft.sources.Simulators._

/** M1–M5 simulator parity tests, scenarios mirroring the reference
  * notebooks (`examples/linear_models.ipynb`, `nonlinear_models.ipynb`,
  * `data_generators.ipynb`).
  */
class SimulatorsSpec extends SparkSpec {

  private def mat(rows: Array[Double]*): Array[Array[Double]] = rows.toArray

  test("M1 euler bit-matches a direct replay of the reference loop") {
    // dx = -0.5x + u, y = 2x; the reference updates x BEFORE computing y
    // (linear_models.py:60-68)
    val model = LinearContinuous(
      mat(Array(-0.5)), mat(Array(1.0)), mat(Array(2.0)), mat(Array(0.0)))
    val dt = 0.05; val tFinal = 5.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.7))
    val steps = model.simulate(0L, u, Array(1.0), tFinal, dt).toArray

    // literal replay of the reference euler kernel
    var x = 1.0
    val expState = new Array[Double](n); val expOut = new Array[Double](n)
    for (i <- 0 until n) {
      val dx = -0.5 * x + 1.0 * 0.7
      x = x + dx * dt
      expState(i) = x; expOut(i) = 2.0 * x
    }
    assert(steps.length == n)
    assertSeqAlmost(steps.map(_.state(0)).toSeq, expState.toSeq, 0.0) // bit-exact
    assertSeqAlmost(steps.map(_.output(0)).toSeq, expOut.toSeq, 0.0)
    // linspace time grid (endpoint included)
    assert(math.abs(steps.last.time - tFinal) < 1e-12)
  }

  test("M1 rk4 tracks e^{-t} to 1e-8 where euler only manages 1e-2") {
    val model = LinearContinuous(
      mat(Array(-1.0)), mat(Array(0.0)), mat(Array(1.0)), mat(Array(0.0)))
    val dt = 0.01; val tFinal = 2.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    def lastState(method: String) =
      model.copy(method = method).simulate(0L, u, Array(1.0), tFinal, dt)
        .toSeq.last.state(0)
    val exact = math.exp(-tFinal)
    assert(math.abs(lastState("rk4") - exact) < 1e-8)
    val eulerErr = math.abs(lastState("euler") - exact)
    assert(eulerErr > 1e-4 && eulerErr < 2e-2) // first-order error scale
  }

  test("M1 rk45 adaptive: accurate on a coarse grid where fixed RK4 is not") {
    // dx = -50x on a dt=0.1 grid: fixed RK4's stability limit is
    // h ≈ 2.78/50 = 0.056, so it diverges at h=0.1; adaptive rk45
    // sub-steps inside each grid interval and tracks e^{-50t}
    val a = mat(Array(-50.0))
    val mkModel = (m: String) => LinearContinuous(
      a, mat(Array(0.0)), mat(Array(1.0)), mat(Array(0.0)), method = m)
    val dt = 0.1; val tFinal = 1.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    val rk45 = mkModel("rk45").simulate(0L, u, Array(1.0), tFinal, dt).toArray
    rk45.zipWithIndex.foreach { case (s, i) =>
      assert(math.abs(s.state(0) - math.exp(-50.0 * t(i))) < 1e-4,
        s"rk45 at t=${t(i)}: ${s.state(0)}")
    }
    val rk4 = mkModel("rk4").simulate(0L, u, Array(1.0), tFinal, dt).toArray
    assert(math.abs(rk4.last.state(0)) > 1e3,
      s"fixed rk4 should diverge at this grid, got ${rk4.last.state(0)}")
  }

  test("M3 rk45 matches rk4 on a smooth slow system (both converged)") {
    val f = (x: Array[Double], u: Array[Double], _: Double) =>
      Array(x(1), -math.sin(x(0)))
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.01; val tFinal = 5.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val r4 = NonlinearContinuous(f, g, 1, method = "rk4")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    val r45 = NonlinearContinuous(f, g, 1, method = "rk45")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    r4.zip(r45).foreach { case (s4, s45) =>
      assert(math.abs(s4.state(0) - s45.state(0)) < 1e-5)
      assert(math.abs(s4.state(1) - s45.state(1)) < 1e-5)
    }
  }

  test("M1 dop853 tracks e^{-t} to 1e-9 on the eval grid") {
    // 8th-order pair at rtol 1e-6: a single transcription typo anywhere in
    // the 12-stage tableau degrades the order (or breaks consistency) and
    // blows this tolerance by orders of magnitude
    val model = LinearContinuous(
      mat(Array(-1.0)), mat(Array(0.0)), mat(Array(1.0)), mat(Array(0.0)),
      method = "dop853")
    val dt = 0.1; val tFinal = 2.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    model.simulate(0L, u, Array(1.0), tFinal, dt).toArray.zipWithIndex.foreach {
      case (s, i) =>
        assert(math.abs(s.state(0) - math.exp(-t(i))) < 1e-9,
          s"dop853 at t=${t(i)}: ${s.state(0)} vs ${math.exp(-t(i))}")
    }
  }

  test("M1 dop853 adaptive: accurate on the coarse grid where fixed RK4 diverges") {
    val a = mat(Array(-50.0))
    val model = LinearContinuous(
      a, mat(Array(0.0)), mat(Array(1.0)), mat(Array(0.0)), method = "dop853")
    val dt = 0.1; val tFinal = 1.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    model.simulate(0L, u, Array(1.0), tFinal, dt).toArray.zipWithIndex.foreach {
      case (s, i) =>
        assert(math.abs(s.state(0) - math.exp(-50.0 * t(i))) < 1e-4,
          s"dop853 at t=${t(i)}: ${s.state(0)}")
    }
  }

  test("M3 dop853 matches converged rk4 on the smooth pendulum") {
    val f = (x: Array[Double], u: Array[Double], _: Double) =>
      Array(x(1), -math.sin(x(0)))
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.01; val tFinal = 5.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val r4 = NonlinearContinuous(f, g, 1, method = "rk4")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    val r853 = NonlinearContinuous(f, g, 1, method = "dop853")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    r4.zip(r853).foreach { case (s4, s853) =>
      assert(math.abs(s4.state(0) - s853.state(0)) < 1e-5)
      assert(math.abs(s4.state(1) - s853.state(1)) < 1e-5)
    }
  }

  test("M3 radau (implicit, A-stable) handles a stiff RHS with fewer evals than rk45") {
    // dx = −1000(x − cos t) − sin t, x(0) = 2 → x(t) = cos t + e^{−1000t}:
    // a stiff transient then slow dynamics. Explicit rk45 must hold
    // h ≲ 3.3/1000 FOREVER (stability, not accuracy); radau's step grows
    // with the smooth solution.
    def mk(counter: java.util.concurrent.atomic.AtomicLong) =
      (x: Array[Double], u: Array[Double], t: Double) => {
        counter.incrementAndGet()
        Array(-1000.0 * (x(0) - math.cos(t)) - math.sin(t))
      }
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.1; val tFinal = 1.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    val cRadau = new java.util.concurrent.atomic.AtomicLong()
    val radau = NonlinearContinuous(mk(cRadau), g, 1, method = "radau")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray
    radau.zipWithIndex.drop(1).foreach { case (s, i) =>
      val exact = math.cos(t(i)) + math.exp(-1000.0 * t(i))
      assert(math.abs(s.state(0) - exact) < 1e-4,
        s"radau at t=${t(i)}: ${s.state(0)} vs $exact")
    }
    val cRk45 = new java.util.concurrent.atomic.AtomicLong()
    NonlinearContinuous(mk(cRk45), g, 1, method = "rk45")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray
    assert(cRadau.get < cRk45.get,
      s"radau (${cRadau.get} evals) should beat explicit rk45 (${cRk45.get}) on stiff RHS")
  }

  test("M3 radau matches rk4 on the smooth pendulum (both converged)") {
    val f = (x: Array[Double], u: Array[Double], _: Double) =>
      Array(x(1), -math.sin(x(0)))
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.01; val tFinal = 5.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val r4 = NonlinearContinuous(f, g, 1, method = "rk4")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    val ra = NonlinearContinuous(f, g, 1, method = "radau")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    r4.zip(ra).foreach { case (s4, sr) =>
      assert(math.abs(s4.state(0) - sr.state(0)) < 1e-5)
      assert(math.abs(s4.state(1) - sr.state(1)) < 1e-5)
    }
  }

  test("M1 rk23 adaptive: accurate on the coarse grid where fixed RK4 diverges") {
    // same setup as the rk45 coarse-grid test — the Bogacki–Shampine pair
    // must also sub-step inside each interval and track e^{-50t}
    val a = mat(Array(-50.0))
    val model = LinearContinuous(
      a, mat(Array(0.0)), mat(Array(1.0)), mat(Array(0.0)), method = "rk23")
    val dt = 0.1; val tFinal = 1.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    model.simulate(0L, u, Array(1.0), tFinal, dt).toArray.zipWithIndex.foreach {
      case (s, i) =>
        assert(math.abs(s.state(0) - math.exp(-50.0 * t(i))) < 1e-4,
          s"rk23 at t=${t(i)}: ${s.state(0)}")
    }
  }

  test("M3 rk23 matches rk4 on the smooth pendulum (both converged)") {
    val f = (x: Array[Double], u: Array[Double], _: Double) =>
      Array(x(1), -math.sin(x(0)))
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.01; val tFinal = 5.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val r4 = NonlinearContinuous(f, g, 1, method = "rk4")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    val r23 = NonlinearContinuous(f, g, 1, method = "rk23")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    r4.zip(r23).foreach { case (s4, s23) =>
      assert(math.abs(s4.state(0) - s23.state(0)) < 1e-3)
      assert(math.abs(s4.state(1) - s23.state(1)) < 1e-3)
    }
  }

  test("M3 bdf (implicit multistep, A-stable) tracks the stiff RHS accurately") {
    // same stiff setup as the radau test: dx = −1000(x − cos t) − sin t,
    // x(0) = 2 → x(t) = cos t + e^{−1000t}. BDF2's A-stability must let it
    // track the smooth phase without the explicit stability limit.
    val f = (x: Array[Double], u: Array[Double], t: Double) =>
      Array(-1000.0 * (x(0) - math.cos(t)) - math.sin(t))
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.1; val tFinal = 1.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    NonlinearContinuous(f, g, 1, method = "bdf")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray.zipWithIndex.drop(1)
      .foreach { case (s, i) =>
        val exact = math.cos(t(i)) + math.exp(-1000.0 * t(i))
        assert(math.abs(s.state(0) - exact) < 1e-3,
          s"bdf at t=${t(i)}: ${s.state(0)} vs $exact")
      }
  }

  test("M3 bdf matches rk4 on the smooth pendulum (both converged)") {
    val f = (x: Array[Double], u: Array[Double], _: Double) =>
      Array(x(1), -math.sin(x(0)))
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.01; val tFinal = 5.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val r4 = NonlinearContinuous(f, g, 1, method = "rk4")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    val rb = NonlinearContinuous(f, g, 1, method = "bdf")
      .simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    r4.zip(rb).foreach { case (s4, sb) =>
      assert(math.abs(s4.state(0) - sb.state(0)) < 1e-3)
      assert(math.abs(s4.state(1) - sb.state(1)) < 1e-3)
    }
  }

  test("M3 lsoda: identical to rk45 on nonstiff RHS; switches to implicit on stiff") {
    def mk(counter: java.util.concurrent.atomic.AtomicLong, lambda: Double) =
      (x: Array[Double], u: Array[Double], t: Double) => {
        counter.incrementAndGet()
        Array(-lambda * (x(0) - math.cos(t)) - math.sin(t))
      }
    val g = (x: Array[Double], _: Array[Double], _: Double) => Array(x(0))
    val dt = 0.1; val tFinal = 1.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val t = (i: Int) => i * tFinal / (n - 1)
    // nonstiff (λ=2): the explicit budget never trips → lsoda IS rk45,
    // bit for bit
    val c0 = new java.util.concurrent.atomic.AtomicLong()
    val ls = NonlinearContinuous(mk(c0, 2.0), g, 1, method = "lsoda")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray
    val rk = NonlinearContinuous(mk(new java.util.concurrent.atomic.AtomicLong(), 2.0),
      g, 1, method = "rk45")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray
    ls.zip(rk).foreach { case (a, b) => assert(a.state(0) == b.state(0)) }
    // stiff (λ=1000): the budget trips, lsoda goes implicit — accurate
    // AND far cheaper than explicit held at the stability limit
    val cLsoda = new java.util.concurrent.atomic.AtomicLong()
    NonlinearContinuous(mk(cLsoda, 1000.0), g, 1, method = "lsoda")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray.zipWithIndex.drop(1)
      .foreach { case (s, i) =>
        val exact = math.cos(t(i)) + math.exp(-1000.0 * t(i))
        assert(math.abs(s.state(0) - exact) < 1e-3,
          s"lsoda at t=${t(i)}: ${s.state(0)} vs $exact")
      }
    val cRk45 = new java.util.concurrent.atomic.AtomicLong()
    NonlinearContinuous(mk(cRk45, 1000.0), g, 1, method = "rk45")
      .simulate(0L, u, Array(2.0), tFinal, dt).toArray
    assert(cLsoda.get < cRk45.get,
      s"lsoda (${cLsoda.get} evals) should beat explicit rk45 (${cRk45.get}) on stiff RHS")
  }

  test("M2 discrete double integrator step response + post/pre-update asymmetry") {
    // x[k+1] = [[1,1],[0,1]]x + [0,1]u; y = x1 (examples/linear_models.ipynb)
    val a = mat(Array(1.0, 1.0), Array(0.0, 1.0))
    val b = mat(Array(0.0), Array(1.0))
    val c = mat(Array(1.0, 0.0)); val d = mat(Array(0.0))
    val u = IndexedSeq.fill(5)(Array(1.0))
    // pre-update (engine default, M4 semantics): states[k] = x[k], x[0]=0
    val pre = Simulators.linearDiscrete(a, b, c, d)
      .simulate(0L, u, Array(0.0, 0.0), 0, 1.0).toArray
    // position follows 0,0,1,3,6 (discrete double integration of 1)
    assertSeqAlmost(pre.map(_.state(0)).toSeq, Seq(0d, 0d, 1d, 3d, 6d))
    assertSeqAlmost(pre.map(_.output(0)).toSeq, Seq(0d, 0d, 1d, 3d, 6d))
    // post-update (M2 exact semantics, linear_models.py:133-138):
    // states[k] = x[k+1], outputs still pre-update
    val post = Simulators.linearDiscrete(a, b, c, d, postUpdateState = true)
      .simulate(0L, u, Array(0.0, 0.0), 0, 1.0).toArray
    assertSeqAlmost(post.map(_.state(0)).toSeq, Seq(0d, 1d, 3d, 6d, 10d))
    assertSeqAlmost(post.map(_.output(0)).toSeq, Seq(0d, 0d, 1d, 3d, 6d))
  }

  test("M3 nonlinear pendulum conserves energy under rk4") {
    // dx = [x2, -sin(x1)] (examples/nonlinear_models.ipynb pendulum)
    val model = NonlinearContinuous(
      (x, _, _) => Array(x(1), -math.sin(x(0))),
      (x, _, _) => Array(x(0)),
      inputDim = 1)
    val dt = 0.01; val tFinal = 10.0; val n = (tFinal / dt).toInt
    val u = IndexedSeq.fill(n)(Array(0.0))
    val steps = model.simulate(0L, u, Array(1.0, 0.0), tFinal, dt).toArray
    def energy(x: Array[Double]) = 0.5 * x(1) * x(1) + (1 - math.cos(x(0)))
    val e0 = energy(Array(1.0, 0.0))
    steps.foreach(s => assert(math.abs(energy(s.state) - e0) < 1e-6))
  }

  test("M4 nonlinear discrete logistic map stores pre-update states") {
    val model = Discrete(
      (x, _, _) => Array(3.5 * x(0) * (1 - x(0))),
      (x, _, _) => Array(x(0)),
      inputDim = 1)
    val u = IndexedSeq.fill(4)(Array(0.0))
    val steps = model.simulate(0L, u, Array(0.4), 0, 1.0).toArray
    val exp = Iterator.iterate(0.4)(v => 3.5 * v * (1 - v)).take(4).toSeq
    assertSeqAlmost(steps.map(_.state(0)).toSeq, exp)
    assertSeqAlmost(steps.map(_.output(0)).toSeq, exp)
  }

  test("M5 generator: distributed, deterministic, respects bounds") {
    val model = LinearContinuous(
      mat(Array(-1.0, 0.5), Array(0.0, -2.0)),
      mat(Array(1.0), Array(0.5)),
      mat(Array(1.0, 0.0)), mat(Array(0.0)))
    def run() = Simulators.generate(
      spark, model,
      x0Low = Array(-1.0, -1.0), x0High = Array(1.0, 1.0),
      numSimulations = 20,
      signal = SineSignal(frequency = 0.5),
      tFinal = 2.0, dt = 0.02, seed = 7L)
    val ds = run()
    assert(ds.count() == 20L * 100)
    assert(ds.select(countDistinct(col("sim_id"))).head().getLong(0) == 20)
    // deterministic replay
    val h1 = ds.select(sum(abs(element_at(col("state"), 1)))).head().getDouble(0)
    val h2 = run().select(sum(abs(element_at(col("state"), 1)))).head().getDouble(0)
    assert(h1 == h2)
    // sine inputs bounded by offset ± amplitude
    val maxU = ds.select(max(abs(element_at(col("input"), 1)))).head().getDouble(0)
    assert(maxU <= 2.0 + 1e-12)
  }

  test("M5 constant-normal inputs center on (min+max)/2") {
    val model = LinearContinuous(
      mat(Array(-1.0)), mat(Array(1.0)), mat(Array(1.0)), mat(Array(0.0)))
    val ds = Simulators.generate(
      spark, model, Array(0.0), Array(0.0), numSimulations = 200,
      signal = ConstantSignal(2.0, 4.0, "normal"), tFinal = 0.1, dt = 0.05, seed = 11L)
    val mean = ds.filter(col("step") === 0)
      .select(avg(element_at(col("input"), 1))).head().getDouble(0)
    assert(math.abs(mean - 3.0) < 0.1, s"mean input $mean")
    // σ = (max-min)/6 → essentially everything within (min,max)
    val mx = ds.select(max(element_at(col("input"), 1))).head().getDouble(0)
    assert(mx < 4.5)
  }
}
