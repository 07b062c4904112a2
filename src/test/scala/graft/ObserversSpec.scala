package graft

import org.apache.spark.sql.functions._

import breeze.math.Complex

import graft.functions.{HashRandom, Mat}
import graft.observers.Observers
import graft.observers.Observers._
import graft.sources.Simulators
import graft.sources.Simulators.LinearContinuous

/** O1–O3 observer tests: gain design (Ackermann vs desired spectrum),
  * kernel parity, and the reference notebook's tracking-loop scenarios
  * (`examples/state_observers.ipynb`: observers against a simulated
  * plant).
  */
class ObserversSpec extends SparkSpec {

  private def mat(rows: Array[Double]*): Array[Array[Double]] = rows.toArray

  test("Ackermann gain places the observer poles exactly") {
    val a = mat(Array(0.0, 1.0), Array(-2.0, -3.0))
    val c = Array(1.0, 0.0)
    val l = Gains.ackermannObserver(a, c, Seq(Complex(-5, 0), Complex(-6, 0)))
    val lc = Mat.matMul(l.map(Array(_)), Array(c))
    val aLc = Array.tabulate(2, 2)((i, j) => a(i)(j) - lc(i)(j))
    val eigs = Gains.eigenvalues(aLc).map(_.real).sorted
    assertSeqAlmost(eigs, Seq(-6.0, -5.0), 1e-9)
  }

  test("Ackermann handles complex default poles (eig(A)−1)") {
    // oscillator: eig = ±2i → default poles −1 ± 2i
    val a = mat(Array(0.0, 1.0), Array(-4.0, 0.0))
    val c = Array(1.0, 0.0)
    val l = Gains.ackermannObserver(a, c, Gains.defaultPoles(a))
    val lc = Mat.matMul(l.map(Array(_)), Array(c))
    val aLc = Array.tabulate(2, 2)((i, j) => a(i)(j) - lc(i)(j))
    val got = Gains.eigenvalues(aLc).map(e => (e.real, math.abs(e.imag)))
      .sortBy(_._2)
    got.foreach { case (re, im) => assert(math.abs(re - -1.0) < 1e-9) }
    assert(math.abs(got.last._2 - 2.0) < 1e-9)
  }

  test("sylvester gain: exact placement, full rank, real poles") {
    val a = mat(
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0),
      Array(-6.0, -11.0, -6.0))
    val c = mat(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val poles = Seq(Complex(-4, 0), Complex(-5, 0), Complex(-7, 0))
    val l = Gains.sylvesterObserver(a, c, poles).get
    val lc = Mat.matMul(l, c)
    val aLc = Array.tabulate(3, 3)((i, j) => a(i)(j) - lc(i)(j))
    assertSeqAlmost(Gains.eigenvalues(aLc).map(_.real).sorted,
      Seq(-7.0, -5.0, -4.0), 1e-7)
    // full column rank — the property the unity-rank dyadic gain lacks
    val g = Mat.matMul(Mat.transpose(l), l)
    assert(g(0)(0) * g(1)(1) - g(0)(1) * g(1)(0) > 1e-9, "rank-1 gain")
  }

  test("sylvester gain: conjugate-pair placement through the real 2x2 block") {
    val a = mat(Array(0.0, 1.0), Array(-2.0, -0.5))
    val c = mat(Array(1.0, 0.0), Array(0.0, 1.0))
    val l = Gains.sylvesterObserver(a, c,
      Seq(Complex(-3, 2), Complex(-3, -2))).get
    val lc = Mat.matMul(l, c)
    val aLc = Array.tabulate(2, 2)((i, j) => a(i)(j) - lc(i)(j))
    val eigs = Gains.eigenvalues(aLc).sortBy(_.imag)
    assert(math.abs(eigs(0).real - -3.0) < 1e-8 &&
      math.abs(eigs(0).imag - -2.0) < 1e-8, eigs.toString)
    assert(math.abs(eigs(1).real - -3.0) < 1e-8 &&
      math.abs(eigs(1).imag - 2.0) < 1e-8, eigs.toString)
  }

  test("sylvester gain: repeated pole with multiplicity <= p places exactly") {
    val a = mat(Array(0.0, 1.0), Array(-2.0, -0.5))
    val c = mat(Array(1.0, 0.0), Array(0.0, 1.0))
    val l = Gains.sylvesterObserver(a, c,
      Seq(Complex(-4, 0), Complex(-4, 0))).get
    val lc = Mat.matMul(l, c)
    val aLc = Array.tabulate(2, 2)((i, j) => a(i)(j) - lc(i)(j))
    assertSeqAlmost(Gains.eigenvalues(aLc).map(_.real).sorted,
      Seq(-4.0, -4.0), 1e-6)
  }

  test("placeObserver falls back to dyadic on the Sylvester solvability boundary") {
    // desired pole −1 IS an eigenvalue of A: (A − λI) is singular, the
    // Sylvester solve cannot place it, the dyadic path still can
    val a = mat(
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0),
      Array(-6.0, -11.0, -6.0)) // eig = −1, −2, −3
    val c = mat(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val poles = Seq(Complex(-1, 0), Complex(-5, 0), Complex(-7, 0))
    assert(Gains.sylvesterObserver(a, c, poles).isEmpty,
      "sylvester must refuse a desired pole inside eig(A)")
    val l = Gains.placeObserver(a, c, poles)
    val lc = Mat.matMul(l, c)
    val aLc = Array.tabulate(3, 3)((i, j) => a(i)(j) - lc(i)(j))
    assertSeqAlmost(Gains.eigenvalues(aLc).map(_.real).sorted,
      Seq(-7.0, -5.0, -1.0), 1e-7)
  }

  test("dyadic gain places the poles exactly for a 2-output 3-state plant") {
    val a = mat(
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0),
      Array(-6.0, -11.0, -6.0))
    val c = mat(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val poles = Seq(Complex(-4, 0), Complex(-5, 0), Complex(-7, 0))
    val l = Gains.dyadicObserver(a, c, poles)
    assert(l.length == 3 && l(0).length == 2)
    val lc = Mat.matMul(l, c)
    val aLc = Array.tabulate(3, 3)((i, j) => a(i)(j) - lc(i)(j))
    val eigs = Gains.eigenvalues(aLc).map(_.real).sorted
    assertSeqAlmost(eigs, Seq(-7.0, -5.0, -4.0), 1e-8)
  }

  test("Luenberger designed gain tracks a 2-output plant (reference shape)") {
    // both states measured (p = 2) — the place_poles path in the
    // reference (`luenberger.py:73-75`); engine designs L dyadically
    val a = mat(Array(0.0, 1.0), Array(-2.0, -0.5))
    val b = mat(Array(0.0), Array(1.0))
    val c = mat(Array(1.0, 0.0), Array(0.0, 1.0))
    val dt = 0.01
    val plant = LinearContinuous(a, b, c, mat(Array(0.0), Array(0.0)))
    val n = 500
    val u = IndexedSeq.tabulate(n)(i => Array(math.sin(0.02 * i)))
    val steps = plant.simulate(0L, u, Array(1.0, 0.0), n * dt, dt).toArray
    val obs = LuenbergerObserver(a, b, c, dt, desiredPoles = Some(Seq(-8.0, -9.0)))
    // designed spectrum really is (-8, -9)
    val lc = Mat.matMul(obs.gain, c)
    val aLc = Array.tabulate(2, 2)((i, j) => a(i)(j) - lc(i)(j))
    assertSeqAlmost(Gains.eigenvalues(aLc).map(_.real).sorted, Seq(-9.0, -8.0), 1e-8)
    var xh = Array(0.0, 0.0)
    steps.foreach { s => xh = obs.update(xh, s.input, s.output) }
    val xTrue = steps.last.state
    assert(math.abs(xh(0) - xTrue(0)) < 0.02, s"${xh.toSeq} vs ${xTrue.toSeq}")
    assert(math.abs(xh(1) - xTrue(1)) < 0.05, s"${xh.toSeq} vs ${xTrue.toSeq}")
  }

  test("1-state MatrixKalman matches the hand scalar predict/update loop") {
    val kf = MatrixKalman(
      mat(Array(1.0)), mat(Array(0.0)), mat(Array(1.0)),
      mat(Array(0.5)), mat(Array(2.0)))
    val zs = Seq(1.0, 2.0, 1.5, 3.0, 2.5)
    var x = 0.0; var p = 1.0
    val exp = zs.map { z =>
      val pPred = p + 0.5
      val s = pPred + 2.0
      val k = pPred * (1.0 / s)
      x = x + k * (z - x)
      p = (1.0 - k) * pPred
      x
    }
    var st = (Array(0.0), mat(Array(1.0)))
    val got = zs.map { z => st = kf.step(st._1, st._2, Array(z)); st._1(0) }
    assertSeqAlmost(got, exp, 0.0) // bit-exact (fixed-order Mat arithmetic)
  }

  test("2-state Kalman tracks a constant-velocity target through noise") {
    val dt = 0.1
    val kf = MatrixKalman(
      f = mat(Array(1.0, dt), Array(0.0, 1.0)),
      b = mat(Array(0.0), Array(0.0)),
      h = mat(Array(1.0, 0.0)),
      q = mat(Array(1e-4, 0.0), Array(0.0, 1e-4)),
      r = mat(Array(0.25)))
    var st = (Array(0.0, 0.0), mat(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vTrue = 1.7
    var err = 0.0
    for (i <- 0 until 200) {
      val truth = vTrue * i * dt
      val z = truth + 0.5 * HashRandom.gaussian(3L, 0L, i.toLong)
      st = kf.step(st._1, st._2, Array(z))
      err = math.abs(st._1(1) - vTrue)
    }
    assert(err < 0.15, s"final velocity error $err")
    // covariance must have contracted far below the prior
    assert(st._2(0)(0) < 0.1)
  }

  test("Luenberger observer converges on a simulated plant (notebook loop)") {
    val a = mat(Array(0.0, 1.0), Array(-2.0, -0.5))
    val b = mat(Array(0.0), Array(1.0))
    val c = mat(Array(1.0, 0.0))
    val dt = 0.01
    val plant = LinearContinuous(a, b, c, mat(Array(0.0)))
    val n = 500
    val u = IndexedSeq.tabulate(n)(i => Array(math.sin(0.02 * i)))
    val steps = plant.simulate(0L, u, Array(1.0, 0.0), n * dt, dt).toArray
    val obs = LuenbergerObserver(a, b, c, dt, desiredPoles = Some(Seq(-8.0, -9.0)))
    var xh = Array(0.0, 0.0)
    steps.foreach { s => xh = obs.update(xh, s.input, Array(s.output(0))) }
    val xTrue = steps.last.state
    assert(math.abs(xh(0) - xTrue(0)) < 0.02, s"${xh.toSeq} vs ${xTrue.toSeq}")
    assert(math.abs(xh(1) - xTrue(1)) < 0.05, s"${xh.toSeq} vs ${xTrue.toSeq}")
  }

  test("sliding-mode observer converges on a scalar plant") {
    val a = mat(Array(-1.0)); val b = mat(Array(1.0)); val c = mat(Array(1.0))
    val dt = 0.01
    val plant = LinearContinuous(a, b, c, mat(Array(0.0)))
    val n = 800
    val u = IndexedSeq.fill(n)(Array(0.5))
    val steps = plant.simulate(0L, u, Array(2.0), n * dt, dt).toArray
    val obs = SlidingModeObserver(a, b, c, desiredPoles = Some(Seq(-3.0)))
    assert(obs.gain(0)(0) == 2.0) // (a − μ)/c = (−1 + 3)/1
    var xh = Array(0.0)
    steps.foreach { s => xh = obs.step(xh, Array(s.output(0)), dt, s.input) }
    assert(math.abs(xh(0) - steps.last.state(0)) < 0.05,
      s"${xh(0)} vs ${steps.last.state(0)}")
  }

  test("DataFrame kalman operator matches the class loop per series") {
    import spark.implicits._
    val kf = MatrixKalman(
      mat(Array(1.0)), mat(Array(0.0)), mat(Array(1.0)),
      mat(Array(0.5)), mat(Array(2.0)))
    val rows = for (s <- Seq("a", "b"); i <- 0 until 20)
      yield (s, i.toLong, HashRandom.uniform(9L, s.hashCode.toLong, i.toLong, 0, 10))
    val df = rows.toDF("series_id", "t", "value")
    val got = Observers.kalman(df, Seq("series_id"), Seq("t"), Seq("value"), Nil,
      kf, Array(0.0), mat(Array(1.0)))
      .select(col("series_id"), col("t"), element_at(col("x_hat"), 1).as("xh"))
      .orderBy("series_id", "t").collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val expected = Seq("a", "b").flatMap { s =>
      var st = (Array(0.0), mat(Array(1.0)))
      rows.filter(_._1 == s).sortBy(_._2).map { case (_, _, v) =>
        st = kf.step(st._1, st._2, Array(v)); (s, st._1(0))
      }
    }
    assert(got.toSeq == expected)
  }
}
