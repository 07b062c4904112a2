package graft.observers

import breeze.linalg.{eig, svd, DenseMatrix}
import breeze.math.Complex

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField}

import graft.functions.Mat
import graft.operators.Recurrence

/** State observers (reference O1–O3, `state_observers/kalman.py:3-91`,
  * `luenberger.py:4-102`, `sliding_mode.py:4-100`): row-at-a-time matrix
  * recurrences over a measurement stream.
  *
  * Spark mapping (SURVEY §2.5): the per-step `predict/update` loops ride
  * the keyed secondary-sort [[Recurrence.rowScan]] kernel with `(x, P)`
  * (or `x̂`) as the per-series state — O(state) memory per series, series
  * sharded across executors, no driver collect. Gain design (pole
  * placement, spectral norms) happens ONCE at construction on the driver:
  * breeze eig/svd there, never in the per-row kernel (whose arithmetic is
  * fixed-order [[Mat]] so scalar instances are DuckDB-replayable).
  *
  * Gain design parity (SURVEY §7.4): user-supplied `L` is used verbatim
  * (as the reference allows, `luenberger.py:39-41`); designed gains use
  * Ackermann's formula for single-output systems — exact pole placement,
  * and for p=1 the observer gain is unique, so it matches scipy
  * `place_poles` to rounding. Multi-output systems (p > 1) use the
  * Sylvester-equation full-rank design ([[Gains.sylvesterObserver]]) —
  * exact spectrum, conditioning-optimized over deterministic parameter
  * candidates (the `place_poles` KNV/YT objective), with the dyadic
  * unity-rank reduction ([[Gains.dyadicObserver]]) as the fallback on
  * the Sylvester solvability boundary (desired pole ∈ eig(A),
  * multiplicity > p).
  */
object Observers {

  // ── gain design (driver-side, breeze) ──
  object Gains {

    def eigenvalues(a: Array[Array[Double]]): Seq[Complex] = {
      val e = eig(DenseMatrix(a: _*))
      (0 until e.eigenvalues.length).map(i =>
        Complex(e.eigenvalues(i), e.eigenvaluesComplex(i)))
    }

    /** Reference default observer poles: `eig(A) − 1`
      * (`luenberger.py:43-46`, `sliding_mode.py:34-39`).
      */
    def defaultPoles(a: Array[Array[Double]]): Seq[Complex] =
      eigenvalues(a).map(_ - Complex(1, 0))

    /** Ackermann observer gain for single-output systems:
      * `L = φ(A) · O⁻¹ · e_n` with O the observability matrix. Returns the
      * n×1 gain column.
      */
    def ackermannObserver(
        a: Array[Array[Double]], c: Array[Double],
        poles: Seq[Complex]): Array[Double] = {
      val n = a.length
      require(poles.length == n, s"need $n poles, got ${poles.length}")
      // observability matrix rows: c, cA, ..., cA^{n-1}
      val rows = new Array[Array[Double]](n)
      var row = c
      for (i <- 0 until n) { rows(i) = row; row = Mat.matVec(Mat.transpose(a), row) }
      val oInv = Mat.inv(rows)
      val en = Array.tabulate(n)(i => if (i == n - 1) 1.0 else 0.0)
      val oCol = Mat.matVec(oInv, en)
      // φ(A) = A^n + c_{n-1}A^{n-1} + … + c0·I  (Horner over A)
      val cs = polyCoeffsAscending(poles)
      var phi = Mat.identity(n) // starts as leading coefficient 1
      for (k <- (0 until n).reverse) {
        phi = Mat.matMul(phi, a)
        for (i <- 0 until n) phi(i)(i) += cs(k)
      }
      Mat.matVec(phi, oCol)
    }

    /** c0..c_{n-1} (ascending powers) of the monic Π(s − pᵢ). */
    def polyCoeffsAscending(poles: Seq[Complex]): Array[Double] = {
      var coeffs = Array(Complex(1, 0)) // descending powers, leading first
      poles.foreach { p =>
        val next = Array.fill(coeffs.length + 1)(Complex(0, 0))
        for (i <- coeffs.indices) {
          next(i) = next(i) + coeffs(i)
          next(i + 1) = next(i + 1) - p * coeffs(i)
        }
        coeffs = next
      }
      coeffs.drop(1).reverse.map(_.real) // ascending: c0, c1, …, c_{n-1}
    }

    /** Multi-output observer pole placement by dyadic reduction (Chen,
      * "Linear System Theory and Design" §8; the classical unity-rank
      * design): for a combination vector `f` of the outputs, the
      * single-output pair `(A, c̃ = fᵀC)` is observable for almost every
      * `f` when `(A, C)` is observable and A is cyclic. Design the
      * single-output Ackermann gain `l` for `c̃` and return `L = l·fᵀ`;
      * then `A − LC = A − l·c̃`, so the placement is exact. `f` is chosen
      * deterministically as the candidate whose resulting GAIN is
      * smallest (Frobenius norm) among the observable ones — the
      * outcome-level conditioning proxy; every observable candidate
      * places the exact spectrum, so the choice only affects numerical
      * robustness. Candidates: the unit vectors, the all-ones vector,
      * and a few fixed harmonic mixes — seed-free and reproducible.
      *
      * Conditioning guard (this is the documented deviation from scipy's
      * robustness-optimized `place_poles`, SURVEY §7.4): unity-rank
      * placement of clustered poles can be ill-conditioned, and a gain
      * orders of magnitude above the problem scale amplifies measurement
      * noise into a useless observer. When even the best candidate's
      * ‖L‖ explodes relative to `‖A‖ + max|pole|`, a loud warning says
      * so and suggests spreading the poles — the placement is still
      * exact-spectrum, so it is returned, not refused.
      */
    def dyadicObserver(
        a: Array[Array[Double]], cm: Array[Array[Double]],
        poles: Seq[Complex]): Array[Array[Double]] = {
      val n = a.length
      val p = cm.length
      if (p == 1) return ackermannObserver(a, cm(0), poles).map(Array(_))
      def ctilde(f: Array[Double]): Array[Double] =
        Array.tabulate(n)(j => {
          var s = 0.0; var i = 0
          while (i < p) { s += f(i) * cm(i)(j); i += 1 }
          s
        })
      def obsMatrix(ct: Array[Double]): Array[Array[Double]] = {
        val rows = new Array[Array[Double]](n)
        var row = ct
        for (i <- 0 until n) { rows(i) = row; row = Mat.matVec(Mat.transpose(a), row) }
        rows
      }
      def sigmaMin(m: Array[Array[Double]]): Double =
        breeze.linalg.min(svd(DenseMatrix(m: _*)).S)
      val candidates: Seq[Array[Double]] =
        (0 until p).map(i => Array.tabulate(p)(j => if (j == i) 1.0 else 0.0)) ++
          Seq(Array.fill(p)(1.0)) ++
          (1 to 3).map(s => Array.tabulate(p)(j => 1.0 / (1 + (j + s) % p)))
      val observable = candidates.filter(f0 => sigmaMin(obsMatrix(ctilde(f0))) > 1e-12)
      require(observable.nonEmpty,
        "no output combination yields an observable single-output pair " +
          "(is (A, C) observable?)")
      def frob(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
      // gain per observable candidate; keep the smallest-norm one
      // (stable tie-break: candidate order)
      val (f, l, gainNorm) = observable.map { f0 =>
        val g = ackermannObserver(a, ctilde(f0), poles)
        (f0, g, frob(g) * frob(f0))
      }.minBy(_._3)
      val scale = math.sqrt(a.map(r => r.map(x => x * x).sum).sum) +
        poles.map(_.abs).max + 1.0
      if (gainNorm > 1e6 * scale)
        System.err.println(
          f"[graft] WARN dyadicObserver: best gain norm $gainNorm%.3e is " +
            f">1e6x the problem scale $scale%.3e — unity-rank placement of " +
            "clustered poles is ill-conditioned here; the spectrum is still " +
            "exact, but the observer will amplify measurement noise. " +
            "Consider spreading the desired poles or supplying L directly.")
      Array.tabulate(n, p)((i, j) => l(i) * f(j))
    }

    /** Multi-output observer pole placement via the SYLVESTER-EQUATION
      * method (Bhattacharyya & de Souza 1982, "Pole assignment via
      * Sylvester's equation"; the full-rank classical alternative to the
      * unity-rank dyadic design): on the controller dual `(Aᵀ, Cᵀ)`,
      * pick a parameter matrix `G` (p×n), solve `Aᵀ X − X Λ = −Cᵀ G`
      * column-block-wise — Λ is the REAL block form of the desired
      * spectrum (1×1 blocks for real poles, 2×2 `[[α,β],[−β,α]]` blocks
      * for conjugate pairs, so every solve stays in real arithmetic) —
      * and return `L = (G X⁻¹)ᵀ`: then `(A − LC) X̃ = X̃ Λ̃` by
      * construction, the spectrum is exact. The gain is full-rank in
      * the outputs (every sensor participates), which is what the
      * dyadic reduction gives up.
      *
      * `G` candidates are deterministic (cycled unit columns + harmonic
      * mixes); the returned gain is the candidate whose solution X is
      * best conditioned (max σ_min/σ_max) — eigenvector-basis
      * conditioning is exactly the robustness objective scipy's
      * `place_poles` (KNV/YT) optimizes, here reduced to a seed-free
      * candidate search. Every candidate is validated by re-computing
      * `eig(A − LC)` against the request.
      *
      * Returns None when no candidate yields an invertible,
      * placement-validated X — a desired pole coinciding with an
      * eigenvalue of A (the Sylvester solvability boundary), or pole
      * multiplicity exceeding p; callers fall back to
      * [[dyadicObserver]], which handles those via the characteristic
      * polynomial.
      */
    def sylvesterObserver(
        a: Array[Array[Double]], cm: Array[Array[Double]],
        poles: Seq[Complex]): Option[Array[Array[Double]]] = {
      val n = a.length
      val p = cm.length
      require(poles.length == n, s"need $n poles, got ${poles.length}")
      val at = Mat.transpose(a)   // controller dual: state matrix Aᵀ
      val bt = Mat.transpose(cm)  // controller dual: input matrix Cᵀ (n×p)
      val tol = 1e-9
      // real block structure: reals as-is, complex as matched (α, β>0) pairs
      val reals = poles.filter(c => math.abs(c.imag) <= tol).map(_.real)
      val pos = poles.filter(_.imag > tol).sortBy(c => (c.real, c.imag))
      val neg = poles.filter(_.imag < -tol).sortBy(c => (c.real, -c.imag))
      if (pos.length != neg.length ||
        pos.zip(neg).exists { case (u, v) =>
          math.abs(u.real - v.real) > 1e-9 || math.abs(u.imag + v.imag) > 1e-9 })
        return None // spectrum not closed under conjugation
      def unit(i: Int) = Array.tabulate(p)(j => if (j == i % p) 1.0 else 0.0)
      // per-column parameter vectors, cycled so repeated poles get
      // DIFFERENT columns (the multiplicity-≤p device)
      val nCols = reals.length + 2 * pos.length
      val candidates: Seq[Seq[Array[Double]]] =
        (0 until p).map(s => Seq.tabulate(nCols)(j => unit(j + s))) ++
          Seq(Seq.tabulate(nCols)(j =>
            Array.tabulate(p)(i => 1.0 / (1 + (i + j) % p))))
      // Sylvester RHS: Ac X − X Λ = Bc G ⇒ (Ac − Bc·GX⁻¹) X = X Λ
      def bg(g: Array[Double]): Array[Double] = Mat.matVec(bt, g)
      def solveReal(lam: Double, g: Array[Double]): Option[Array[Double]] = {
        val m = Array.tabulate(n, n)((i, j) =>
          at(i)(j) - (if (i == j) lam else 0.0))
        try Some(Mat.matVec(Mat.inv(m), bg(g)))
        catch { case _: IllegalArgumentException => None }
      }
      def solvePair(al: Double, be: Double, g1: Array[Double], g2: Array[Double])
          : Option[(Array[Double], Array[Double])] = {
        // [[Aᵀ−αI, βI], [−βI, Aᵀ−αI]] [x1; x2] = [Bg1; Bg2]
        val m = Array.tabulate(2 * n, 2 * n) { (i, j) =>
          val (bi, bj) = (i / n, j / n)
          val (ri, rj) = (i % n, j % n)
          if (bi == bj) at(ri)(rj) - (if (ri == rj) al else 0.0)
          else if (ri == rj) (if (bi == 0) be else -be)
          else 0.0
        }
        val rhs = bg(g1) ++ bg(g2)
        try {
          val x = Mat.matVec(Mat.inv(m), rhs)
          Some((x.take(n), x.drop(n)))
        } catch { case _: IllegalArgumentException => None }
      }
      def condRatio(x: Array[Array[Double]]): Double = {
        val s = svd(DenseMatrix(x: _*)).S
        val mx = breeze.linalg.max(s)
        if (mx <= 0) 0.0 else breeze.linalg.min(s) / mx
      }
      val scale = poles.map(_.abs).max + 1.0
      val best = candidates.flatMap { gs =>
        // assemble X column by column (columns live in G-column order)
        val cols = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val gcols = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        var gi = 0
        var ok = true
        reals.foreach { lam =>
          if (ok) solveReal(lam, gs(gi)) match {
            case Some(x) => cols += x; gcols += gs(gi); gi += 1
            case None => ok = false
          }
        }
        pos.foreach { c =>
          if (ok) solvePair(c.real, c.imag, gs(gi), gs(gi + 1)) match {
            case Some((x1, x2)) =>
              cols += x1; cols += x2; gcols += gs(gi); gcols += gs(gi + 1)
              gi += 2
            case None => ok = false
          }
        }
        if (!ok) None
        else {
          // X: n×n with our solution vectors as COLUMNS; K = G X⁻¹
          val x = Array.tabulate(n, n)((i, j) => cols(j)(i))
          val g = Array.tabulate(p, n)((i, j) => gcols(j)(i))
          try {
            val k = Mat.matMul(g, Mat.inv(x)) // p×n
            val l = Mat.transpose(k)          // n×p
            // validate: the realized spectrum must BE the request
            val lc = Mat.matMul(l, cm)
            val alc = Array.tabulate(n, n)((i, j) => a(i)(j) - lc(i)(j))
            val got = eigenvalues(alc).sortBy(c => (c.real, c.imag))
            val want = poles.sortBy(c => (c.real, c.imag))
            val err = got.zip(want)
              .map { case (u, v) => (u - v).abs }.max
            if (err <= 1e-6 * scale) Some((condRatio(x), l)) else None
          } catch { case _: IllegalArgumentException => None }
        }
      }
      if (best.isEmpty) None else Some(best.maxBy(_._1)._2)
    }

    /** Observer pole placement, full surface: exact unique Ackermann for
      * single-output; for multi-output the Sylvester full-rank design
      * ([[sylvesterObserver]] — scipy `place_poles`' objective), falling
      * back to the unity-rank dyadic reduction on the Sylvester
      * solvability boundary (desired pole ∈ eig(A), multiplicity > p).
      */
    def placeObserver(
        a: Array[Array[Double]], cm: Array[Array[Double]],
        poles: Seq[Complex]): Array[Array[Double]] =
      if (cm.length == 1) ackermannObserver(a, cm(0), poles).map(Array(_))
      else sylvesterObserver(a, cm, poles)
        .getOrElse(dyadicObserver(a, cm, poles))

    def spectralNorm(m: Array[Array[Double]]): Double =
      breeze.linalg.max(svd(DenseMatrix(m: _*)).S)

    def maxRealEig(m: Array[Array[Double]]): Double =
      eigenvalues(m).map(_.real).max
  }

  // ── O1: matrix Kalman filter (`kalman.py:3-91`) ──

  /** predict: x←Fx(+Bu), P←FPFᵀ+Q; update: y=z−Hx, S=HPHᵀ+R,
    * K=PHᵀS⁻¹, x←x+Ky, P←(I−KH)P. `step` = predict∘update.
    */
  final case class MatrixKalman(
      f: Array[Array[Double]], b: Array[Array[Double]],
      h: Array[Array[Double]], q: Array[Array[Double]],
      r: Array[Array[Double]]) extends Serializable {

    def predict(x: Array[Double], p: Array[Array[Double]],
                u: Option[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
      val x1 = u match {
        case Some(uv) => Mat.addV(Mat.matVec(f, x), Mat.matVec(b, uv))
        case None     => Mat.matVec(f, x)
      }
      val p1 = Mat.addM(Mat.matMul(Mat.matMul(f, p), Mat.transpose(f)), q)
      (x1, p1)
    }

    def update(x: Array[Double], p: Array[Array[Double]],
               z: Array[Double]): (Array[Double], Array[Array[Double]]) = {
      val y = Mat.subV(z, Mat.matVec(h, x))
      val s = Mat.addM(Mat.matMul(Mat.matMul(h, p), Mat.transpose(h)), r)
      val k = Mat.matMul(Mat.matMul(p, Mat.transpose(h)), Mat.inv(s))
      val x1 = Mat.addV(x, Mat.matVec(k, y))
      val n = p.length
      val kh = Mat.matMul(k, h)
      val ikh = Array.tabulate(n, n)((i, j) =>
        (if (i == j) 1.0 else 0.0) - kh(i)(j))
      (x1, Mat.matMul(ikh, p))
    }

    def step(x: Array[Double], p: Array[Array[Double]], z: Array[Double],
             u: Option[Array[Double]] = None): (Array[Double], Array[Array[Double]]) = {
      val (xp, pp) = predict(x, p, u)
      update(xp, pp, z)
    }
  }

  // ── O2: Luenberger observer (`luenberger.py:4-102`) ──

  /** x̂ ← x̂ + (Ax̂ + Bu − L(Cx̂ − y))·dt. Gain precedence: user `L`,
    * else placement at `desiredPoles`, else default poles eig(A)−1 —
    * Ackermann for p=1, Sylvester full-rank (dyadic fallback) for p>1
    * ([[Gains.placeObserver]]).
    */
  final case class LuenbergerObserver(
      a: Array[Array[Double]], b: Array[Array[Double]], c: Array[Array[Double]],
      dt: Double,
      l: Option[Array[Array[Double]]] = None,
      desiredPoles: Option[Seq[Double]] = None) extends Serializable {

    val gain: Array[Array[Double]] = l.getOrElse {
      val poles = desiredPoles.map(_.map(Complex(_, 0)))
        .getOrElse(Gains.defaultPoles(a))
      Gains.placeObserver(a, c, poles)
    }

    def update(xHat: Array[Double], u: Array[Double], y: Array[Double]): Array[Double] = {
      val drive = Mat.addV(Mat.matVec(a, xHat), Mat.matVec(b, u))
      val innov = Mat.matVec(gain, Mat.subV(Mat.matVec(c, xHat), y))
      Array.tabulate(xHat.length)(i => xHat(i) + (drive(i) - innov(i)) * dt)
    }
  }

  // ── O3: sliding-mode observer (`sliding_mode.py:4-100`) ──

  /** x̂ ← x̂ + (Ax̂ + Bu + LS + K·tanh(S/ε))·dt with S = y − Cx̂.
    * Gains at init exactly per the reference heuristic (`:42-62`):
    * L by pole placement; α = −max Re eig(A−LC); e_max =
    * max(1, 1.5/α)·1.5; K = (‖C‖₂·‖A−LC‖₂·e_max + η)·𝟙.
    */
  final case class SlidingModeObserver(
      a: Array[Array[Double]], b: Array[Array[Double]], c: Array[Array[Double]],
      desiredPoles: Option[Seq[Double]] = None,
      eta: Double = 1.0,
      eps: Double = 0.1) extends Serializable {

    require(c.length == 1, "sliding-mode observer supports single-output systems")

    val gain: Array[Array[Double]] = {
      val poles = desiredPoles.map(_.map(Complex(_, 0)))
        .getOrElse(Gains.defaultPoles(a))
      Gains.ackermannObserver(a, c(0), poles).map(Array(_))
    }

    val kGain: Array[Double] = {
      val lc = Mat.matMul(gain, c)
      val aMinusLc = Array.tabulate(a.length, a.length)((i, j) => a(i)(j) - lc(i)(j))
      val alpha = -Gains.maxRealEig(aMinusLc)
      val eMax = math.max(1.0, (1.5 / alpha) * 1.0) * 1.5
      val k = Gains.spectralNorm(c) * Gains.spectralNorm(aMinusLc) * eMax + eta
      Array.fill(a.length)(k)
    }

    def step(xHat: Array[Double], y: Array[Double], dt: Double,
             u: Array[Double]): Array[Double] = {
      val s = Mat.subV(y, Mat.matVec(c, xHat))
      val drive = Mat.addV(Mat.matVec(a, xHat), Mat.matVec(b, u))
      val ls = Mat.matVec(gain, s)
      val sw = Mat.matVec(kGain.map(Array(_)), s.map(v => math.tanh(v / eps)))
      Array.tabulate(xHat.length)(i => xHat(i) + ((drive(i) + ls(i)) + sw(i)) * dt)
    }
  }

  // ── DataFrame operators (keyed recurrence over measurement streams) ──

  private def num(r: Row, i: Int): Double = {
    val v = r.getAs[Number](i)
    if (v == null) Double.NaN else v.doubleValue()
  }

  private def xhatField(outCol: String) =
    Seq(StructField(outCol, ArrayType(DoubleType), nullable = false))

  /** Filter each series' measurements `zCols` (+ optional controls
    * `uCols`) through a matrix Kalman; appends `outCol` =
    * array<double> state estimate after each step.
    */
  def kalman(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      zCols: Seq[String], uCols: Seq[String],
      kf: MatrixKalman, x0: Array[Double], p0: Array[Array[Double]],
      outCol: String = "x_hat"): DataFrame = {
    val zIdx = zCols.map(df.schema.fieldIndex)
    val uIdx = uCols.map(df.schema.fieldIndex)
    def zu(r: Row) = (
      zIdx.map(num(r, _)).toArray,
      if (uIdx.isEmpty) None else Some(uIdx.map(num(r, _)).toArray))
    Recurrence.rowScan[(Array[Double], Array[Array[Double]])](
      df, keyCols, orderCols, xhatField(outCol)) { r =>
      val (z, u) = zu(r)
      val st = kf.step(x0, p0, z, u)
      (st, Seq(st._1.toSeq))
    } { (st, r) =>
      val (z, u) = zu(r)
      val st2 = kf.step(st._1, st._2, z, u)
      (st2, Seq(st2._1.toSeq))
    }
  }

  /** Luenberger tracking of each series (`yCols` measurements, optional
    * `uCols` controls); appends the post-update estimate.
    */
  def luenberger(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      yCols: Seq[String], uCols: Seq[String],
      obs: LuenbergerObserver, xHat0: Array[Double],
      outCol: String = "x_hat"): DataFrame = {
    val yIdx = yCols.map(df.schema.fieldIndex)
    val uIdx = uCols.map(df.schema.fieldIndex)
    val uZero = Array.fill(obs.b(0).length)(0.0)
    def yu(r: Row) = (
      yIdx.map(num(r, _)).toArray,
      if (uIdx.isEmpty) uZero else uIdx.map(num(r, _)).toArray)
    Recurrence.rowScan[Array[Double]](df, keyCols, orderCols, xhatField(outCol)) { r =>
      val (y, u) = yu(r)
      val x = obs.update(xHat0, u, y)
      (x, Seq(x.toSeq))
    } { (x0v, r) =>
      val (y, u) = yu(r)
      val x = obs.update(x0v, u, y)
      (x, Seq(x.toSeq))
    }
  }

  /** Sliding-mode tracking of each series; appends the estimate. */
  def slidingMode(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      yCols: Seq[String], uCols: Seq[String],
      obs: SlidingModeObserver, xHat0: Array[Double], dt: Double,
      outCol: String = "x_hat"): DataFrame = {
    val yIdx = yCols.map(df.schema.fieldIndex)
    val uIdx = uCols.map(df.schema.fieldIndex)
    val uZero = Array.fill(obs.b(0).length)(0.0)
    def yu(r: Row) = (
      yIdx.map(num(r, _)).toArray,
      if (uIdx.isEmpty) uZero else uIdx.map(num(r, _)).toArray)
    Recurrence.rowScan[Array[Double]](df, keyCols, orderCols, xhatField(outCol)) { r =>
      val (y, u) = yu(r)
      val x = obs.step(xHat0, y, dt, u)
      (x, Seq(x.toSeq))
    } { (x0v, r) =>
      val (y, u) = yu(r)
      val x = obs.step(x0v, y, dt, u)
      (x, Seq(x.toSeq))
    }
  }
}
