package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}

/** Platt sigmoid calibration for margin classifiers: fit
  * `P(y=1 | f) = 1 / (1 + exp(A·f + B))` on training decision values —
  * Platt 1999, with the robust Newton/backtracking formulation of Lin,
  * Weng & Keerthi 2007 ("A note on Platt's probabilistic outputs for
  * support vector machines"), the algorithm behind sklearn's
  * `SVC(probability=True)` (reference surface
  * `fdi_flow/detectors/sklearn_detectors.py:529,768-773`).
  *
  * Scale shape: the optimization is 2 parameters per binary problem, so
  * the data never moves — each Newton iteration (and each backtracking
  * trial) is ONE distributed aggregation pass computing gradient,
  * Hessian and objective for ALL `m` binary problems simultaneously
  * (per-row work is O(m), the reduced state is O(m) doubles). Rows carry
  * only the m decision values and m positive-flags; the feature vectors
  * stay behind in the fit that produced the margins.
  */
object Platt {

  /** Per-problem state carried across Newton iterations. */
  private final case class Prob(
      var a: Double, var b: Double, var fval: Double,
      var hiT: Double, var loT: Double, var done: Boolean)

  /** Fit sigmoid parameters for `m` binary problems.
    *
    * @param rows     (margins, positives): per-row decision values and
    *                 one-vs-rest positive flags, both length `m`
    * @param m        number of binary problems (1 for a binary classifier,
    *                 k for one-vs-rest multiclass)
    * @return `(A, B)` per problem
    */
  def fit(
      rows: Dataset[(Seq[Double], Seq[Boolean])],
      m: Int,
      maxIter: Int = 100,
      minStep: Double = 1e-10,
      sigma: Double = 1e-12,
      eps: Double = 1e-5): Array[(Double, Double)] = {

    // pass 0: positive/negative priors per problem
    val counts = aggPass(rows, 2 * m) { (acc, _, pos) =>
      var i = 0
      while (i < m) {
        if (pos(i)) acc(i) += 1 else acc(m + i) += 1
        i += 1
      }
    }
    val probs = Array.tabulate(m) { i =>
      val (p1, p0) = (counts(i), counts(m + i))
      Prob(
        a = 0.0,
        b = math.log((p0 + 1.0) / (p1 + 1.0)),
        fval = 0.0,
        hiT = (p1 + 1.0) / (p1 + 2.0),
        loT = 1.0 / (p0 + 2.0),
        done = false)
    }

    // objective of candidate (A, B) per problem, one pass for all
    def objective(as: Array[Double], bs: Array[Double]): Array[Double] =
      aggPass(rows, m) { (acc, f, pos) =>
        var i = 0
        while (i < m) {
          val t = if (pos(i)) probs(i).hiT else probs(i).loT
          val fApB = f(i) * as(i) + bs(i)
          acc(i) +=
            (if (fApB >= 0) t * fApB + math.log1p(math.exp(-fApB))
             else (t - 1.0) * fApB + math.log1p(math.exp(fApB)))
          i += 1
        }
      }

    val f0 = objective(probs.map(_.a), probs.map(_.b))
    probs.zipWithIndex.foreach { case (p, i) => p.fval = f0(i) }

    var iter = 0
    while (iter < maxIter && probs.exists(!_.done)) {
      // one pass: gradient + Hessian for every unfinished problem
      // layout per problem: g1, g2, h11, h21, h22
      val as = probs.map(_.a); val bs = probs.map(_.b)
      val stats = aggPass(rows, 5 * m) { (acc, f, pos) =>
        var i = 0
        while (i < m) {
          val t = if (pos(i)) probs(i).hiT else probs(i).loT
          val fApB = f(i) * as(i) + bs(i)
          val (p, q) =
            if (fApB >= 0) {
              val e = math.exp(-fApB); (e / (1 + e), 1 / (1 + e))
            } else {
              val e = math.exp(fApB); (1 / (1 + e), e / (1 + e))
            }
          val d2 = p * q
          val d1 = t - p
          acc(5 * i) += f(i) * d1
          acc(5 * i + 1) += d1
          acc(5 * i + 2) += f(i) * f(i) * d2
          acc(5 * i + 3) += f(i) * d2
          acc(5 * i + 4) += d2
          i += 1
        }
      }
      // Newton direction per problem (2×2 solve, regularized by sigma)
      val dA = new Array[Double](m); val dB = new Array[Double](m)
      val gd = new Array[Double](m)
      probs.zipWithIndex.foreach { case (p, i) =>
        if (!p.done) {
          val g1 = stats(5 * i); val g2 = stats(5 * i + 1)
          if (math.abs(g1) < eps && math.abs(g2) < eps) p.done = true
          else {
            val h11 = stats(5 * i + 2) + sigma
            val h21 = stats(5 * i + 3)
            val h22 = stats(5 * i + 4) + sigma
            val det = h11 * h22 - h21 * h21
            dA(i) = -(h22 * g1 - h21 * g2) / det
            dB(i) = -(h11 * g2 - h21 * g1) / det
            gd(i) = g1 * dA(i) + g2 * dB(i)
          }
        }
      }
      // backtracking line search, all problems stepped in shared passes;
      // each problem halves its own step until sufficient decrease
      val step = Array.fill(m)(1.0)
      val accepted = probs.map(_.done)
      var trials = 0
      while (accepted.exists(!_) && trials < 30) {
        val candA = Array.tabulate(m)(i =>
          if (accepted(i)) probs(i).a else probs(i).a + step(i) * dA(i))
        val candB = Array.tabulate(m)(i =>
          if (accepted(i)) probs(i).b else probs(i).b + step(i) * dB(i))
        val fs = objective(candA, candB)
        var i = 0
        while (i < m) {
          if (!accepted(i)) {
            if (fs(i) < probs(i).fval + 1e-4 * step(i) * gd(i)) {
              probs(i).a = candA(i); probs(i).b = candB(i); probs(i).fval = fs(i)
              accepted(i) = true
            } else {
              step(i) /= 2
              if (step(i) < minStep) { accepted(i) = true; probs(i).done = true }
            }
          }
          i += 1
        }
        trials += 1
      }
      iter += 1
    }
    probs.map(p => (p.a, p.b))
  }

  /** `P(y=1 | f)` under fitted `(A, B)` — numerically-stable sigmoid. */
  def predict(f: Double, a: Double, b: Double): Double = {
    val fApB = f * a + b
    if (fApB >= 0) { val e = math.exp(-fApB); e / (1 + e) }
    else 1.0 / (1.0 + math.exp(fApB))
  }

  /** One distributed pass: fold every (margins, positives) row into a
    * length-`width` double accumulator, elementwise-summed across
    * partitions. The only data movement is the O(width) partials.
    */
  private def aggPass(
      rows: Dataset[(Seq[Double], Seq[Boolean])],
      width: Int)(
      f: (Array[Double], Seq[Double], Seq[Boolean]) => Unit): Array[Double] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val acc = new Array[Double](width)
      it.foreach { case (fs, ps) => f(acc, fs, ps) }
      Iterator(acc)
    }.reduce { (x, y) =>
      var i = 0
      while (i < width) { x(i) += y(i); i += 1 }
      x
    }
  }
}
