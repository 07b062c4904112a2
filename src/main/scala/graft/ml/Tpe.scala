package graft.ml

import graft.functions.HashRandom

/** Seeded Tree-structured Parzen Estimator proposals (Bergstra, Bardenet,
  * Bengio & Kégl 2011, "Algorithms for Hyper-Parameter Optimization") —
  * the sampler behind the reference's `search_method='optuna'`
  * (`detectors/sklearn_detectors.py:138-189`, `TPESampler`), re-derived
  * from the paper over the reference's `param_search_space` convention
  * (`[lo, hi]` int/double ranges, anything else categorical).
  *
  * Per trial: split past observations into the top-`gamma` "good" set and
  * the rest; model each param's good/bad value distributions as 1-D
  * Parzen mixtures (truncated gaussians for ranges, add-one-smoothed
  * frequencies for categoricals); sample `nCandidates` points from the
  * good mixture and keep the argmax of Σ log l(x)/g(x) — the EI-optimal
  * proposal under the TPE factorization. Every draw is
  * [[HashRandom]]-derived from (seed, trial, param, draw), so the whole
  * search is reproducible on any JVM with no RNG state.
  */
object Tpe {

  /** One proposal. `observed` = (point, score) with HIGHER score better,
    * in trial order. Falls back to a seeded random sample while `observed`
    * is smaller than 2 (no bad set to contrast against).
    */
  def propose(
      space: Map[String, Seq[Any]],
      observed: Seq[(Map[String, Any], Double)],
      trial: Int,
      seed: Long,
      nCandidates: Int = 24,
      gamma: Double = 0.25): Map[String, Any] = {
    val params = space.toSeq.sortBy(_._1)
    if (observed.size < 2)
      return FaultDetector.samplePoints(space, trial + 1, HashRandom.mix(seed ^ 0x7a9e)).last
    // stable sort: score desc, earlier trial wins ties
    val ranked = observed.zipWithIndex
      .sortBy { case ((_, s), i) => (-s, i) }.map(_._1._1)
    val nGood = math.max(1, math.ceil(gamma * ranked.size).toInt)
    val good = ranked.take(nGood)
    val bad = ranked.drop(nGood)

    def stream(p: Int, kind: Int): Long = (trial.toLong << 20) | (p.toLong << 4) | kind.toLong

    // truncated-gaussian Parzen density over a [lo, hi] range
    def parzen(xs: Seq[Double], lo: Double, hi: Double)(x: Double): Double = {
      val bw = (hi - lo) * math.max(0.15, 1.0 / math.sqrt(xs.size.toDouble))
      val eps = 1.0 / (hi - lo) * 1e-3 // uniform floor keeps log finite
      if (xs.isEmpty) 1.0 / (hi - lo)
      else {
        var s = 0.0
        xs.foreach { v =>
          val z = (x - v) / bw
          s += math.exp(-0.5 * z * z) / (bw * math.sqrt(HashRandom.twoPi))
        }
        s / xs.size + eps
      }
    }

    def numericOf(v: Any): Double = v match {
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: Double => d
      case other => other.toString.toDouble
    }

    // sample each candidate point from the per-param good mixtures and
    // score Σ log l/g
    val cands = (0 until nCandidates).map { c =>
      var logRatio = 0.0
      val pt = params.zipWithIndex.map { case ((name, vals), pi) =>
        vals match {
          case Seq(lo: Int, hi: Int) =>
            val gv = good.map(p => numericOf(p(name)))
            val bw = (hi - lo).toDouble * math.max(0.15, 1.0 / math.sqrt(gv.size.toDouble))
            val comp = (HashRandom.uniform(seed, stream(pi, 0), c.toLong) * gv.size).toInt
            val raw = gv(math.min(comp, gv.size - 1)) +
              bw * HashRandom.gaussian(seed, stream(pi, 1), c.toLong)
            val x = math.max(lo, math.min(hi, math.round(raw).toInt))
            val l = parzen(gv, lo, hi)(x.toDouble)
            val g = parzen(bad.map(p => numericOf(p(name))), lo, hi)(x.toDouble)
            logRatio += math.log(l) - math.log(g)
            name -> (x: Any)
          case Seq(lo: Double, hi: Double) =>
            val gv = good.map(p => numericOf(p(name)))
            val bw = (hi - lo) * math.max(0.15, 1.0 / math.sqrt(gv.size.toDouble))
            val comp = (HashRandom.uniform(seed, stream(pi, 0), c.toLong) * gv.size).toInt
            val raw = gv(math.min(comp, gv.size - 1)) +
              bw * HashRandom.gaussian(seed, stream(pi, 1), c.toLong)
            val x = math.max(lo, math.min(hi, raw))
            val l = parzen(gv, lo, hi)(x)
            val g = parzen(bad.map(p => numericOf(p(name))), lo, hi)(x)
            logRatio += math.log(l) - math.log(g)
            name -> (x: Any)
          case cats =>
            // add-one-smoothed categorical mixtures
            def weight(set: Seq[Map[String, Any]], v: Any): Double =
              (set.count(_(name) == v) + 1.0) / (set.size + cats.size)
            val wts = cats.map(v => weight(good, v))
            val tot = wts.sum
            val u = HashRandom.uniform(seed, stream(pi, 0), c.toLong) * tot
            var acc = 0.0
            var pick = cats.last
            var i = 0
            while (i < cats.size) {
              acc += wts(i)
              if (u < acc) { pick = cats(i); i = cats.size } else i += 1
            }
            logRatio += math.log(weight(good, pick)) - math.log(weight(bad, pick))
            name -> pick
        }
      }.toMap
      (pt, logRatio, c)
    }
    // argmax of the density ratio; earlier candidate wins ties
    cands.minBy { case (_, r, c) => (-r, c) }._1
  }
}
