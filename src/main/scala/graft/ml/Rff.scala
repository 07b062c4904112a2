package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{DoubleParam, IntParam, LongParam, ParamMap, Params}
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.StructType

/** Random Fourier Features for the RBF kernel (Rahimi & Recht, "Random
  * Features for Large-Scale Kernel Machines", NeurIPS 2007): maps x to
  * z(x) = sqrt(2/D)·cos(Wx + b) with W ~ N(0, 2γI), b ~ U(0, 2π), so
  * z(x)·z(y) ≈ exp(−γ‖x−y‖²). This linearizes the reference's default
  * `SVMFaultDetector(kernel='rbf')` (`detectors/sklearn_detectors.py:521-599`)
  * into a LinearSVC-trainable feature space — the scalable substitution
  * for kernel SVC (no n×n kernel matrix; rows map independently, no
  * shuffle).
  *
  * W and b are derived from `seed` via a SplitMix64 hash per (i,j) cell —
  * no RNG state, identical on every executor, no driver-side matrix to
  * broadcast (cells are recomputed per partition; D·d multiplies dwarf the
  * hash cost).
  */
class RandomFourierFeatures(override val uid: String)
    extends Transformer with HasInputCol with HasOutputCol {

  def this() = this(Identifiable.randomUID("rff"))

  final val numFeatures = new IntParam(this, "numFeatures", "output dimensionality D")
  final val gamma = new DoubleParam(this, "gamma", "RBF kernel coefficient")
  final val seed = new LongParam(this, "seed", "hash seed for W and b")
  setDefault(numFeatures -> 128, gamma -> 0.0, seed -> 42L)

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setNumFeatures(v: Int): this.type = set(numFeatures, v)
  /** γ ≤ 0 means sklearn's 'scale' on standardized input: 1/d. */
  def setGamma(v: Double): this.type = set(gamma, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val d = $(numFeatures)
    val g0 = $(gamma)
    val s = $(seed)
    val f = udf { v: Vector =>
      val dim = v.size
      val g = if (g0 > 0) g0 else 1.0 / dim
      // W and b are re-derived from the hash at most once per executor
      // (cached by key), so per-row cost is the D·d multiply only.
      val (wm, b) = Rff.planes(s, d, dim, g)
      val zScale = math.sqrt(2.0 / d)
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        var proj = b(i)
        val row = wm(i)
        var j = 0
        while (j < dim) {
          proj += row(j) * v(j)
          j += 1
        }
        out(i) = zScale * math.cos(proj)
        i += 1
      }
      Vectors.dense(out)
    }
    ds.withColumn($(outputCol), f(col($(inputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ org.apache.spark.sql.types.StructField(
      $(outputCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType, nullable = false))

  override def copy(extra: ParamMap): RandomFourierFeatures = defaultCopy(extra)
}

object Rff {
  import graft.functions.HashRandom

  val twoPi: Double = HashRandom.twoPi

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Long, Int, Int, Double), (Array[Array[Double]], Array[Double])]

  /** Executor-local (W, b) for (seed, D, d, γ): W(i)(j) = √(2γ)·N(0,1)
    * from the hash, b(i) ~ U(0, 2π). Deterministic on every JVM.
    */
  def planes(seed: Long, nPlanes: Int, dim: Int, gamma: Double): (Array[Array[Double]], Array[Double]) =
    cache.getOrElseUpdate((seed, nPlanes, dim, gamma), {
      val wScale = math.sqrt(2.0 * gamma)
      val w = Array.tabulate(nPlanes, dim)((i, j) => wScale * gaussian(seed, i.toLong, j.toLong))
      val b = Array.tabulate(nPlanes)(i => twoPi * uniform(seed, i.toLong, -1L))
      (w, b)
    })

  /** Deterministic U(0,1) from (seed, i, j) — see [[HashRandom]]. */
  def uniform(seed: Long, i: Long, j: Long): Double = HashRandom.uniform(seed, i, j)

  /** Deterministic standard normal — see [[HashRandom]]. */
  def gaussian(seed: Long, i: Long, j: Long): Double = HashRandom.gaussian(seed, i, j)
}
