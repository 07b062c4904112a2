package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{DoubleParam, IntParam, ParamMap}
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.StructType

/** Exact explicit feature map of the polynomial kernel
  * `K(x,y) = (γ·x·y + coef0)^degree` (Cortes & Vapnik, "Support-Vector
  * Networks", 1995 — kernels as inner products in an expanded feature
  * space). For every multi-index α with |α| ≤ degree the map emits
  *
  *   φ_α(x) = sqrt( C(degree,|α|) · coef0^(degree−|α|) · γ^|α| · |α|!/α! ) · x^α
  *
  * so that `φ(x)·φ(y) = (γ·x·y + coef0)^degree` EXACTLY (multinomial
  * theorem; requires coef0 ≥ 0). Feeding these features to `LinearSVC`
  * reproduces the reference's `SVMFaultDetector(kernel='poly')`
  * (`detectors/sklearn_detectors.py:521-599`) hypothesis space with the
  * same kernel-space geometry — the same linearization strategy as
  * [[RandomFourierFeatures]] for RBF, but exact rather than approximate,
  * because the poly kernel's feature space is finite:
  * `C(d+degree, degree)` dimensions for d input features.
  *
  * Scale: rows map independently (no shuffle, no n×n kernel matrix); the
  * exponent table is derived once per (dim, degree) per executor. The
  * expansion is only tractable for modest input dims — `transform`
  * enforces `C(d+degree, degree) ≤ MaxExpandedTerms` and points at RFF
  * otherwise (sensor fault vectors are a handful of features; this is the
  * reference's own practical envelope for poly SVC).
  */
class PolynomialKernelMap(override val uid: String)
    extends Transformer with HasInputCol with HasOutputCol {

  def this() = this(Identifiable.randomUID("polyk"))

  final val degree = new IntParam(this, "degree", "polynomial kernel degree")
  final val gamma = new DoubleParam(this, "gamma", "kernel coefficient γ")
  final val coef0 = new DoubleParam(this, "coef0", "independent term (must be ≥ 0)")
  setDefault(degree -> 3, gamma -> 0.0, coef0 -> 0.0)

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setDegree(v: Int): this.type = set(degree, v)
  /** γ ≤ 0 means sklearn's 'scale' on standardized input: 1/d. */
  def setGamma(v: Double): this.type = set(gamma, v)
  def setCoef0(v: Double): this.type = set(coef0, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val deg = $(degree)
    val g0 = $(gamma)
    val r = $(coef0)
    require(deg >= 1, s"degree must be ≥ 1, got $deg")
    require(r >= 0, s"coef0 must be ≥ 0 for a real-valued feature map, got $r")
    // Fail fast on the driver when the input width is known from ML
    // attribute metadata (VectorAssembler and friends always write it);
    // without metadata the same require fires executor-side in
    // Poly.terms on the first row — correct but a task failure mid-job.
    val ag = org.apache.spark.ml.attribute.AttributeGroup
      .fromStructField(ds.schema($(inputCol)))
    if (ag.size > 0) Poly.requireTractable(ag.size, deg)
    val f = udf { v: Vector =>
      val dim = v.size
      val g = if (g0 > 0) g0 else 1.0 / dim
      val (exps, coefs) = Poly.terms(dim, deg, g, r)
      val out = new Array[Double](coefs.length)
      var t = 0
      while (t < coefs.length) {
        var acc = coefs(t)
        val e = exps(t)
        var j = 0
        while (j < dim) {
          var p = e(j)
          while (p > 0) { acc *= v(j); p -= 1 }
          j += 1
        }
        out(t) = acc
        t += 1
      }
      Vectors.dense(out)
    }
    ds.withColumn($(outputCol), f(col($(inputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ org.apache.spark.sql.types.StructField(
      $(outputCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType, nullable = false))

  override def copy(extra: ParamMap): PolynomialKernelMap = defaultCopy(extra)
}

object Poly {

  /** Ceiling on the expanded dimensionality `C(d+degree, degree)` — past
    * this the explicit map is the wrong tool (use RFF / a kernel
    * approximation); e.g. d=20, degree=3 → 1771 (fine), d=100, degree=3 →
    * 176851 (refused).
    */
  val MaxExpandedTerms: Int = 20000

  /** Expanded dimensionality of the exact map: `C(dim+degree, degree)`. */
  def expandedTerms(dim: Int, degree: Int): Long = binomial(dim + degree, degree)

  /** The output-dimension cap, shared by the driver-side check in
    * [[PolynomialKernelMap.transform]] and the executor-side one in
    * [[terms]].
    */
  def requireTractable(dim: Int, degree: Int): Unit = {
    val nTerms = expandedTerms(dim, degree)
    require(nTerms <= MaxExpandedTerms,
      s"poly kernel expansion has $nTerms terms for dim=$dim degree=$degree " +
        s"(> MaxExpandedTerms = $MaxExpandedTerms); use kernel='rbf' " +
        "(RandomFourierFeatures) instead — the explicit map is only " +
        "tractable at modest input widths")
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int, Double, Double), (Array[Array[Int]], Array[Double])]

  /** Executor-local term table for (dim, degree, γ, coef0): exponent
    * multi-indices α (|α| ≤ degree) and the matching sqrt-multinomial
    * coefficients. Deterministic, derived once per JVM per configuration.
    */
  def terms(dim: Int, degree: Int, gamma: Double, coef0: Double): (Array[Array[Int]], Array[Double]) =
    cache.getOrElseUpdate((dim, degree, gamma, coef0), {
      requireTractable(dim, degree)
      val exps = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      val cur = new Array[Int](dim)
      def rec(pos: Int, remaining: Int): Unit =
        if (pos == dim) exps += cur.clone()
        else {
          var k = 0
          while (k <= remaining) {
            cur(pos) = k
            rec(pos + 1, remaining - k)
            k += 1
          }
          cur(pos) = 0
        }
      rec(0, degree)
      val coefs = exps.map { e =>
        val k = e.sum // |α|
        // C(degree,k) · coef0^(degree−k) · γ^k · k!/α!
        val mult = e.foldLeft(factorial(k))((acc, ai) => acc / factorial(ai))
        math.sqrt(binomial(degree, k).toDouble * math.pow(coef0, (degree - k).toDouble) *
          math.pow(gamma, k.toDouble) * mult)
      }.toArray
      // drop zero-coefficient terms (coef0 = 0 kills every |α| < degree term)
      val keep = coefs.indices.filter(coefs(_) != 0d).toArray
      (keep.map(exps(_)), keep.map(coefs(_)))
    })

  private def factorial(n: Int): Double = (2 to n).foldLeft(1.0)(_ * _)

  /** C(n,k), saturating at Long.MaxValue: the stepwise long product
    * `acc·(n−k+i)/i` can wrap negative for very wide inputs (dim in the
    * millions at degree ≥ 4), which would slip past [[requireTractable]]
    * and let an astronomically large expansion reach the executors — so
    * the product runs in BigInt and clamps.
    */
  private def binomial(n: Int, k: Int): Long = {
    val kk = math.min(k, n - k)
    val acc = (1 to kk).foldLeft(BigInt(1))((a, i) => a * (n - kk + i) / i)
    if (acc > Long.MaxValue) Long.MaxValue else acc.toLong
  }
}
