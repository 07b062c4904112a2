package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{DoubleParam, IntParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.param.shared.{HasInputCol, HasOutputCol}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.StructType

/** Nyström kernel approximation (Williams & Seeger, "Using the Nyström
  * Method to Speed Up Kernel Machines", NeurIPS 2001): pick `m` landmark
  * rows, eigendecompose the small m×m kernel matrix K_mm = U Λ Uᵀ on the
  * driver, and map every row to
  *
  *   φ(x) = Λ^{−1/2} Uᵀ · [k(x, l₁) … k(x, l_m)]
  *
  * so that φ(x)·φ(y) = k_xᵀ K_mm⁻¹ k_y ≈ k(x, y). Unlike the
  * shift-invariant-only RFF and the finite-dimensional poly expansion,
  * Nyström works for ANY kernel function — including the SIGMOID kernel
  * `tanh(γ·x·y + c₀)`, which is not positive-semidefinite and therefore
  * has no exact real feature map at all. Indefiniteness surfaces as
  * negative eigenvalues of K_mm; like scikit-learn's `Nystroem` (which
  * routes through SVD, i.e. |λ|), the map uses |λ|^{−1/2} and truncates
  * near-null components — the standard practical treatment.
  *
  * Scale shape: landmark selection is a deterministic hash-order
  * `orderBy(h).limit(m)` (TakeOrdered — map-side top-m, no full sort
  * shuffle); the fit solves one m×m eigenproblem on the driver (m ≲
  * hundreds); transform broadcasts the m landmarks + m×m map in the task
  * closure and maps rows independently — no shuffle, no n×n kernel
  * matrix, O(m·d + m²) per row.
  */
class NystroemKernelMap(override val uid: String)
    extends Estimator[NystroemKernelModel] with HasInputCol with HasOutputCol {

  def this() = this(Identifiable.randomUID("nystroem"))

  final val kernel = new Param[String](this, "kernel", "sigmoid|rbf|poly")
  final val gamma = new DoubleParam(this, "gamma", "kernel coefficient γ")
  final val coef0 = new DoubleParam(this, "coef0", "independent term c₀")
  final val degree = new IntParam(this, "degree", "poly kernel degree")
  final val numComponents = new IntParam(this, "numComponents", "landmark count m")
  final val seed = new LongParam(this, "seed", "landmark-selection hash seed")
  setDefault(kernel -> "sigmoid", gamma -> 0.0, coef0 -> 0.0, degree -> 3,
    numComponents -> 64, seed -> 42L)

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setKernel(v: String): this.type = set(kernel, v)
  /** γ ≤ 0 means sklearn's 'scale' on standardized input: 1/d. */
  def setGamma(v: Double): this.type = set(gamma, v)
  def setCoef0(v: Double): this.type = set(coef0, v)
  def setDegree(v: Int): this.type = set(degree, v)
  def setNumComponents(v: Int): this.type = set(numComponents, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def fit(ds: Dataset[_]): NystroemKernelModel = {
    val m = $(numComponents)
    val s = $(seed)
    require(Set("sigmoid", "rbf", "poly").contains($(kernel)),
      s"kernel must be sigmoid|rbf|poly, got ${$(kernel)}")
    // Deterministic pseudo-random landmark sample: stable content hash per
    // row, take the m smallest (TakeOrdered — no full sort). Over-fetch
    // 2m and drop exact duplicates so repeated rows can't degenerate K_mm.
    val hashUdf = udf { v: Vector =>
      var h = graft.functions.HashRandom.mix(s)
      val arr = v.toArray
      var i = 0
      while (i < arr.length) {
        h = graft.functions.HashRandom.mix(h ^ java.lang.Double.doubleToLongBits(arr(i)))
        i += 1
      }
      h
    }
    val fetched = ds.select(col($(inputCol)).as("__v"))
      .withColumn("__h", hashUdf(col("__v")))
      .orderBy(col("__h")).limit(2 * m)
      .collect().map(_.getAs[Vector](0).toArray)
    val landmarks = fetched.distinct.take(m)
    require(landmarks.nonEmpty, "Nystroem: empty training frame")
    val dim = landmarks(0).length
    val g = if ($(gamma) > 0) $(gamma) else 1.0 / dim
    val kf = Nystroem.kernelFn($(kernel), g, $(coef0), $(degree))
    val mm = landmarks.length
    val kmm = Array.tabulate(mm, mm)((i, j) => kf(landmarks(i), landmarks(j)))
    val (evals, evecs) = Nystroem.symEig(kmm)
    // map matrix M = diag(f)·Uᵀ with f_i = |λ_i|^{−1/2}, truncating
    // near-null directions (rank cutoff relative to the largest |λ|)
    val absMax = evals.map(math.abs).max
    val cutoff = math.max(1e-12, 1e-10 * absMax)
    val mapM = Array.tabulate(mm, mm) { (i, r) =>
      val a = math.abs(evals(i))
      if (a < cutoff) 0.0 else evecs(r)(i) / math.sqrt(a)
    }
    val model = new NystroemKernelModel(uid, landmarks, mapM,
      $(kernel), g, $(coef0), $(degree))
    copyValues(model.setParent(this))
    model.setInputCol($(inputCol)).setOutputCol($(outputCol))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ org.apache.spark.sql.types.StructField(
      $(outputCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType, nullable = false))

  override def copy(extra: ParamMap): NystroemKernelMap = defaultCopy(extra)
}

/** Fitted Nyström map: `landmarks` (m×d) and `mapM` (m×m, rows are the
  * scaled eigenvector projections) ride the task closure — broadcast
  * once per stage, rows transform independently.
  */
class NystroemKernelModel(
    override val uid: String,
    val landmarks: Array[Array[Double]],
    val mapM: Array[Array[Double]],
    val kernelName: String,
    val gammaEff: Double,
    val coef0Eff: Double,
    val degreeEff: Int)
    extends Model[NystroemKernelModel] with HasInputCol with HasOutputCol {

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val lm = landmarks
    val mm = mapM
    val kf = Nystroem.kernelFn(kernelName, gammaEff, coef0Eff, degreeEff)
    val f = udf { v: Vector =>
      val x = v.toArray
      val m = lm.length
      val kx = new Array[Double](m)
      var i = 0
      while (i < m) { kx(i) = kf(x, lm(i)); i += 1 }
      val out = new Array[Double](m)
      i = 0
      while (i < m) {
        var acc = 0.0
        val row = mm(i)
        var j = 0
        while (j < m) { acc += row(j) * kx(j); j += 1 }
        out(i) = acc
        i += 1
      }
      Vectors.dense(out)
    }
    ds.withColumn($(outputCol), f(col($(inputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ org.apache.spark.sql.types.StructField(
      $(outputCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType, nullable = false))

  override def copy(extra: ParamMap): NystroemKernelModel = {
    val m = new NystroemKernelModel(uid, landmarks, mapM, kernelName,
      gammaEff, coef0Eff, degreeEff)
    copyValues(m, extra).setParent(parent)
  }
}

object Nystroem {

  /** Kernel function by name; γ is the EFFECTIVE gamma (already resolved). */
  private[ml] def kernelFn(
      kernel: String, g: Double, c0: Double, deg: Int): (Array[Double], Array[Double]) => Double = {
    kernel match {
      case "sigmoid" => (a, b) => math.tanh(g * dot(a, b) + c0)
      case "rbf" => (a, b) => {
        var s = 0.0
        var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        math.exp(-g * s)
      }
      case "poly" => (a, b) => math.pow(g * dot(a, b) + c0, deg.toDouble)
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5 — public textbook algorithm): returns (eigenvalues,
    * eigenvectors-as-columns) with A = V·diag(λ)·Vᵀ. O(n³) per sweep on
    * the driver; n is the landmark count, small by construction.
    */
  def symEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var frob = 0.0
    for (i <- 0 until n; j <- 0 until n) frob += a(i)(j) * a(i)(j)
    val tol = 1e-22 * math.max(frob, java.lang.Double.MIN_NORMAL)
    var sweep = 0
    var converged = false
    while (sweep < 60 && !converged) {
      var off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) off += a(p)(q) * a(p)(q)
      if (off <= tol) converged = true
      else {
        var p = 0
        while (p < n - 1) {
          var q = p + 1
          while (q < n) {
            val apq = a(p)(q)
            if (math.abs(apq) > 1e-300) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
              val t = math.signum(if (theta == 0.0) 1.0 else theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              val c = 1.0 / math.sqrt(t * t + 1.0)
              val s = t * c
              val app = a(p)(p); val aqq = a(q)(q)
              a(p)(p) = app - t * apq
              a(q)(q) = aqq + t * apq
              a(p)(q) = 0.0; a(q)(p) = 0.0
              var r = 0
              while (r < n) {
                if (r != p && r != q) {
                  val arp = a(r)(p); val arq = a(r)(q)
                  a(r)(p) = c * arp - s * arq; a(p)(r) = a(r)(p)
                  a(r)(q) = s * arp + c * arq; a(q)(r) = a(r)(q)
                }
                val vrp = v(r)(p); val vrq = v(r)(q)
                v(r)(p) = c * vrp - s * vrq
                v(r)(q) = s * vrp + c * vrq
                r += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
