package graft.ml

import org.apache.spark.ml.classification.{LinearSVCModel, OneVsRestModel}
import org.apache.spark.ml.feature.{StandardScalerModel => MlStandardScalerModel}

/** Fitted SVM → ANSI-SQL export — the TreeSql device extended to the D3
  * detectors' whole pipelines (all three kernel paths). Every stage is
  * bounded driver state: the scaler's (mean, 1/std) vectors, the kernel
  * feature map (seeded RFF planes / the multinomial poly term table /
  * the fitted Nyström landmarks + eigenvector map), and the per-class
  * LinearSVC (coefficients, intercept). The replay mirrors Spark's
  * arithmetic step for step:
  *
  *  - scale: `(x_j − mean_j) · r_j` with `r_j = 1/std_j` precomputed
  *    (zero when std is zero) — exactly `StandardScalerModel`'s
  *    shift-then-multiply, not a division;
  *  - feature map φ per kernel (renderers below), projections and dots
  *    accumulated in the transforms' own ascending-index order;
  *  - margin per class: `Σ_i coef_i·φ_i + intercept` (the BLAS dot's
  *    sequential order), OneVsRest argmax with lowest-class tie-break.
  *
  * Wide sums ride `list_aggregate([...], 'sum')` — one flat parse node
  * summing in list order (a 128-term `+` chain trips DuckDB's 128-deep
  * binder recursion limit); short chains stay inline left-associated.
  * `cos`/`tanh` may differ between the JVM and DuckDB's libm in the
  * last ulp; margins carry O(1) class gaps, so the argmax is
  * insensitive to that — the only approximation in the replay.
  */
object SvmSql {

  private def sqlList(a: Array[Double]): String =
    a.mkString("[", ", ", "]::DOUBLE[]")

  /** Shared confusion scaffold: `sc` holds the scaled features s0..s{d-1},
    * `extraCtes` may add kernel-specific stages, `fvSql` produces the
    * feature list `fv` (DOUBLE[], the SVC input), margins + OneVsRest
    * argmax + label decode close it out.
    */
  private def scaffold(
      scaler: MlStandardScalerModel,
      models: Array[LinearSVCModel],
      labels: Array[Double],
      fvSql: String,
      extraCtes: String,
      testWhere: String,
      fvFrom: String = "sc"): String = {
    val mean = scaler.mean.toArray
    val recip = scaler.std.toArray.map(s => if (s != 0.0) 1.0 / s else 0.0)
    val k = models.length
    require(k == labels.length, s"OneVsRest models $k != labels ${labels.length}")
    val scaleCols = mean.indices.map(j =>
      s"(v[${j + 1}] - ${mean(j)}) * ${recip(j)} AS s$j").mkString(",\n            ")
    val marginCols = models.zipWithIndex.map { case (m, c) =>
      val coef = sqlList(m.coefficients.toArray)
      s"list_aggregate(list_transform(list_zip(fv, $coef), " +
        s"p -> p[1] * p[2]), 'sum') + ${m.intercept} AS m$c"
    }.mkString(",\n            ")
    val margCase = (0 until k).map(c => s"WHEN $c THEN m$c").mkString(" ")
    val labelList = labels.mkString("[", ", ", "]::DOUBLE[]")
    s"""
        WITH e AS (
          SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE $testWhere
        ), sc AS (
          SELECT vec_id, label,
            $scaleCols
          FROM e
        ),$extraCtes f AS (
          SELECT vec_id, label, $fvSql AS fv
          FROM $fvFrom
        ), m AS (
          SELECT vec_id, label,
            $marginCols
          FROM f
        ), u AS (
          SELECT vec_id, label, cls.c AS c,
            CASE cls.c $margCase END AS marg
          FROM m CROSS JOIN (SELECT unnest(range(0, $k)) AS c) cls
        ), p AS (
          SELECT label, c FROM (
            SELECT label, c,
              row_number() OVER (PARTITION BY vec_id ORDER BY marg DESC, c ASC) AS rn
            FROM u) WHERE rn = 1
        )
        SELECT label, CAST(($labelList)[c + 1] AS INT) AS pred_label, count(*) AS n
        FROM p GROUP BY 1, 2
    """.stripMargin.trim
  }

  private def ovrModels(ovr: OneVsRestModel): Array[LinearSVCModel] =
    ovr.models.map(_.asInstanceOf[LinearSVCModel])

  /** RBF via random Fourier features: `φ_i = √(2/D)·cos(b_i + Σ_j W_ij·s_j)`
    * with the projection accumulated in ascending j (the transform's
    * loop order). `rffSeed`/`rffDim` must match the detector's
    * construction; γ resolves the way the transform does (≤ 0 → 1/d on
    * the standardized features).
    */
  def rffConfusionReplaySql(
      scaler: MlStandardScalerModel,
      ovr: OneVsRestModel,
      labels: Array[Double],
      rffSeed: Long,
      rffDim: Int,
      rffGamma: Double,
      testWhere: String): String = {
    val dim = scaler.mean.size
    val g = if (rffGamma > 0) rffGamma else 1.0 / dim
    val (w, b) = Rff.planes(rffSeed, rffDim, dim, g)
    val zScale = math.sqrt(2.0 / rffDim)
    val phis = (0 until rffDim).map { i =>
      val proj = (0 until dim).map(j => s"${w(i)(j)} * s$j").mkString(" + ")
      s"$zScale * cos(${b(i)} + $proj)"
    }
    scaffold(scaler, ovrModels(ovr), labels,
      phis.mkString("[\n              ", ",\n              ", "]"), "", testWhere)
  }

  /** Exact polynomial map: `φ_t = coef_t · Π_j s_j^{e_tj}` with the
    * product accumulated coefficient-first then ascending j (the
    * transform's loop order) — [[Poly.terms]]' deterministic term table
    * regenerated from the same (dim, degree, γ, coef0).
    */
  def polyConfusionReplaySql(
      scaler: MlStandardScalerModel,
      ovr: OneVsRestModel,
      labels: Array[Double],
      degree: Int,
      gamma: Double,
      coef0: Double,
      testWhere: String): String = {
    val dim = scaler.mean.size
    val g = if (gamma > 0) gamma else 1.0 / dim
    val (exps, coefs) = Poly.terms(dim, degree, g, coef0)
    val phis = coefs.indices.map { t =>
      val factors = (0 until dim).flatMap(j => Seq.fill(exps(t)(j))(s"s$j"))
      (s"${coefs(t)}" +: factors).mkString(" * ")
    }
    scaffold(scaler, ovrModels(ovr), labels,
      phis.mkString("[\n              ", ",\n              ", "]"), "", testWhere)
  }

  /** Nyström sigmoid map: `kx_l = tanh(γ·Σ_j s_j·L_lj + c0)` per fitted
    * landmark (ascending-j dot, the kernelFn order), then
    * `φ_i = Σ_l M_il·kx_l` against the eigenvector map — both matrices
    * exported from the fitted [[NystroemKernelModel]].
    */
  def nystroemConfusionReplaySql(
      scaler: MlStandardScalerModel,
      nys: NystroemKernelModel,
      ovr: OneVsRestModel,
      labels: Array[Double],
      testWhere: String): String = {
    require(nys.kernelName == "sigmoid",
      s"sigmoid replay only, got ${nys.kernelName}")
    val g = nys.gammaEff
    val c0 = nys.coef0Eff
    val dim = scaler.mean.size
    // this DuckDB build lacks tanh — the exp identity 1 − 2/(1+exp(2y))
    // saturates correctly at ±∞ and differs from Math.tanh only at ulp
    // scale, inside the margin tolerance the header documents
    val kxs = nys.landmarks.map { l =>
      val dot = (0 until dim).map(j => s"s$j * ${l(j)}").mkString(" + ")
      s"(1 - 2 / (1 + exp(2 * ($g * ($dot) + $c0))))"
    }
    val kxCte = s""" kx AS (
          SELECT vec_id, label, ${kxs.mkString("[\n              ", ",\n              ", "]")} AS kx,
            ${nys.mapM.map(sqlList).mkString("[\n              ", ",\n              ", "]")} AS mm
          FROM sc
        ),"""
    // φ from kx riding the mm literal: one row-dot per map row, summed
    // in list order like the transform's inner loop
    val fv = "list_transform(mm, row -> list_aggregate(" +
      "list_transform(list_zip(row, kx), p -> p[1] * p[2]), 'sum'))"
    scaffold(scaler, ovrModels(ovr), labels, fv, kxCte, testWhere, fvFrom = "kx")
  }
}
