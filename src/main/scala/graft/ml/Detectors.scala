package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{
  ClassificationModel, Classifier, GBTClassificationModel, GBTClassifier,
  LinearSVC, LinearSVCModel, OneVsRest, OneVsRestModel,
  RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler => MlStandardScaler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{ParamMap, ParamPair, Params}
import org.apache.spark.ml.tuning.CrossValidator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable fault detectors (reference D2–D8) re-expressed as MLlib
  * Pipelines over DataFrames.
  *
  * Reference surface (identical across all seven detectors,
  * `detectors/sklearn_detectors.py:73-253`): `fit(X, y, optimize)`,
  * `predict`, `predict_proba`, `score` (accuracy), `get_params`,
  * `get_feature_importances`, with hyper-search over a
  * `param_search_space` dict. Here `X` is a DataFrame with an
  * `array<numeric>` feature column (the engine's embedding/window shape)
  * plus a label column; training and prediction are distributed jobs —
  * tree aggregation for forests/boosting, L-BFGS for the SVM — so fit
  * scales with executors instead of a single process.
  *
  * Label handling follows sklearn's `LabelEncoder` semantics (sorted
  * unique values → 0..K−1) so arbitrary integer fault codes work, and
  * `predict` maps back to the original codes.
  */
abstract class FaultDetector(
    val paramSearchSpace: Map[String, Seq[Any]],
    val nIter: Int,
    val cvFolds: Int,
    val randomState: Long) extends Serializable {

  protected var pipelineModel: Option[PipelineModel] = None
  protected var labelValues: Array[Double] = Array.empty
  /** Best point found by `fit(optimize = true)` (reference `best_params_`). */
  var bestParams: Map[String, Any] = Map.empty
  /** CV accuracy of the best point (reference `avgMetrics` analogue). */
  var cvAccuracy: Option[Double] = None
  /** Trial history of the LAST selection round — `(trial index, point,
    * metric)` for every candidate the final argmax chose among: all CV
    * points for `fit(optimize)`, the final rung for successive halving,
    * every observed trial for TPE. Exists so the d8 oracles can pin the
    * (non-ANSI) metrics as literals while DuckDB independently replays
    * the selection rule — metric desc, trial index asc (each search
    * path's documented tie-break).
    */
  var trialLog: Seq[(Int, Map[String, Any], Double)] = Nil

  /** The final classifier stage for `k` classes (possibly OneVsRest). */
  protected def buildClassifier(k: Int): PipelineStage
  /** Feature-prep stages inserted before the classifier. */
  protected def preStages(k: Int): Seq[PipelineStage] = Nil
  /** The Params object hyper-search points apply to (inner classifier
    * when OneVsRest-wrapped — ParamMaps propagate through
    * `Pipeline.copy` → `OneVsRest.copy` → `classifier.copy`).
    */
  protected def tunable(stage: PipelineStage): Params = stage match {
    case o: OneVsRest => o.getClassifier
    case p: Params    => p
  }
  /** Translate one reference-named search param to an MLlib ParamPair. */
  protected def translate(p: Params, name: String, value: Any): ParamPair[_]
  /** Constructor params (reference `get_params()` when not optimized). */
  def params: Map[String, Any]
  /** Extra training-only column (e.g. a validation-split indicator). */
  protected def trainExtraCol: Option[(String, Column)] = None
  /** Post-fit hook, invoked by every fit path with the prepped training
    * frame (still cached when small) and class count — e.g. probability
    * calibration on training margins.
    */
  protected def postFit(prep: DataFrame, k: Int): Unit = ()

  /** Search params whose positive double bounds draw log-uniformly in
    * [[FaultDetector.samplePoints]]. Empty for every detector except the
    * SVM (C/gamma): the reference's tree-booster searches draw all
    * doubles uniformly, including XGB's `gamma` (min split gain,
    * `xgb_detectors.py:163-166`).
    */
  protected def logUniformParams: Set[String] = Set.empty

  def getParams: Map[String, Any] = if (bestParams.nonEmpty) bestParams else params

  /** The fitted pipeline's final (classifier) stage — driver-bounded
    * state the TreeSql replay oracles export as SQL literals.
    */
  def fittedClassifierStage: org.apache.spark.ml.Transformer = {
    val m = pipelineModel.getOrElse(
      throw new IllegalStateException("Model must be fitted first"))
    m.stages.last
  }

  /** Sorted original label domain (index ↔ encoded class). */
  def labelDomain: Array[Double] = labelValues.clone()

  /** All fitted pipeline stages (feature prep + classifier) — the SvmSql
    * replay needs the scaler and kernel-map stages too.
    */
  def fittedStages: Array[org.apache.spark.ml.Transformer] =
    pipelineModel.getOrElse(
      throw new IllegalStateException("Model must be fitted first")).stages

  protected def prepFeatures(df: DataFrame, featCol: String): DataFrame =
    df.withColumn("features", array_to_vector(col(featCol).cast("array<double>")))

  private def labelIdx(c: Column): Column = {
    val m = map(labelValues.zipWithIndex.flatMap { case (l, i) =>
      Seq(lit(l), lit(i.toDouble)) }: _*)
    element_at(m, c.cast("double"))
  }

  /** Shared fit preamble: label domain + row count in ONE job (the label
    * set is small by construction — fault codes), feature prep,
    * small-frame coalesce+cache. Small-frame fit hygiene: every boosting
    * iteration / CV fold launches a full stage over the training frame,
    * so a tiny frame spread over 32 partitions pays 32× task-scheduling
    * overhead per iteration (hundreds of stages for GBT×OneVsRest×CV).
    * Coalesce small frames to a few partitions and pin them in memory;
    * big frames (the 100 TB case, where per-iteration stages are the
    * point) keep their partitioning. Returns (prep, k, small).
    */
  private def prepareFit(
      df: DataFrame, featCol: String, labelCol: String): (DataFrame, Int, Boolean) = {
    val head = df.select(
      sort_array(collect_set(col(labelCol).cast("double"))).as("__ls"),
      count(col(labelCol)).as("__n")).head()
    labelValues = head.getSeq[Double](0).toArray
    val k = labelValues.length
    require(k >= 2, s"need >= 2 classes, got $k")
    var prep = prepFeatures(df, featCol)
      .withColumn("label", labelIdx(col(labelCol)))
    trainExtraCol.foreach { case (n, c) => prep = prep.withColumn(n, c) }
    val small = head.getLong(1) <= FaultDetector.SmallFitRows
    if (small) prep = prep.coalesce(4).cache()
    (prep, k, small)
  }

  /** Fit the full pipeline on `frame` at one search point (empty point =
    * the constructor params).
    */
  private def fitAt(frame: DataFrame, k: Int, pt: Map[String, Any]): PipelineModel = {
    val clf = buildClassifier(k)
    val pipe = new Pipeline().setStages((preStages(k) :+ clf).toArray)
    if (pt.isEmpty) pipe.fit(frame)
    else {
      val pm = ParamMap.empty
      pt.foreach { case (name, v) => pm.put(translate(tunable(clf), name, v)) }
      pipe.fit(frame, pm)
    }
  }

  def fit(df: DataFrame, featCol: String, labelCol: String,
          optimize: Boolean = false): this.type = {
    val (prep, k, small) = prepareFit(df, featCol, labelCol)
    val clf = buildClassifier(k)
    val pipe = new Pipeline().setStages((preStages(k) :+ clf).toArray)
    if (optimize && paramSearchSpace.nonEmpty) {
      val points = FaultDetector.samplePoints(paramSearchSpace, nIter, randomState,
        logUniformParams)
      val grid = points.map { pt =>
        val pm = ParamMap.empty
        pt.foreach { case (name, v) => pm.put(translate(tunable(clf), name, v)) }
        pm
      }.toArray
      val cv = new CrossValidator()
        .setEstimator(pipe)
        .setEstimatorParamMaps(grid)
        .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
        .setNumFolds(cvFolds)
        .setSeed(randomState)
        .setParallelism(8)
      val cvm = cv.fit(prep)
      // maxBy keeps the FIRST max → tie-break = metric desc, index asc
      val best = cvm.avgMetrics.zipWithIndex.maxBy(_._1)._2
      trialLog = points.zipWithIndex.map { case (pt, i) =>
        (i, pt, cvm.avgMetrics(i)) }
      bestParams = points(best)
      cvAccuracy = Some(cvm.avgMetrics(best))
      pipelineModel = Some(cvm.bestModel.asInstanceOf[PipelineModel])
    } else {
      pipelineModel = Some(pipe.fit(prep))
    }
    postFit(prep, k)
    if (small) prep.unpersist(blocking = false)
    this
  }

  /** Adaptive hyper-search by seeded successive halving (Jamieson–Talwalkar
    * AISTATS'16; the Hyperband rung structure) — the engine's stand-in for
    * the reference's Optuna TPE mode (`sklearn_detectors.py:138-189`,
    * `search_method='optuna'`): instead of Bayesian proposals, the
    * adaptivity is in the budget allocation — all `nIter` sampled points
    * start on a small seeded sample of the training data, and each rung
    * keeps the top `1/eta` of candidates by held-out accuracy while
    * multiplying the data budget by `eta`, until one survivor is fit on
    * the full training frame. Fully deterministic under `randomState`
    * (seeded sampling, seeded splits, index tie-breaks).
    *
    * Scale shape: early rungs fit many models on small samples (cheap,
    * parallel over the cluster); only the few survivors see the full
    * data — the same property that makes Hyperband practical at scale.
    */
  def fitSuccessiveHalving(
      df: DataFrame, featCol: String, labelCol: String,
      eta: Int = 2): this.type = {
    require(eta >= 2, s"eta must be >= 2, got $eta")
    require(paramSearchSpace.nonEmpty, "paramSearchSpace is empty")
    val (prep, k, small) = prepareFit(df, featCol, labelCol)
    // fixed 80/20 train/validation split, seeded
    val Array(trainAll, valid) = prep.randomSplit(Array(0.8, 0.2), randomState)
    val validC = valid.cache()
    val points = FaultDetector.samplePoints(paramSearchSpace, nIter, randomState,
      logUniformParams)
    val evaluator = new MulticlassClassificationEvaluator().setMetricName("accuracy")
    def accuracy(m: PipelineModel): Double = evaluator.evaluate(m.transform(validC))
    val nRungs = math.max(1,
      math.ceil(math.log(points.length.toDouble) / math.log(eta.toDouble)).toInt)
    var frac = math.pow(eta.toDouble, -(nRungs - 1).toDouble)
    var alive: Seq[(Map[String, Any], Int)] = points.zipWithIndex
    var lastScores: Map[Int, Double] = Map.empty
    var rung = 0
    while (alive.length > 1) {
      val sample =
        if (frac >= 1.0) trainAll
        else trainAll.sample(withReplacement = false, frac, randomState + rung)
      val sampleC = sample.cache()
      // candidates within a rung are independent given the rung's sample
      // (selection happens after the whole rung scores), so their fits
      // run concurrently — same schedule-invariance argument as the TPE
      // startup trials; results keep candidate order
      val scored = locally {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, alive.length))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try Await.result(
          Future.sequence(alive.toList.map { case (pt, idx) =>
            Future((pt, idx, accuracy(fitAt(sampleC, k, pt))))
          }), Duration.Inf)
        finally pool.shutdown()
      }
      sampleC.unpersist(blocking = false)
      lastScores = scored.map { case (_, idx, acc) => idx -> acc }.toMap
      trialLog = scored.map { case (pt, idx, acc) => (idx, pt, acc) }
      val keep = math.max(1, math.ceil(alive.length.toDouble / eta).toInt)
      // accuracy desc, sampled index asc as the deterministic tie-break
      alive = scored.sortBy { case (_, idx, acc) => (-acc, idx) }
        .take(keep).map { case (pt, idx, _) => (pt, idx) }
      frac = math.min(1.0, frac * eta)
      rung += 1
    }
    val (bestPt, bestIdx) = alive.head
    bestParams = bestPt
    cvAccuracy = lastScores.get(bestIdx)
    pipelineModel = Some(fitAt(prep, k, bestPt))
    postFit(prep, k)
    validC.unpersist(blocking = false)
    if (small) prep.unpersist(blocking = false)
    this
  }

  /** Adaptive hyper-search with seeded TPE proposals ([[Tpe]]; Bergstra
    * et al. 2011) — the engine's direct counterpart to the reference's
    * `search_method='optuna'` TPESampler path
    * (`sklearn_detectors.py:138-189`): `nStartup` seeded random trials,
    * then each further trial proposes the argmax-EI point under the
    * good/bad Parzen factorization of the trials so far, evaluated on a
    * fixed seeded 80/20 validation split. Sequential by nature (each
    * proposal conditions on all previous results) — each trial is still
    * a fully distributed fit. Deterministic under `randomState`.
    */
  def fitTpe(
      df: DataFrame, featCol: String, labelCol: String,
      nStartup: Int = 4): this.type = {
    require(paramSearchSpace.nonEmpty, "paramSearchSpace is empty")
    val (prep, k, small) = prepareFit(df, featCol, labelCol)
    val Array(trainAll, valid) = prep.randomSplit(Array(0.8, 0.2), randomState)
    val trainC = trainAll.cache()
    val validC = valid.cache()
    val evaluator = new MulticlassClassificationEvaluator().setMetricName("accuracy")
    val startup = FaultDetector.samplePoints(paramSearchSpace,
      math.min(nStartup, nIter), randomState, logUniformParams)
    val observed = scala.collection.mutable.ArrayBuffer.empty[(Map[String, Any], Double)]
    def runTrial(pt: Map[String, Any]): Double =
      evaluator.evaluate(fitAt(trainC, k, pt).transform(validC))
    // Startup trials are random draws that condition on NOTHING (optuna's
    // TPE likewise only consults history after n_startup_trials), so they
    // run concurrently — each trial is still a distributed fit, and the
    // observed sequence keeps trial-index order, so results are
    // bit-identical to the sequential schedule. Only the proposal phase
    // below is inherently one-after-another.
    locally {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, startup.length))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        val accs = Await.result(
          Future.sequence(startup.toList.map(pt => Future(runTrial(pt)))),
          Duration.Inf)
        observed ++= startup.zip(accs)
      } finally pool.shutdown()
    }
    (startup.length until nIter).foreach { trial =>
      val pt = Tpe.propose(paramSearchSpace, observed.toSeq, trial, randomState)
      observed += (pt -> runTrial(pt))
    }
    val bestIdx = observed.zipWithIndex.minBy { case ((_, a), i) => (-a, i) }._2
    trialLog = observed.toSeq.zipWithIndex.map { case ((pt, a), i) => (i, pt, a) }
    bestParams = observed(bestIdx)._1
    cvAccuracy = Some(observed(bestIdx)._2)
    pipelineModel = Some(fitAt(prep, k, bestParams))
    postFit(prep, k)
    trainC.unpersist(blocking = false)
    validC.unpersist(blocking = false)
    if (small) prep.unpersist(blocking = false)
    this
  }

  protected def transformed(df: DataFrame, featCol: String): DataFrame = {
    val m = pipelineModel.getOrElse(
      throw new IllegalStateException("Model must be fitted before prediction"))
    m.transform(prepFeatures(df, featCol))
  }

  /** Input rows + `pred_label` (original label domain, double). */
  def predict(df: DataFrame, featCol: String): DataFrame = {
    val lbls = array(labelValues.map(lit): _*)
    transformed(df, featCol)
      .withColumn("pred_label", element_at(lbls, col("prediction").cast("int") + 1))
      .drop("features", "rawPrediction", "probability", "prediction",
        FaultDetector.ScaledCol, FaultDetector.RffCol, FaultDetector.PolyCol)
  }

  /** Input rows + `proba` (array<double> over classes in sorted-label
    * order). Only for probabilistic models (reference raises for
    * `SVC(probability=False)` likewise).
    */
  def predictProba(df: DataFrame, featCol: String): DataFrame = {
    val out = transformed(df, featCol)
    require(out.columns.contains("probability"),
      s"${getClass.getSimpleName} does not expose class probabilities")
    out.withColumn("proba", vector_to_array(col("probability")))
      .drop("features", "rawPrediction", "probability", "prediction",
        FaultDetector.ScaledCol, FaultDetector.RffCol, FaultDetector.PolyCol)
  }

  /** Accuracy on labelled data (reference `score`). */
  def score(df: DataFrame, featCol: String, labelCol: String): Double =
    predict(df, featCol)
      .select(avg(when(col("pred_label") === col(labelCol).cast("double"), 1d)
        .otherwise(0d)).as("acc"))
      .head().getDouble(0)

  /** Normalized importances (tree models; averaged across the OneVsRest
    * binary models for multiclass boosting).
    */
  def featureImportances: Option[Vector] = pipelineModel.flatMap { m =>
    m.stages.last match {
      case rf: RandomForestClassificationModel => Some(rf.featureImportances)
      case g: GBTClassificationModel           => Some(g.featureImportances)
      case ovr: OneVsRestModel =>
        val per = ovr.models.toSeq.collect {
          case g: GBTClassificationModel           => g.featureImportances
          case r: RandomForestClassificationModel  => r.featureImportances
        }
        if (per.isEmpty) None
        else {
          val sum = new Array[Double](per.head.size)
          per.foreach(_.foreachActive((i, x) => sum(i) += x))
          val tot = sum.sum
          Some(Vectors.dense(if (tot > 0) sum.map(_ / tot) else sum))
        }
      case _ => None
    }
  }

  protected def asInt(v: Any): Int = v match {
    case i: Int => i; case l: Long => l.toInt; case d: Double => d.toInt
    case other  => other.toString.toInt
  }
  protected def asDouble(v: Any): Double = v match {
    case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble
    case other     => other.toString.toDouble
  }
  protected def asBool(v: Any): Boolean = v match {
    case b: Boolean => b; case other => other.toString.toBoolean
  }
}

object FaultDetector {
  val ScaledCol = "__scaled"
  val RffCol = "__rff"
  val PolyCol = "__poly"
  val NysCol = "__nys"

  /** Training frames at or below this row count are coalesced to a few
    * partitions and cached for the duration of the fit (see `fit`).
    */
  val SmallFitRows = 100000L

  /** Random-search sampling over the reference's search-space convention
    * (`sklearn_detectors.py:112-136`): a 2-element [lo, hi] of ints draws
    * uniform ints (hi inclusive), of doubles draws uniform doubles;
    * anything else is a categorical choice list. Positive double bounds
    * on params named in `logUniform` draw LOG-uniformly —
    * `exp(U(ln lo, ln hi))` — matching the reference's scale-free SVM
    * C/gamma search (`sklearn_detectors.py:646-650`, scipy `loguniform`).
    * The set is per-detector ([[FaultDetector.logUniformParams]]): only
    * the SVM declares one, because the reference's XGB random search
    * draws its `gamma` (min split gain) UNIFORMLY
    * (`xgb_detectors.py:163-166`) — a global name match would give tree
    * detectors the wrong distribution. One uniform draw either way, so
    * declaring a param log-uniform never shifts the other params'
    * streams. Seeded — the same space, nIter and seed reproduce the same
    * candidate grid everywhere.
    */
  def samplePoints(space: Map[String, Seq[Any]], n: Int, seed: Long,
                   logUniform: Set[String] = Set.empty): Seq[Map[String, Any]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      space.toSeq.sortBy(_._1).map { case (name, vals) =>
        name -> (vals match {
          case Seq(lo: Int, hi: Int)       => lo + rnd.nextInt(hi - lo + 1)
          case Seq(lo: Double, hi: Double)
              if logUniform.contains(name) && lo > 0 && hi > 0 =>
            math.exp(math.log(lo) + rnd.nextDouble() * (math.log(hi) - math.log(lo)))
          case Seq(lo: Double, hi: Double) => lo + rnd.nextDouble() * (hi - lo)
          case cats                        => cats(rnd.nextInt(cats.length))
        })
      }.toMap
    }
  }
}

/** D2 — reference `RandomForestFaultDetector`
  * (`detectors/sklearn_detectors.py:256-518`). Multiclass-native;
  * `max_depth=None` maps to MLlib's depth cap (30).
  */
class RandomForestFaultDetector(
    nEstimators: Int = 100,
    criterion: String = "gini",
    maxDepth: Option[Int] = None,
    minSamplesLeaf: Int = 1,
    maxFeatures: String = "sqrt",
    bootstrap: Boolean = true,
    randomState: Long = 42L,
    paramSearchSpace: Map[String, Seq[Any]] = Map.empty,
    nIter: Int = 10,
    cvFolds: Int = 5)
  extends FaultDetector(paramSearchSpace, nIter, cvFolds, randomState) {

  override protected def buildClassifier(k: Int): PipelineStage =
    new RandomForestClassifier()
      .setNumTrees(nEstimators)
      .setImpurity(criterion)
      .setMaxDepth(maxDepth.map(math.min(_, 30)).getOrElse(30))
      .setMinInstancesPerNode(minSamplesLeaf)
      .setFeatureSubsetStrategy(maxFeatures match {
        case "sqrt" | "log2" | "auto" => maxFeatures
        case _                        => "all"
      })
      .setBootstrap(bootstrap)
      .setSeed(randomState)

  override protected def translate(p: Params, name: String, v: Any): ParamPair[_] = {
    val rf = p.asInstanceOf[RandomForestClassifier]
    name match {
      case "n_estimators"     => ParamPair(rf.numTrees, asInt(v))
      case "max_depth"        => ParamPair(rf.maxDepth, math.min(asInt(v), 30))
      case "min_samples_leaf" => ParamPair(rf.minInstancesPerNode, asInt(v))
      case "criterion"        => ParamPair(rf.impurity, v.toString)
      case "max_features"     => ParamPair(rf.featureSubsetStrategy, v.toString)
      case "bootstrap"        => ParamPair(rf.bootstrap, asBool(v))
      case other => throw new IllegalArgumentException(s"unsupported search param: $other")
    }
  }

  override def params: Map[String, Any] = Map(
    "n_estimators" -> nEstimators, "criterion" -> criterion,
    "max_depth" -> maxDepth, "min_samples_leaf" -> minSamplesLeaf,
    "max_features" -> maxFeatures, "bootstrap" -> bootstrap)
}

/** D3 — reference `SVMFaultDetector`
  * (`detectors/sklearn_detectors.py:521-815`). The default RBF kernel is
  * linearized via [[RandomFourierFeatures]] feeding `LinearSVC` (the
  * scalable substitution for kernel SVC — documented in SURVEY §2.6);
  * `kernel="poly"` is linearized EXACTLY via [[PolynomialKernelMap]]
  * (finite feature space — no approximation); `kernel="sigmoid"` —
  * tanh, not PSD, so no exact real feature map exists — goes through
  * the [[NystroemKernelMap]] landmark approximation, the same treatment
  * scikit-learn's `Nystroem` applies; `kernel="linear"` skips the
  * kernel stage. Internal standardization mirrors the reference's
  * `scale_features=True`. The reference's double-scaling bug in
  * `score()` (`:779-800`) is intentionally NOT replicated (SURVEY §7.5).
  */
class SVMFaultDetector(
    c: Double = 1.0,
    kernel: String = "rbf",
    gamma: Double = 0.0, // <= 0 → sklearn 'scale' (1/d on standardized input)
    degree: Int = 3, // poly kernel degree (sklearn default)
    coef0: Double = 0.0, // poly kernel independent term (sklearn default)
    maxIter: Int = 100,
    tol: Double = 1e-6,
    scaleFeatures: Boolean = true,
    rffFeatures: Int = 128,
    randomState: Long = 42L,
    paramSearchSpace: Map[String, Seq[Any]] = Map.empty,
    nIter: Int = 10,
    cvFolds: Int = 5,
    probability: Boolean = false) // reference SVC(probability=...), default False
  extends FaultDetector(paramSearchSpace, nIter, cvFolds, randomState) {

  require(kernel == "rbf" || kernel == "linear" || kernel == "poly" || kernel == "sigmoid",
    s"kernel must be rbf|linear|poly|sigmoid, got $kernel")

  /** Only the SVM search draws C/gamma log-uniformly (scipy `loguniform`
    * in the reference's SVM space, `sklearn_detectors.py:646-650`).
    */
  override protected def logUniformParams: Set[String] = Set("C", "gamma")

  private val rffStage = new RandomFourierFeatures()
    .setNumFeatures(rffFeatures).setGamma(gamma).setSeed(randomState)

  private val polyStage = new PolynomialKernelMap()
    .setDegree(degree).setGamma(gamma).setCoef0(coef0)

  private val nysStage = new NystroemKernelMap()
    .setKernel("sigmoid").setGamma(gamma).setCoef0(coef0)
    .setNumComponents(rffFeatures).setSeed(randomState)

  private def svcFeaturesCol: String =
    if (kernel == "rbf") FaultDetector.RffCol
    else if (kernel == "poly") FaultDetector.PolyCol
    else if (kernel == "sigmoid") FaultDetector.NysCol
    else if (scaleFeatures) FaultDetector.ScaledCol
    else "features"

  override protected def preStages(k: Int): Seq[PipelineStage] = {
    val scale =
      if (scaleFeatures)
        Seq(new MlStandardScaler().setInputCol("features")
          .setOutputCol(FaultDetector.ScaledCol).setWithMean(true).setWithStd(true))
      else Nil
    val kernelIn = if (scaleFeatures) FaultDetector.ScaledCol else "features"
    val kstage = kernel match {
      case "rbf"     => Seq(rffStage.setInputCol(kernelIn).setOutputCol(FaultDetector.RffCol))
      case "poly"    => Seq(polyStage.setInputCol(kernelIn).setOutputCol(FaultDetector.PolyCol))
      case "sigmoid" => Seq(nysStage.setInputCol(kernelIn).setOutputCol(FaultDetector.NysCol))
      case _         => Nil
    }
    scale ++ kstage
  }

  override protected def buildClassifier(k: Int): PipelineStage = {
    val svc = new LinearSVC()
      .setFeaturesCol(svcFeaturesCol)
      .setRegParam(1.0 / c)
      .setMaxIter(maxIter)
      .setTol(tol)
    if (k > 2) new OneVsRest().setClassifier(svc).setFeaturesCol(svcFeaturesCol)
      .setParallelism(8)
    else svc
  }

  override protected def translate(p: Params, name: String, v: Any): ParamPair[_] = {
    name match {
      case "C"        => val svc = p.asInstanceOf[LinearSVC]; ParamPair(svc.regParam, 1.0 / asDouble(v))
      case "max_iter" => val svc = p.asInstanceOf[LinearSVC]; ParamPair(svc.maxIter, asInt(v))
      case "tol"      => val svc = p.asInstanceOf[LinearSVC]; ParamPair(svc.tol, asDouble(v))
      case "gamma" =>
        if (kernel == "poly") ParamPair(polyStage.gamma, asDouble(v))
        else if (kernel == "sigmoid") ParamPair(nysStage.gamma, asDouble(v))
        else ParamPair(rffStage.gamma, asDouble(v))
      case "degree" => ParamPair(polyStage.degree, asInt(v))
      case "coef0" =>
        if (kernel == "sigmoid") ParamPair(nysStage.coef0, asDouble(v))
        else ParamPair(polyStage.coef0, asDouble(v))
      case other => throw new IllegalArgumentException(s"unsupported search param: $other")
    }
  }

  override def params: Map[String, Any] = Map(
    "C" -> c, "kernel" -> kernel, "gamma" -> gamma, "degree" -> degree,
    "coef0" -> coef0, "max_iter" -> maxIter,
    "scale_features" -> scaleFeatures, "rff_features" -> rffFeatures,
    "probability" -> probability)

  /** Fitted Platt `(A, B)` per binary problem (1 entry binary, k for
    * OneVsRest) when `probability=true`.
    */
  private var plattParams: Array[(Double, Double)] = Array.empty

  /** The fitted binary margin models, in label-index order. */
  private def binSvms: Array[LinearSVCModel] =
    pipelineModel.get.stages.last match {
      case m: LinearSVCModel => Array(m)
      case o: OneVsRestModel => o.models.map(_.asInstanceOf[LinearSVCModel])
      case other => throw new IllegalStateException(s"unexpected stage $other")
    }

  /** Per-row margins `w_i·x + b_i` for every binary problem, as one
    * array column over the kernel-feature vector.
    */
  private def marginsCol(): org.apache.spark.sql.Column = {
    val ws = binSvms.map(_.coefficients.toArray)
    val bs = binSvms.map(_.intercept)
    val f = udf { (v: Vector) =>
      Array.tabulate(ws.length) { i =>
        val w = ws(i); var s = bs(i)
        v.foreachActive((j, x) => s += w(j) * x)
        s
      }.toSeq
    }
    f(col(svcFeaturesCol))
  }

  /** Platt calibration on the TRAINING margins when `probability=true`
    * (sklearn's `SVC(probability=True)` fits the sigmoid at fit time;
    * `sklearn_detectors.py:529`). Runs after every fit path via
    * [[FaultDetector.postFit]]; rows entering the sigmoid fit carry only
    * k margins + k flags, never features ([[Platt]] header).
    */
  override protected def postFit(prep: DataFrame, k: Int): Unit = {
    if (!probability) return
    val stages = pipelineModel.get.stages
    val feats = stages.init.foldLeft(prep)((d, t) => t.transform(d))
    val nProbs = if (k == 2) 1 else k
    val pos = udf { (l: Double) =>
      if (nProbs == 1) Seq(l == 1.0)
      else (0 until nProbs).map(i => l == i.toDouble)
    }
    val spark = prep.sparkSession
    import spark.implicits._
    // Cache the margin rows (k doubles + k booleans each): Platt.fit runs
    // one aggregation pass per Newton iteration plus up to 30 backtracking
    // objective passes — uncached, every pass would re-run the
    // scaler/kernel-map transforms and margin UDF over the training frame.
    val rows = feats
      .select(marginsCol().as("_1"), pos(col("label")).as("_2"))
      .as[(Seq[Double], Seq[Boolean])]
      .cache()
    try plattParams = Platt.fit(rows, nProbs)
    finally rows.unpersist(blocking = false)
  }

  /** Input rows + `proba`, from the Platt-scaled margins. Binary:
    * `[1−p, p]`; multiclass: per-class OvR sigmoids normalized to sum 1
    * (this engine's multiclass SVM is OneVsRest, so probabilities couple
    * the OvR way — sklearn's SVC couples pairwise; same surface, same
    * invariants, different coupling rule, documented in SURVEY §2.6).
    * Refuses when `probability=false`, as the reference raises
    * (`sklearn_detectors.py:771-773`).
    */
  override def predictProba(df: DataFrame, featCol: String): DataFrame = {
    require(probability,
      "Probability estimates are not enabled. Set probability=true")
    require(plattParams.nonEmpty, "Model must be fitted before prediction")
    val ws = binSvms.map(_.coefficients.toArray)
    val bs = binSvms.map(_.intercept)
    val ab = plattParams
    val probaUdf = udf { (v: Vector) =>
      val ps = Array.tabulate(ws.length) { i =>
        val w = ws(i); var s = bs(i)
        v.foreachActive((j, x) => s += w(j) * x)
        Platt.predict(s, ab(i)._1, ab(i)._2)
      }
      if (ps.length == 1) Seq(1.0 - ps(0), ps(0))
      else {
        val tot = ps.sum
        (if (tot > 0) ps.map(_ / tot) else Array.fill(ps.length)(1.0 / ps.length)).toSeq
      }
    }
    // feature-prep stages only — the classifier transform (OvR votes)
    // contributes nothing the margins don't already carry
    val feats = pipelineModel.get.stages.init
      .foldLeft(prepFeatures(df, featCol))((d, t) => t.transform(d))
    feats.withColumn("proba", probaUdf(col(svcFeaturesCol)))
      .drop("features",
        FaultDetector.ScaledCol, FaultDetector.RffCol, FaultDetector.PolyCol,
        FaultDetector.NysCol)
  }
}

/** Shared base of the four boosted-tree detectors (D4–D7): MLlib
  * `GBTClassifier` (binary) wrapped in `OneVsRest` for multiclass — the
  * same substitution SURVEY §2.6 documents for sklearn-GB, XGBoost,
  * LightGBM and CatBoost (regularized boosted trees; library-specific
  * regularizers recorded in `params` but not re-implemented).
  */
abstract class GbtBackedDetector(
    space: Map[String, Seq[Any]], nIter: Int, cvFolds: Int, seed: Long)
  extends FaultDetector(space, nIter, cvFolds, seed) {

  protected def gbt(): GBTClassifier

  /** Fraction held out as the early-stop validation set when enabled. */
  protected def validationFraction: Option[Double] = None

  override protected def trainExtraCol: Option[(String, Column)] =
    validationFraction.map(f => ("__val", rand(randomState) < f))

  override protected def buildClassifier(k: Int): PipelineStage = {
    val g = gbt().setSeed(randomState)
    validationFraction.foreach(_ => g.setValidationIndicatorCol("__val"))
    if (k > 2) new OneVsRest().setClassifier(g) else g
  }

  override protected def translate(p: Params, name: String, v: Any): ParamPair[_] = {
    val g = p.asInstanceOf[GBTClassifier]
    name match {
      case "n_estimators" | "iterations"     => ParamPair(g.maxIter, asInt(v))
      case "learning_rate"                   => ParamPair(g.stepSize, asDouble(v))
      case "max_depth" | "depth"             => ParamPair(g.maxDepth, math.min(asInt(v), 30))
      case "subsample"                       => ParamPair(g.subsamplingRate, asDouble(v))
      case "min_samples_leaf" | "min_child_samples" => ParamPair(g.minInstancesPerNode, asInt(v))
      case "gamma" | "min_split_gain"        => ParamPair(g.minInfoGain, asDouble(v))
      case other => throw new IllegalArgumentException(s"unsupported search param: $other")
    }
  }
}

/** D4 — reference `GradientBoostingFaultDetector`
  * (`detectors/sklearn_detectors.py:818-1163`).
  */
class GradientBoostingFaultDetector(
    nEstimators: Int = 100,
    learningRate: Double = 0.1,
    maxDepth: Int = 3,
    subsample: Double = 1.0,
    minSamplesLeaf: Int = 1,
    randomState: Long = 42L,
    paramSearchSpace: Map[String, Seq[Any]] = Map.empty,
    nIter: Int = 10,
    cvFolds: Int = 5)
  extends GbtBackedDetector(paramSearchSpace, nIter, cvFolds, randomState) {

  override protected def gbt(): GBTClassifier = new GBTClassifier()
    .setMaxIter(nEstimators).setStepSize(learningRate).setMaxDepth(maxDepth)
    .setSubsamplingRate(subsample).setMinInstancesPerNode(minSamplesLeaf)

  override def params: Map[String, Any] = Map(
    "n_estimators" -> nEstimators, "learning_rate" -> learningRate,
    "max_depth" -> maxDepth, "subsample" -> subsample,
    "min_samples_leaf" -> minSamplesLeaf)
}

/** D5 — reference `XGBFaultDetector` (`detectors/xgb_detectors.py:17-374`).
  * Capability-parity wrapper: regularized boosted trees with column
  * subsampling (`colsample_bytree` → `featureSubsetStrategy`), split gain
  * threshold (`gamma` → `minInfoGain`) and optional early stopping on a
  * held-out set. `reg_alpha`/`reg_lambda` are recorded but MLlib GBT has
  * no elastic-net leaf regularizer (documented gap).
  */
class XGBFaultDetector(
    maxDepth: Int = 3,
    learningRate: Double = 0.1,
    nEstimators: Int = 100,
    gamma: Double = 0.0,
    subsample: Double = 1.0,
    colsampleBytree: Double = 1.0,
    regLambda: Double = 1.0,
    randomState: Long = 42L,
    earlyStoppingRounds: Option[Int] = None,
    paramSearchSpace: Map[String, Seq[Any]] = Map.empty,
    nIter: Int = 10,
    cvFolds: Int = 5)
  extends GbtBackedDetector(paramSearchSpace, nIter, cvFolds, randomState) {

  override protected def validationFraction: Option[Double] =
    earlyStoppingRounds.map(_ => 0.1)

  override protected def gbt(): GBTClassifier = new GBTClassifier()
    .setMaxIter(nEstimators).setStepSize(learningRate).setMaxDepth(maxDepth)
    .setMinInfoGain(gamma).setSubsamplingRate(subsample)
    .setFeatureSubsetStrategy(
      if (colsampleBytree >= 1.0) "all" else colsampleBytree.toString)

  override def params: Map[String, Any] = Map(
    "max_depth" -> maxDepth, "learning_rate" -> learningRate,
    "n_estimators" -> nEstimators, "gamma" -> gamma, "subsample" -> subsample,
    "colsample_bytree" -> colsampleBytree, "reg_lambda" -> regLambda,
    "early_stopping_rounds" -> earlyStoppingRounds)
}

/** D6 — reference `LGBMFaultDetector` (`detectors/lgbm_detectors.py:15-364`).
  * The reference's automatic binary↔multiclass objective switch
  * (`:134-138`) is the base class's k>2 OneVsRest wrap. `num_leaves` maps
  * to an equivalent depth (⌈log2(leaves)⌉) when `max_depth` is
  * unlimited (−1).
  */
class LGBMFaultDetector(
    numLeaves: Int = 31,
    maxDepth: Int = -1,
    learningRate: Double = 0.1,
    nEstimators: Int = 100,
    minChildSamples: Int = 20,
    minSplitGain: Double = 0.0,
    subsample: Double = 1.0,
    randomState: Long = 42L,
    earlyStoppingRounds: Option[Int] = None,
    paramSearchSpace: Map[String, Seq[Any]] = Map.empty,
    nIter: Int = 10,
    cvFolds: Int = 5)
  extends GbtBackedDetector(paramSearchSpace, nIter, cvFolds, randomState) {

  override protected def validationFraction: Option[Double] =
    earlyStoppingRounds.map(_ => 0.1)

  private def depth: Int =
    if (maxDepth > 0) math.min(maxDepth, 30)
    else math.max(2, math.ceil(math.log(numLeaves.toDouble) / math.log(2.0)).toInt)

  override protected def gbt(): GBTClassifier = new GBTClassifier()
    .setMaxIter(nEstimators).setStepSize(learningRate).setMaxDepth(depth)
    .setMinInstancesPerNode(minChildSamples).setMinInfoGain(minSplitGain)
    .setSubsamplingRate(subsample)

  override def params: Map[String, Any] = Map(
    "num_leaves" -> numLeaves, "max_depth" -> maxDepth,
    "learning_rate" -> learningRate, "n_estimators" -> nEstimators,
    "min_child_samples" -> minChildSamples, "subsample" -> subsample,
    "early_stopping_rounds" -> earlyStoppingRounds)
}

/** D7 — reference `CatBoostFaultDetector`
  * (`detectors/catboost_detector.py:15-297`). The overfitting detector
  * (`od_type='Iter'`, `od_wait`) maps to GBT validation-set early
  * stopping on a 10% seeded holdout.
  */
class CatBoostFaultDetector(
    iterations: Int = 500,
    learningRate: Double = 0.03,
    depth: Int = 6,
    l2LeafReg: Double = 3.0,
    odType: String = "Iter",
    odWait: Int = 20,
    randomState: Long = 42L,
    earlyStoppingRounds: Option[Int] = None,
    paramSearchSpace: Map[String, Seq[Any]] = Map.empty,
    nIter: Int = 10,
    cvFolds: Int = 5)
  extends GbtBackedDetector(paramSearchSpace, nIter, cvFolds, randomState) {

  override protected def validationFraction: Option[Double] =
    if (earlyStoppingRounds.isDefined || odType == "Iter") Some(0.1) else None

  override protected def gbt(): GBTClassifier = new GBTClassifier()
    .setMaxIter(iterations).setStepSize(learningRate)
    .setMaxDepth(math.min(depth, 30))

  override def params: Map[String, Any] = Map(
    "iterations" -> iterations, "learning_rate" -> learningRate,
    "depth" -> depth, "l2_leaf_reg" -> l2LeafReg, "od_type" -> odType,
    "od_wait" -> odWait, "early_stopping_rounds" -> earlyStoppingRounds)
}

/** D1 as a class surface — reference `KNNFaultDetector`
  * (`detectors/sklearn_detectors.py:19-253`) — delegating to the
  * distributed top-k plan in [[Knn]] (lazy learner: `fit` just pins the
  * training frame).
  */
class KNNFaultDetector(
    nNeighbors: Int = 5,
    weights: String = "uniform",
    p: Double = 2.0) extends Serializable {
  require(weights == "uniform" || weights == "distance",
    s"weights must be uniform|distance, got $weights")
  private var train: Option[(DataFrame, String, String, String)] = None

  def fit(df: DataFrame, featCol: String, labelCol: String, idCol: String): this.type = {
    train = Some((df, featCol, labelCol, idCol)); this
  }

  /** testIdCol, pred_label, n_votes per test row (uniform majority vote —
    * the reference default path).
    */
  def predict(test: DataFrame, featCol: String, idCol: String): DataFrame = {
    val (tr, f, l, tid) = train.getOrElse(
      throw new IllegalStateException("Model must be fitted before prediction"))
    if (weights == "uniform" && p == 2.0)
      Knn.classify(tr, test, f, l, idCol, tid, nNeighbors)
    else
      Knn.classifyWeighted(tr, test, f, l, idCol, tid, nNeighbors, p, weights)
  }

  /** testIdCol, label, proba per (test row, train class) — sklearn
    * `predict_proba` vote fractions (`sklearn_detectors.py:206-219`).
    */
  def predictProba(test: DataFrame, featCol: String, idCol: String): DataFrame = {
    val (tr, f, l, tid) = train.getOrElse(
      throw new IllegalStateException("Model must be fitted before prediction"))
    Knn.predictProba(tr, test, f, l, idCol, tid, nNeighbors, p, weights)
  }

  def score(test: DataFrame, featCol: String, labelCol: String, idCol: String): Double = {
    val pred = predict(test, featCol, idCol)
    pred.join(test.select(col(idCol), col(labelCol).cast("long").as("__y")), idCol)
      .select(avg(when(col("pred_label") === col("__y"), 1d).otherwise(0d)).as("acc"))
      .head().getDouble(0)
  }
}
