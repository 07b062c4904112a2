package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml._

/** D2–D8 detector suite on the FIXTURES `clf-blobs` scenario: 1000×5,
  * 3 separable classes (class c centered at 4c per feature, unit-ish
  * deterministic noise from the hash-RNG), 80/20 split, seed 42.
  * Quality floor: accuracy well above 1/3 (reference
  * `examples/detectors.ipynb` demonstrates the same shape).
  */
class DetectorsSpec extends SparkSpec {

  /** Deterministic blobs: no RNG state, every run identical. */
  lazy val blobs: DataFrame = {
    import spark.implicits._
    val rows = (0 until 1000).map { i =>
      val cls = i % 3
      // orthogonal class centers (class c high in features j ≡ c mod 3) so
      // the scenario is separable for one-vs-rest LINEAR boundaries too
      val feat = (0 until 5).map { j =>
        (if (j % 3 == cls) 4.0 else 0.0) + Rff.gaussian(42L, i.toLong, j.toLong)
      }.toArray
      (i.toLong, feat, cls)
    }
    rows.toDF("id", "feat", "fault_class")
  }
  lazy val trainDf: DataFrame = blobs.filter(col("id") % 5 =!= 0).cache()
  lazy val testDf: DataFrame = blobs.filter(col("id") % 5 === 0).cache()

  private def checkDetector(det: FaultDetector, floor: Double = 0.9): Double = {
    det.fit(trainDf, "feat", "fault_class")
    val acc = det.score(testDf, "feat", "fault_class")
    assert(acc >= floor, s"${det.getClass.getSimpleName} accuracy $acc < $floor")
    acc
  }

  test("D2 random forest: fit/predict/score + importances") {
    val det = new RandomForestFaultDetector(nEstimators = 20, maxDepth = Some(5))
    checkDetector(det)
    val imp = det.featureImportances.get
    assert(math.abs(imp.toArray.sum - 1.0) < 1e-6)
    assert(imp.size == 5)
    // proba rows sum to 1 (FIXTURES clf-rand invariant)
    val proba = det.predictProba(testDf, "feat")
      .select(aggregate(col("proba"), lit(0d), (a, x) => a + x).as("s"))
      .collect().map(_.getDouble(0))
    proba.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("fitted-tree replay semantics: Scala walk of the exported trees = model predictions") {
    import org.apache.spark.ml.classification.{GBTClassificationModel, RandomForestClassificationModel}
    import org.apache.spark.ml.graftbridge.TreeBridge
    import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
    // the exact rules TreeSql's SQL encodes, replayed in Scala against the
    // real models — pins the bridge + vote/margin semantics independently
    // of DuckDB (the driver's oracle covers the SQL rendering itself)
    def walk(n: Node, feat: Array[Double]): LeafNode = n match {
      case l: LeafNode => l
      case i: InternalNode =>
        val s = i.split.asInstanceOf[ContinuousSplit]
        walk(if (feat(s.featureIndex) <= s.threshold) i.leftChild else i.rightChild, feat)
    }
    val testRows = testDf.select("id", "feat", "fault_class").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap

    val rf = new RandomForestFaultDetector(nEstimators = 20, maxDepth = Some(5))
    rf.fit(trainDf, "feat", "fault_class")
    val rfm = rf.fittedClassifierStage.asInstanceOf[RandomForestClassificationModel]
    val rfPred = rf.predict(testDf, "feat").select("id", "pred_label")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    testRows.foreach { case (id, feat) =>
      val votes = Array.ofDim[Double](rfm.numClasses)
      rfm.trees.foreach { t =>
        val stats = TreeBridge.classCounts(walk(t.rootNode, feat))
        val total = stats.sum
        var c = 0
        while (c < votes.length) { votes(c) += stats(c) / total; c += 1 }
      }
      val arg = votes.indices.maxBy(c => (votes(c), -c))
      assert(rf.labelDomain(arg) == rfPred(id), s"RF replay diverges at id=$id")
    }
    // SQL rendering sanity: every tree present, vote sum spans all 20
    val sql = TreeSql.rfConfusionReplaySql(rfm, rf.labelDomain, "vec_id % 5 = 0")
    assert(sql.contains("AS t19") && sql.contains("t19[c]"))

    val gbt = new GradientBoostingFaultDetector(nEstimators = 10, maxDepth = 3)
    gbt.fit(trainDf.filter(col("fault_class") < 2), "feat", "fault_class")
    val gm = gbt.fittedClassifierStage.asInstanceOf[GBTClassificationModel]
    val binTest = testDf.filter(col("fault_class") < 2)
    val gbtPred = gbt.predict(binTest, "feat").select("id", "pred_label")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    gbtPred.keys.foreach { id =>
      val margin = gm.trees.zip(gm.treeWeights)
        .map { case (t, w) => walk(t.rootNode, testRows(id)).prediction * w }.sum
      val want = gbt.labelDomain(if (margin > 0) 1 else 0)
      assert(want == gbtPred(id), s"GBT replay diverges at id=$id")
    }
  }

  test("D3 SVM (RBF via random Fourier features, OneVsRest multiclass)") {
    val det = new SVMFaultDetector(maxIter = 30)
    checkDetector(det)
    // predict_proba must refuse (probability=False parity)
    intercept[IllegalArgumentException] { det.predictProba(testDf, "feat") }
  }

  test("D3 SVM linear kernel") {
    val det = new SVMFaultDetector(kernel = "linear", maxIter = 30)
    checkDetector(det)
  }

  test("D3 SVM probability=true: Platt-scaled predictProba parity invariants") {
    val det = new SVMFaultDetector(kernel = "linear", maxIter = 30,
      probability = true)
    checkDetector(det)
    val rows = det.predictProba(testDf, "feat")
      .select(col("fault_class"), col("proba")).collect()
    rows.foreach { r =>
      val p = r.getSeq[Double](1)
      assert(p.length == 3)
      assert(p.forall(x => x >= 0.0 && x <= 1.0))
      assert(math.abs(p.sum - 1.0) < 1e-9, s"proba sums to ${p.sum}")
    }
    // calibration quality on the separable FIXTURES blobs: argmax(proba)
    // must match the true class for the vast majority of test rows
    // (sklearn's Platt-calibrated SVC does the same on this scenario)
    val agree = rows.count { r =>
      val p = r.getSeq[Double](1)
      p.indexOf(p.max) == r.getInt(0)
    }
    assert(agree >= (rows.length * 0.9).toInt, s"argmax agree $agree/${rows.length}")
    // and the true class's probability should be confidently high on average
    val avgTrue = rows.map(r => r.getSeq[Double](1)(r.getInt(0))).sum / rows.length
    assert(avgTrue > 0.7, s"avg true-class probability $avgTrue")
  }

  test("D3 poly kernel map is exact: phi(x)·phi(y) = (g·x·y + r)^d") {
    for (degree <- 1 to 4; coef0 <- Seq(0.0, 1.0, 2.5)) {
      val (exps, coefs) = Poly.terms(3, degree, 0.7, coef0)
      val x = Array(0.3, -1.2, 2.1)
      val y = Array(-0.8, 0.5, 1.4)
      def phi(v: Array[Double]): Array[Double] =
        coefs.indices.map { t =>
          coefs(t) * exps(t).zipWithIndex.map { case (e, j) =>
            math.pow(v(j), e.toDouble) }.product
        }.toArray
      val got = phi(x).zip(phi(y)).map { case (a, b) => a * b }.sum
      val xy = x.zip(y).map { case (a, b) => a * b }.sum
      val want = math.pow(0.7 * xy + coef0, degree.toDouble)
      assert(math.abs(got - want) < 1e-9 * math.max(1.0, math.abs(want)),
        s"degree=$degree coef0=$coef0: $got != $want")
    }
  }

  test("D3 SVM poly kernel separates a ring that the linear kernel cannot") {
    import spark.implicits._
    // 2-D ring scenario: label = 1 inside radius 1.5, 0 outside (radius 2-3)
    // — radially symmetric, so no linear boundary beats ~coin flip, but the
    // degree-2 expansion contains x²+y² and separates it perfectly
    val ring = (0 until 400).map { i =>
      val inner = i % 2 == 0
      val r = if (inner) 0.5 + Rff.uniform(7L, i.toLong, 0L)
              else 2.0 + Rff.uniform(7L, i.toLong, 0L)
      val th = Rff.uniform(7L, i.toLong, 1L) * 2 * math.Pi
      (i.toLong, Array(r * math.cos(th), r * math.sin(th)), if (inner) 1 else 0)
    }.toDF("id", "feat", "fault_class")
    val train = ring.filter(col("id") % 5 =!= 0)
    val test = ring.filter(col("id") % 5 === 0)
    val poly = new SVMFaultDetector(kernel = "poly", degree = 2, coef0 = 1.0,
      maxIter = 50)
    poly.fit(train, "feat", "fault_class")
    assert(poly.score(test, "feat", "fault_class") >= 0.95)
    val lin = new SVMFaultDetector(kernel = "linear", maxIter = 50)
    lin.fit(train, "feat", "fault_class")
    assert(lin.score(test, "feat", "fault_class") <= 0.75)
  }

  test("D3 poly expansion refuses intractable dimensionality") {
    val e = intercept[IllegalArgumentException] { Poly.terms(100, 3, 1.0, 1.0) }
    assert(e.getMessage.contains("rbf"))
  }

  test("D3 poly map fails fast on the driver when width metadata is present") {
    import spark.implicits._
    import org.apache.spark.ml.attribute.AttributeGroup
    import org.apache.spark.ml.linalg.Vectors
    // dim=100, degree=3 → C(103,3) = 176851 > MaxExpandedTerms; the
    // AttributeGroup metadata lets transform() refuse before any job runs
    val df = Seq(Tuple1(Vectors.dense(Array.fill(100)(0.0)))).toDF("feat")
      .select(col("feat").as("feat", new AttributeGroup("feat", 100).toMetadata()))
    val e = intercept[IllegalArgumentException] {
      new PolynomialKernelMap().setInputCol("feat").setOutputCol("phi")
        .setDegree(3).transform(df)
    }
    assert(e.getMessage.contains("MaxExpandedTerms"))
    assert(Poly.expandedTerms(100, 3) == 176851L)
  }

  test("D3 Jacobi symEig: A·vᵢ = λᵢ·vᵢ on an indefinite symmetric matrix") {
    val n = 8
    // deterministic symmetric matrix with mixed-sign spectrum
    val a = Array.tabulate(n, n)((i, j) =>
      Rff.gaussian(11L, math.min(i, j).toLong, math.max(i, j).toLong))
    val (evals, v) = Nystroem.symEig(a)
    assert(evals.exists(_ > 0) && evals.exists(_ < 0), "spectrum should be indefinite")
    for (c <- 0 until n) {
      val av = (0 until n).map(r => (0 until n).map(k => a(r)(k) * v(k)(c)).sum)
      av.zipWithIndex.foreach { case (x, r) =>
        assert(math.abs(x - evals(c) * v(r)(c)) < 1e-8,
          s"eigenpair $c row $r: $x vs ${evals(c) * v(r)(c)}")
      }
      // columns orthonormal
      val nrm = (0 until n).map(r => v(r)(c) * v(r)(c)).sum
      assert(math.abs(nrm - 1.0) < 1e-10)
    }
  }

  test("D3 Nystroem with m = n reproduces a PSD kernel exactly on the sample") {
    import spark.implicits._
    val pts = (0 until 20).map { i =>
      (i.toLong, org.apache.spark.ml.linalg.Vectors.dense(
        Array.tabulate(3)(j => Rff.gaussian(5L, i.toLong, j.toLong))))
    }.toDF("id", "v")
    val model = new NystroemKernelMap().setKernel("rbf").setGamma(0.5)
      .setNumComponents(20).setSeed(9L).setInputCol("v").setOutputCol("phi")
      .fit(pts)
    val out = model.transform(pts).select("v", "phi").collect()
      .map(r => (r.getAs[org.apache.spark.ml.linalg.Vector](0).toArray,
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray))
    // with every sample point a landmark, phi(x)·phi(y) = k(x,y) exactly
    for ((xa, pa) <- out; (xb, pb) <- out) {
      val want = {
        var s = 0.0
        for (j <- xa.indices) { val d = xa(j) - xb(j); s += d * d }
        math.exp(-0.5 * s)
      }
      val got = pa.zip(pb).map { case (p, q) => p * q }.sum
      assert(math.abs(got - want) < 1e-6, s"$got vs $want")
    }
  }

  test("D3 SVM sigmoid kernel (Nystroem landmark map, OneVsRest multiclass)") {
    // sklearn parity surface: kernel='sigmoid' must train and classify;
    // gamma='scale' + coef0=0 on standardized blobs behaves near-linear,
    // so the blobs floor applies
    val det = new SVMFaultDetector(kernel = "sigmoid", maxIter = 30)
    checkDetector(det)
  }

  test("D4 gradient boosting (OneVsRest over binary GBT)") {
    val det = new GradientBoostingFaultDetector(nEstimators = 10, maxDepth = 3)
    checkDetector(det)
    val imp = det.featureImportances.get
    assert(imp.size == 5 && math.abs(imp.toArray.sum - 1.0) < 1e-6)
  }

  test("D4 binary classification uses plain GBT with probabilities") {
    val bin = blobs.filter(col("fault_class") < 2)
    val det = new GradientBoostingFaultDetector(nEstimators = 10)
    det.fit(bin.filter(col("id") % 5 =!= 0), "feat", "fault_class")
    val acc = det.score(bin.filter(col("id") % 5 === 0), "feat", "fault_class")
    assert(acc >= 0.95, s"binary GBT accuracy $acc")
    val proba = det.predictProba(bin.filter(col("id") % 5 === 0), "feat")
    assert(proba.select(size(col("proba"))).head().getInt(0) == 2)
  }

  test("D5/D6/D7 boosted-tree wrappers") {
    checkDetector(new XGBFaultDetector(nEstimators = 10))
    checkDetector(new LGBMFaultDetector(nEstimators = 10))
    checkDetector(new CatBoostFaultDetector(iterations = 10, learningRate = 0.3))
  }

  test("predict maps back to original (non-contiguous) label codes") {
    // labels {1, 5, 9}: sklearn LabelEncoder semantics (sorted unique)
    val shifted = blobs.withColumn("fault_class", col("fault_class") * 4 + 1)
    val det = new RandomForestFaultDetector(nEstimators = 10, maxDepth = Some(5))
    det.fit(shifted.filter(col("id") % 5 =!= 0), "feat", "fault_class")
    val preds = det.predict(shifted.filter(col("id") % 5 === 0), "feat")
      .select(collect_set(col("pred_label"))).head().getSeq[Double](0).toSet
    assert(preds.subsetOf(Set(1d, 5d, 9d)), s"unexpected labels $preds")
    assert(det.score(shifted.filter(col("id") % 5 === 0), "feat", "fault_class") >= 0.9)
  }

  test("D8 random-search CV finds params in space and reports accuracy") {
    val det = new RandomForestFaultDetector(
      paramSearchSpace = Map(
        "n_estimators" -> Seq(5, 15),
        "max_depth" -> Seq(2, 6)),
      nIter = 3, cvFolds = 3, randomState = 42L)
    det.fit(trainDf, "feat", "fault_class", optimize = true)
    val bp = det.bestParams
    assert(bp.keySet == Set("n_estimators", "max_depth"))
    val n = bp("n_estimators").asInstanceOf[Int]
    val d = bp("max_depth").asInstanceOf[Int]
    assert(n >= 5 && n <= 15 && d >= 2 && d <= 6)
    assert(det.cvAccuracy.get >= 0.9, s"cv accuracy ${det.cvAccuracy}")
    assert(det.score(testDf, "feat", "fault_class") >= 0.9)
    assert(det.getParams == bp)
  }

  test("D8 sampling is seeded and reproducible") {
    val space = Map[String, Seq[Any]](
      "a" -> Seq(1, 10), "b" -> Seq(0.0, 1.0), "c" -> Seq("x", "y"))
    val p1 = FaultDetector.samplePoints(space, 5, 7L)
    val p2 = FaultDetector.samplePoints(space, 5, 7L)
    assert(p1 == p2)
    p1.foreach { pt =>
      val a = pt("a").asInstanceOf[Int]
      assert(a >= 1 && a <= 10)
      val b = pt("b").asInstanceOf[Double]
      assert(b >= 0.0 && b <= 1.0)
      assert(Set("x", "y")(pt("c").asInstanceOf[String]))
    }
  }

  test("D8 declared C/gamma bounds draw log-uniformly, seeded; scoped per detector") {
    val space = Map[String, Seq[Any]](
      "C" -> Seq(1e-3, 1e3), "gamma" -> Seq(1e-4, 1e0), "coef0" -> Seq(0.0, 1.0))
    val lu = Set("C", "gamma") // the SVM's logUniformParams
    val p1 = FaultDetector.samplePoints(space, 200, 11L, lu)
    assert(p1 == FaultDetector.samplePoints(space, 200, 11L, lu))
    val cs = p1.map(_("C").asInstanceOf[Double])
    assert(cs.forall(c => c >= 1e-3 && c <= 1e3))
    // log-uniform ⇒ ~half the draws land in each log-half [1e-3,1] / [1,1e3]
    // (a uniform draw would put ~99.9% above 1)
    val below = cs.count(_ < 1.0)
    assert(below > 60 && below < 140, s"C draws below 1: $below / 200")
    val gs = p1.map(_("gamma").asInstanceOf[Double])
    assert(gs.forall(g => g >= 1e-4 && g <= 1.0))
    val gBelow = gs.count(_ < 1e-2)
    assert(gBelow > 60 && gBelow < 140, s"gamma draws below 1e-2: $gBelow / 200")
    // non-declared doubles stay uniform
    val co = p1.map(_("coef0").asInstanceOf[Double])
    assert(co.count(_ < 0.5) > 60 && co.count(_ < 0.5) < 140)
    // without a declared set (every non-SVM detector) the SAME space
    // draws gamma uniformly — the reference's XGB search draws its gamma
    // (min split gain) uniformly (xgb_detectors.py:163-166)
    val pTree = FaultDetector.samplePoints(space, 200, 11L)
    val gTree = pTree.map(_("gamma").asInstanceOf[Double])
    assert(gTree.count(_ < 1e-2) < 10,
      "undeclared gamma must draw uniformly (≈1% below 1e-2)")
  }

  test("D8b successive halving finds params in space, deterministic under seed") {
    def run(): (Map[String, Any], Option[Double], Double) = {
      val det = new RandomForestFaultDetector(
        paramSearchSpace = Map(
          "n_estimators" -> Seq(5, 20),
          "max_depth" -> Seq(2, 8)),
        nIter = 4, randomState = 42L)
      det.fitSuccessiveHalving(trainDf, "feat", "fault_class")
      (det.bestParams, det.cvAccuracy, det.score(testDf, "feat", "fault_class"))
    }
    val (params, cvAcc, acc) = run()
    // best point comes from the sampled space
    assert(params.keySet == Set("n_estimators", "max_depth"))
    val ne = params("n_estimators").asInstanceOf[Int]
    val md = params("max_depth").asInstanceOf[Int]
    assert(ne >= 5 && ne <= 20 && md >= 2 && md <= 8)
    assert(cvAcc.exists(a => a > 0.5 && a <= 1.0))
    assert(acc >= 0.9)
    // deterministic: same seed → same winner
    val (params2, _, _) = run()
    assert(params2 == params)
  }

  test("D8c TPE proposals concentrate on the good region") {
    val space = Map[String, Seq[Any]]("x" -> Seq(0, 100))
    // scores: high near x=80, low near x=10
    val observed = (0 until 10).map { i =>
      val v: Any = if (i < 5) 78 + i else 8 + i
      (Map[String, Any]("x" -> v), if (i < 5) 0.9 + 0.01 * i else 0.2)
    }
    val props = (10 until 30).map(t =>
      Tpe.propose(space, observed, t, 42L)("x").asInstanceOf[Int])
    props.foreach(p => assert(p >= 0 && p <= 100))
    val mean = props.sum.toDouble / props.size
    assert(mean > 55, s"proposals should cluster near the good region, mean=$mean")
    // deterministic under seed
    assert(props == (10 until 30).map(t =>
      Tpe.propose(space, observed, t, 42L)("x").asInstanceOf[Int]))
  }

  test("D8c TPE search finds params in space, deterministic under seed") {
    def run(): (Map[String, Any], Double) = {
      val det = new RandomForestFaultDetector(
        paramSearchSpace = Map(
          "n_estimators" -> Seq(5, 20),
          "max_depth" -> Seq(2, 8)),
        nIter = 6, randomState = 42L)
      det.fitTpe(trainDf, "feat", "fault_class", nStartup = 3)
      (det.bestParams, det.score(testDf, "feat", "fault_class"))
    }
    val (params, acc) = run()
    assert(params.keySet == Set("n_estimators", "max_depth"))
    val ne = params("n_estimators").asInstanceOf[Int]
    val md = params("max_depth").asInstanceOf[Int]
    assert(ne >= 5 && ne <= 20 && md >= 2 && md <= 8)
    assert(acc >= 0.9)
    val (params2, _) = run()
    assert(params2 == params)
  }

  test("D1 KNN class surface") {
    val det = new KNNFaultDetector(nNeighbors = 5)
    det.fit(trainDf, "feat", "fault_class", "id")
    assert(det.score(testDf, "feat", "fault_class", "id") >= 0.9)
  }

  test("D1 KNN distance-weighted class surface tracks the uniform accuracy") {
    val det = new KNNFaultDetector(nNeighbors = 5, weights = "distance", p = 1.0)
    det.fit(trainDf, "feat", "fault_class", "id")
    assert(det.score(testDf, "feat", "fault_class", "id") >= 0.9)
  }

  /** Tiny 1-D golden scenario for the full sklearn KNN surface. */
  private def knnGolden = {
    import spark.implicits._
    val train = Seq(
      (1L, Array(0.0), 0), (2L, Array(1.0), 1),
      (3L, Array(3.0), 1), (4L, Array(7.0), 0))
      .toDF("id", "feat", "lbl")
    (train, (q: Double) => Seq((100L, Array(q))).toDF("qid", "feat"))
  }

  test("D1 KNN minkowski p=1 + distance weights: hand-computed golden") {
    val (train, testAt) = knnGolden
    // q=2: d1 = [2(l0), 1(l1), 1(l1), 5(l0)]; top3 = ids 2,3 (d=1), 1 (d=2)
    // weights 1, 1, 0.5 → class1 = 2.0, class0 = 0.5
    val out = Knn.classifyWeighted(train, testAt(2.0), "feat", "lbl",
      "qid", "id", k = 3, p = 1.0, weights = "distance").head()
    assert(out.getAs[Long]("pred_label") == 1L)
    assert(math.abs(out.getAs[Double]("vote_weight") - 2.0) < 1e-12)
  }

  test("D1 KNN zero-distance rule: exact match takes all the weight") {
    val (train, testAt) = knnGolden
    // q=1: distances 1, 0, 2, 6 — sklearn rule: zero-distance neighbours
    // get weight 1, all others 0
    val out = Knn.classifyWeighted(train, testAt(1.0), "feat", "lbl",
      "qid", "id", k = 3, p = 1.0, weights = "distance").head()
    assert(out.getAs[Long]("pred_label") == 1L)
    assert(out.getAs[Double]("vote_weight") == 1.0)
    val proba = Knn.predictProba(train, testAt(1.0), "feat", "lbl",
      "qid", "id", k = 3, p = 1.0, weights = "distance")
      .orderBy("label").collect()
    assert(proba.map(_.getAs[Long]("label")).toSeq == Seq(0L, 1L))
    assert(proba.map(_.getAs[Double]("proba")).toSeq == Seq(0.0, 1.0))
  }

  test("D1 KNN broadcast guard fails fast past maxTestRows, passes under it") {
    import spark.implicits._
    val (train, _) = knnGolden
    val bigTest = (100L to 110L).map(i => (i, Array(i.toDouble))).toDF("qid", "feat")
    val e = intercept[IllegalArgumentException] {
      Knn.classifyWeighted(train, bigTest, "feat", "lbl",
        "qid", "id", k = 3, maxTestRows = 5L)
    }
    assert(e.getMessage.contains("cosineTopKLsh"))
    // same call under the ceiling still answers (guard is size-only)
    val ok = Knn.classifyWeighted(train, bigTest, "feat", "lbl",
      "qid", "id", k = 3, maxTestRows = 50L)
    assert(ok.count() == 11)
  }

  test("D1 KNN predict_proba uniform: vote fractions over label domain") {
    val (train, testAt) = knnGolden
    // q=2, p=2: d2 = [4, 1, 1, 25]; top3 = ids 2,3 (l1), 1 (l0)
    val proba = Knn.predictProba(train, testAt(2.0), "feat", "lbl",
      "qid", "id", k = 3, p = 2.0, weights = "uniform")
      .orderBy("label").collect()
    val got = proba.map(r => r.getAs[Long]("label") -> r.getAs[Double]("proba")).toMap
    assert(math.abs(got(0L) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(1L) - 2.0 / 3) < 1e-12)
  }
}
