package graft

import org.apache.spark.sql.functions._

import graft.text.{Quality, QualityClassifier}

/** Model-based curation filters: the fastText-style classifier on a
  * separable corpus, and the deflate compression-ratio signal.
  */
class ClassifierSpec extends SparkSpec {

  test("QualityClassifier: perfect separation on a vocabulary-disjoint corpus") {
    import spark.implicits._
    // two classes with disjoint vocabularies — any working linear
    // classifier over hashed bags must separate them exactly
    val good = Seq.tabulate(30)(i =>
      (s"clean prose sentence number $i with varied informative words", "keep"))
    val bad = Seq.tabulate(30)(i =>
      (s"spam spam buy now click here offer $i free free", "drop"))
    val df = scala.util.Random.shuffle(good ++ bad).toDF("text", "label")
    val m = QualityClassifier.train(df, "text", "label",
      dim = 1 << 10, maxIter = 30)
    assert(m.labels.sorted.toSeq == Seq("drop", "keep"))
    val pred = QualityClassifier.predict(m, df, "text")
    val wrong = pred.filter(col("label") =!= col("predicted_label")).count()
    assert(wrong == 0, s"$wrong misclassified on a separable corpus")
    // confidence is a probability and high on separable data
    val minConf = pred.agg(min(col("confidence"))).head().getDouble(0)
    assert(minConf > 0.5 && minConf <= 1.0)
    // confusion matrix sums to the corpus and is diagonal
    val conf = QualityClassifier.confusion(m, df, "text", "label")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.map(_._3).sum == 60L)
    assert(conf.forall { case (l, p, _) => l == p })
  }

  test("compressionRatio: repetition compresses, ordering sane, empty is 1.0") {
    import spark.implicits._
    val rep = Seq.fill(200)("spam").mkString(" ")
    val varied = Seq.tabulate(200)(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val df = Seq((1L, rep), (2L, varied), (3L, "")).toDF("id", "text")
    val out = df.withColumn("r", Quality.compressionRatio(col("text")))
      .orderBy("id").collect().map(_.getAs[Double]("r"))
    assert(out(0) < 0.1, s"repetitive ratio ${out(0)}")
    assert(out(1) > 2 * out(0), s"varied ${out(1)} vs repetitive ${out(0)}")
    assert(out(1) < 1.0, "text still compresses below 1")
    assert(out(2) == 1.0, "empty text scores 1.0")
    // deterministic across evaluations
    val again = df.withColumn("r", Quality.compressionRatio(col("text")))
      .orderBy("id").collect().map(_.getAs[Double]("r"))
    assert(out.toSeq == again.toSeq)
  }
}
