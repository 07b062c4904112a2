package graft.ml

import org.apache.spark.ml.classification.{GBTClassificationModel, RandomForestClassificationModel}
import org.apache.spark.ml.graftbridge.TreeBridge
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}

/** Fitted-tree → ANSI-SQL export: the x39/x40 fitted-state oracle device
  * extended from centroid/codebook literals to whole tree ensembles. A
  * fitted forest is bounded driver state (20 trees × ≤2^5 leaves here),
  * so its exact decision function is replayable in DuckDB as nested CASE
  * expressions over the feature array — which upgrades the D2/D4–D7
  * detector queries from rows-only to FULL hash-checked oracles: any
  * drift in split thresholds, leaf stats, vote normalization, label
  * decoding, or the test-split plumbing breaks the hash.
  *
  * Vote arithmetic mirrors Spark exactly:
  *  - RF (`RandomForestClassificationModel.predictRaw`): per tree the
  *    reached leaf's class counts normalized by their sum, accumulated
  *    over trees IN ORDER (`votes(i) += counts(i)/total`), argmax with
  *    first-max (lowest class index) tie-break. The replay bakes
  *    `counts(i)/total` as literals (computed with the same
  *    left-associated `Array.sum`) and sums `t0[c] + t1[c] + …` —
  *    left-associated like Spark's loop, so the doubles are identical,
  *    not merely close; the tie-break is `ORDER BY vote DESC, c ASC`.
  *  - GBT (`GBTClassificationModel.predict`, binary): leaf predictions
  *    dotted with `treeWeights` sequentially, class 1 iff margin > 0.
  *
  * Only continuous splits occur here (all features are embedding
  * coordinates); a categorical split fails fast rather than replaying
  * wrong.
  */
object TreeSql {

  /** Nested-CASE SQL for one tree: `leaf` renders the terminal value,
    * `feat` renders a 0-based feature index as a SQL expression (array
    * subscript or a named lag column).
    */
  private def caseSql(node: Node, feat: Int => String, leaf: LeafNode => String): String =
    node match {
      case l: LeafNode => leaf(l)
      case n: InternalNode =>
        val cond = n.split match {
          case c: ContinuousSplit => s"${feat(c.featureIndex)} <= ${c.threshold}"
          case other => throw new IllegalArgumentException(
            s"only continuous splits are replayable, got ${other.getClass.getSimpleName}")
        }
        s"(CASE WHEN $cond THEN ${caseSql(n.leftChild, feat, leaf)}" +
          s" ELSE ${caseSql(n.rightChild, feat, leaf)} END)"
    }

  private def arrayFeat(v: String): Int => String = i => s"$v[${i + 1}]"

  /** A leaf's normalized class distribution — exactly the per-tree vote
    * RF's predictRaw adds (`stats(i) / stats.sum`, both computed in the
    * same double arithmetic Spark uses at predict time).
    */
  private def leafProbs(l: LeafNode): Array[Double] = {
    val stats = TreeBridge.classCounts(l)
    val total = stats.sum
    stats.map(_ / total)
  }

  /** Confusion-matrix replay for an RF detector on the `embeddings`
    * table: `testWhere` reproduces the query's test split, `labels` is
    * the detector's sorted label domain (index ↔ class).
    */
  def rfConfusionReplaySql(
      model: RandomForestClassificationModel,
      labels: Array[Double],
      testWhere: String): String = {
    val k = model.numClasses
    require(labels.length == k, s"label domain ${labels.length} != numClasses $k")
    val treeCols = model.trees.zipWithIndex.map { case (t, i) =>
      val sql = caseSql(t.rootNode, arrayFeat("v"),
        l => leafProbs(l).mkString("[", ", ", "]::DOUBLE[]"))
      s"$sql AS t$i"
    }.mkString(",\n          ")
    val voteSum = model.trees.indices.map(i => s"t$i[c]").mkString(" + ")
    val labelList = labels.mkString("[", ", ", "]::DOUBLE[]")
    s"""
        WITH e AS (
          SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE $testWhere
        ), t AS (
          SELECT vec_id, label,
          $treeCols
          FROM e
        ), s AS (
          SELECT vec_id, label, cls.c AS c, $voteSum AS vote
          FROM t CROSS JOIN (SELECT unnest(range(1, ${k + 1})) AS c) cls
        ), p AS (
          SELECT label, c FROM (
            SELECT label, c,
              row_number() OVER (PARTITION BY vec_id ORDER BY vote DESC, c ASC) AS rn
            FROM s) WHERE rn = 1
        )
        SELECT label, CAST(($labelList)[c] AS INT) AS pred_label, count(*) AS n
        FROM p GROUP BY 1, 2
    """.stripMargin.trim
  }

  /** Confusion-matrix replay for a binary GBT detector: margin =
    * Σ leafPrediction·treeWeight (sequential, like the BLAS dot), class
    * `labels(1)` iff margin > 0 — `GBTClassificationModel.predict`'s
    * threshold-free fast path.
    */
  def gbtConfusionReplaySql(
      model: GBTClassificationModel,
      labels: Array[Double],
      testWhere: String): String = {
    require(labels.length == 2, s"binary GBT expected, labels: ${labels.length}")
    val margin = model.trees.zip(model.treeWeights).map { case (t, w) =>
      s"(${caseSql(t.rootNode, arrayFeat("v"), l => l.prediction.toString)}) * $w"
    }.mkString("\n            + ")
    s"""
        WITH e AS (
          SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE $testWhere
        ), m AS (
          SELECT label,
            $margin AS margin
          FROM e
        )
        SELECT label,
          CAST(CASE WHEN margin > 0 THEN ${labels(1)} ELSE ${labels(0)} END AS INT) AS pred_label,
          count(*) AS n
        FROM m GROUP BY 1, 2
    """.stripMargin.trim
  }

  /** Scalar prediction expression for a fitted regression forest —
    * `RandomForestRegressionModel.predict` is the plain mean of leaf
    * predictions (summed in tree order, divided by numTrees). `feat`
    * renders a 0-based feature index (e.g. `i => s"x$$i"` for the lag
    * columns a VectorAssembler packed in order).
    */
  def rfRegressionPredictSql(
      model: org.apache.spark.ml.regression.RandomForestRegressionModel,
      feat: Int => String): String = {
    val sum = model.trees
      .map(t => caseSql(t.rootNode, feat, l => l.prediction.toString))
      .mkString("\n            + ")
    s"($sum) / ${model.getNumTrees}.0"
  }
}
