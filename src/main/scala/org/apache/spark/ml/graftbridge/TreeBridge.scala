package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.tree.Node

/** Minimal `private[ml]` bridge for the fitted-tree replay oracles
  * (graft.ml.TreeSql): a leaf's class-count statistics are what
  * `RandomForestClassificationModel.predictRaw` normalizes into that
  * tree's vote, but `Node.impurityStats` (and the `ImpurityCalculator`
  * type itself) sit behind `private[ml]`/`private[spark]`. Same pattern
  * as `org.apache.spark.sql.graftbridge.ColumnBridge`.
  */
object TreeBridge {
  /** The per-class training counts recorded at `n` (a fitted leaf). */
  def classCounts(n: Node): Array[Double] = n.impurityStats.stats.clone()
}
