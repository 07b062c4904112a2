package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Scored, TopKAgg}

/** Exact k-nearest-neighbour classification as a top-k-per-group query
  * (reference D1, `fdi_flow/detectors/sklearn_detectors.py:19-253`).
  *
  * Plan shape: broadcast the (small) test side against the train side,
  * compute the distance as a codegen'd higher-order-function expression
  * over the embedding arrays, then reduce to k candidates per test row
  * with the bounded [[graft.functions.TopKAgg]] — partial (map-side)
  * aggregation keeps at most k rows per (partition, test row), so the
  * train side never shuffles its full cross product; only `k·P·|test|`
  * candidate rows reach the exchange, and the vote aggregate downstream
  * is tiny. Beyond exact scale, swap in the LSH variant
  * ([[graft.similarity.Ann]]).
  */
object Knn {

  /** Σ (a−b)² over two float/double array columns, computed in double,
    * sequential left-to-right — matches DuckDB `list_distance`² exactly.
    * Native codegen'd expression ([[graft.functions.ArraySqDist]]): one
    * fused loop per pair instead of interpreted zip_with/aggregate lambdas.
    */
  def squaredDistance(a: Column, b: Column): Column =
    graft.functions.ArraySqDist(a, b)

  /** Bounded top-k of (score asc, id asc) with a rider payload column. */
  private[graft] def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.product[Scored])

  /** Classify each `test` row by majority label of its `k` nearest train
    * rows (squared-euclidean on `featCol` arrays); distance ties break on
    * `trainIdCol`, vote ties on the smallest label — fully deterministic.
    *
    * Output: testIdCol, `pred_label`, `n_votes` (votes for the winner).
    */
  def classify(
      train: DataFrame,
      test: DataFrame,
      featCol: String,
      labelCol: String,
      testIdCol: String,
      trainIdCol: String,
      k: Int): DataFrame = {
    val t = broadcast(test.select(col(testIdCol), col(featCol).as("__qf")))
    val joined = train
      .select(col(trainIdCol).as("__tid"), col(labelCol).as("__lbl"), col(featCol).as("__tf"))
      .crossJoin(t)
      .withColumn("__d2", squaredDistance(col("__qf"), col("__tf")))
    val topk = joined.groupBy(col(testIdCol))
      .agg(topK(k)(col("__d2"), col("__tid").cast("long"), col("__lbl").cast("long")).as("__tk"))
    val votes = topk
      .select(col(testIdCol), explode(col("__tk.hits.payload")).as("__lbl"))
      .groupBy(col(testIdCol), col("__lbl"))
      .agg(count(lit(1)).as("n_votes"))
    votes.withColumn("__vrk",
      row_number().over(Window.partitionBy(col(testIdCol))
        .orderBy(col("n_votes").desc, col("__lbl").asc)))
      .filter(col("__vrk") === 1)
      .select(col(testIdCol), col("__lbl").as("pred_label"), col("n_votes"))
  }

  /** k nearest neighbours themselves (rank + id + squared distance). */
  def neighbors(
      train: DataFrame,
      test: DataFrame,
      featCol: String,
      testIdCol: String,
      trainIdCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val t = broadcast(test.select(col(testIdCol).as("__qid"), col(featCol).as("__qf")))
    val joined = train
      .select(col(trainIdCol).as("__tid"), col(featCol).as("__tf"))
      .crossJoin(t)
      .filter(if (excludeSelf) col("__tid") =!= col("__qid") else lit(true))
      .withColumn("__d2", squaredDistance(col("__qf"), col("__tf")))
    joined.groupBy(col("__qid"))
      .agg(topK(k)(col("__d2"), col("__tid").cast("long"), lit(0L)).as("__tk"))
      .select(col("__qid"), posexplode(col("__tk.hits")).as(Seq("__pos", "__h")))
      .select(col("__qid").as(testIdCol), (col("__pos") + 1).cast("int").as("rank"),
        col("__h.id").as("neighbor_id"), col("__h.score").as("dist2"))
  }
}
