package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality report — the metric layer of the ANN governance
  * family (cell-balance telemetry, drift gates, retrain drills): given
  * an approximate top-k result and the exact baseline over the same
  * queries, emit the standard IR metrics per query — recall@k, MRR@k
  * (reciprocal rank of the first exact-top-k hit) and binary-relevance
  * nDCG@k. This is the artifact an index operator watches to decide
  * nprobe/ef budgets or trigger a retrain: recall says how much is
  * missing, MRR/nDCG say whether what remains is still ranked first.
  *
  * Scale shape: one ids-only equi-join of the two result sets on
  * (query, neighbor) — k rows per query per side, never the corpus —
  * then one grouped aggregate. The exact baseline is itself corpus-
  * sized work, so at 100 TB it runs on a sampled query panel (the
  * standard recall-estimation practice); the metric layer here is
  * indifferent to how either side was produced.
  */
object RetrievalEval {

  /** ln 2 and ideal DCG pinned on the driver so both the engine and a
    * SQL replay use the identical constants (JVM `Math.log` and libm
    * `ln` may differ in the last ulp).
    */
  private[graft] def ln2: Double = math.log(2.0)
  private[graft] def idcgAt(k: Int): Double =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / ln2)).sum

  /** Per-query metrics: `(queryIdCol, recall, mrr, ndcg)` rounded to 6.
    * Both inputs carry `(queryIdCol, neighborIdCol, rankCol)` rows with
    * rank ≤ k (the shape of every topK in this package).
    */
  def topKQuality(
      approx: DataFrame,
      exact: DataFrame,
      queryIdCol: String,
      neighborIdCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"need k > 0: $k")
    val ex = exact
      .select(col(queryIdCol).as("__q"), col(neighborIdCol).as("__n"))
      .withColumn("__rel", lit(1d))
    val a = approx.select(col(queryIdCol).as("__q"),
      col(neighborIdCol).as("__n"), col(rankCol).as("__r"))
    val hit = col("__rel") === 1d
    a.join(ex, Seq("__q", "__n"), "left")
      .groupBy(col("__q"))
      .agg(
        round(sum(coalesce(col("__rel"), lit(0d))) / k, 6).as("recall"),
        round(coalesce(lit(1d) / min(when(hit, col("__r"))), lit(0d)), 6)
          .as("mrr"),
        round(coalesce(sum(when(hit,
          lit(1d) / (log(col("__r") + lit(1d)) / lit(ln2)))), lit(0d))
          / idcgAt(k), 6).as("ndcg"))
      .select(col("__q").as(queryIdCol), col("recall"), col("mrr"), col("ndcg"))
  }
}
