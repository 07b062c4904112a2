package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — reciprocal rank fusion (Cormack,
  * Clarke & Büttcher 2009, "Reciprocal rank fusion outperforms Condorcet
  * and individual rank learning methods"): fuse the rankings of
  * independent retrieval arms (lexical BM25/TF-IDF, dense ANN, ...) by
  * `rrf(d) = Σ_arms 1/(k0 + rank_arm(d))` — the production RAG
  * hybrid-search default, robust to incomparable arm scores because only
  * RANKS enter the fusion.
  *
  * Determinism across engines: each arm's term is quantized to integer
  * nano-units (`round(1e9 / (k0 + rank))`) BEFORE the sum, so the fused
  * score is an exact BIGINT — a grouped sum of integers is
  * order-independent, immune to the float-association hazards a
  * distributed double sum has (the x118/x119 lesson), and replays
  * bit-for-bit in ANSI SQL. With k0 = 60 the nano-unit gap between
  * adjacent ranks is ~10⁵ at rank 60, so quantization never reorders.
  *
  * Scale shape: arms arrive as (query_id, doc_id, rank) — top-k per
  * query, so each arm is |queries|·k rows regardless of corpus size; the
  * fusion is one union + one grouped integer sum + one per-query window
  * over ≤ |arms|·k rows per query. The expensive work stays in the arms,
  * which scale independently (inverted index / ANN index).
  */
object Hybrid {

  /** Fuse ranked arms, each with columns `(query_id, doc_id, rank)`
    * (1-based ranks). Output: `(query_id, doc_id, rrf_micro, n_arms,
    * rank)` — top `topK` per query by `(rrf_micro desc, doc_id asc)`.
    */
  def rrfFuse(arms: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "need at least one arm")
    require(topK > 0 && k0 >= 0, s"need topK>0, k0>=0: $topK $k0")
    val tagged = arms.map(_.select(
      col("query_id"), col("doc_id"),
      round(lit(1e9) / (lit(k0) + col("rank")), 0).cast("long").as("__t")))
    tagged.reduce(_ unionAll _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__t")).as("rrf_micro"), count(lit(1)).as("n_arms"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("rrf_micro").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
  }
}
