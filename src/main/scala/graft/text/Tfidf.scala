package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical TF-IDF vectors and cosine retrieval over them — the
  * classic vector-space model (Salton & Buckley 1988, "Term-weighting
  * approaches in automatic text retrieval"), with sklearn
  * `TfidfVectorizer`'s smoothed idf: `idf(t) = ln((1+N)/(1+df(t))) + 1`
  * and raw term-frequency counts. Complements the dense-embedding ANN
  * stack ([[graft.similarity.Ann]]) and BM25 ([[Quality.bm25]]) with the
  * third standard retrieval representation.
  *
  * Scale shape: the corpus is tokenized ONCE; term frequencies are one
  * shuffle on (doc, term); document frequencies and norms are
  * vocabulary- and corpus-sized aggregates off that frame (document text
  * itself never re-shuffles). Retrieval joins the corpus posting list
  * against a BROADCAST query-vector frame on the term key — linear in
  * corpus size, never all-pairs; per-query top-k rides a rank window
  * that Spark executes as WindowGroupLimit (partial top-k before the
  * shuffle). For corpus-to-corpus near-dup joins use the banded MinHash
  * path ([[TextOps.nearDupPairs]]) — an un-capped tf-idf self-join is
  * quadratic in the posting-list length and is deliberately not offered.
  */
object Tfidf {

  /** Per-(document, term) TF-IDF weights plus the document L2 norm.
    *
    * Tokens are lowercased whitespace words (the [[Quality]] LM
    * convention). Output: `idCol`, `term`, `tf` (long count), `weight`
    * (tf·idf), `norm` (sqrt of the doc's summed squared weights — over
    * the FULL vocabulary, so cosines are true cosines even when a
    * downstream join touches only a term subset).
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the (doc, term) counts ONCE — df/N/norms and the final
    // weight projection all derive from this frame; uncheckpointed, each
    // consumer re-runs the tokenize pass over the corpus (plan-audited:
    // 15 parquet scans collapsed to 1). This is the postings frame a
    // production system persists as its index; the cleaner reclaims the
    // checkpoint blocks on GC.
    val tf = graft.Tables.spread(df)
      .select(col(idCol).as("__id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val n = tf.agg(count_distinct(col("__id")).cast("double").as("__n"))
    val weighted = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("weight",
        col("tf").cast("double") *
          (log((lit(1d) + col("__n")) / (lit(1d) + col("__df"))) + lit(1d)))
      .drop("__df", "__n")
    val norms = weighted.groupBy(col("__id"))
      .agg(sqrt(sum(col("weight") * col("weight"))).as("norm"))
    weighted.join(norms, "__id")
      .select(col("__id").as(idCol), col("term"), col("tf"),
        col("weight"), col("norm"))
  }

  /** Top-k most-similar documents for each query document by TF-IDF
    * cosine. `queryIds` selects the query side from the corpus itself
    * (self-matches are excluded). Ranking is deterministic: similarity
    * rounded to 6 decimals, ties broken by ascending neighbor id — so
    * the result set is stable across engines and shuffle orders.
    *
    * Output: `query_id`, `idCol`, `rank` (1-based), `sim`.
    */
  def cosineRetrieve(
      df: DataFrame, idCol: String, textCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // both join sides read the weight frame — materialize it once
    val w = tfidf(df, idCol, textCol).localCheckpoint(true)
    val q = w.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col("term"),
        col("weight").as("__qw"), col("norm").as("__qnorm"))
    val sims = w.join(broadcast(q), "term")
      .filter(col("query_id") =!= col(idCol))
      .groupBy(col("query_id"), col("__qnorm"), col(idCol), col("norm"))
      .agg(sum(col("__qw") * col("weight")).as("__dot"))
      .withColumn("sim",
        round(col("__dot") / (col("__qnorm") * col("norm")), 6))
    sims
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"), col("sim"))
  }
}
