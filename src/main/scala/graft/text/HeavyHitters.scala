package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at stream scale — the two-pass
  * candidate-then-verify pattern (Manku & Motwani 2002, "Approximate
  * Frequency Counts over Data Streams", VLDB; merged summaries per
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *  1. CANDIDATES: each partition runs lossy counting with error bound
  *     `ε` over its token stream — bounded memory O(1/ε · log εn) per
  *     task, one linear pass, never a shuffle. An item pruned by lossy
  *     counting in a partition has local count ≤ ε·n_p, so an item
  *     absent from EVERY partition's summary has global count ≤
  *     Σ_p ε·n_p = ε·n: the union of the summaries is a proven superset
  *     of every token with global frequency > ε·n.
  *  2. VERIFY: exact `groupBy(token).count` restricted to the candidate
  *     set (a broadcast semi-join — candidates are the small side by
  *     construction), keeping `count ≥ minCount`.
  *
  * With `minCount ≥ ε·n` the output is EXACTLY
  * `{(token, count) : count ≥ minCount}` — deterministic and
  * partitioning-independent, which is what makes the query oracle-able
  * by a plain GROUP BY … HAVING. This is the 100 TB answer to "top
  * tokens": the naive groupBy shuffles every distinct token (the
  * vocabulary) across the cluster; here the shuffle carries only the
  * candidate survivors, and the sketch pass is map-side only. The
  * [[graft.functions.CountMinAgg]] sketch (x74) estimates counts for
  * ALL tokens with bounded error; this operator complements it when the
  * exact count of the frequent few is required.
  */
object HeavyHitters {

  /** Per-partition lossy counting: returns the surviving candidate
    * tokens. Bucket width `w = ceil(1/ε)`; at each bucket boundary,
    * entries with `count + bucketOfInsertion − 1 ≤ currentBucket` are
    * pruned. Undercount of a surviving entry ≤ current bucket index ≤
    * ε · (items seen), giving the superset guarantee above.
    */
  private[graft] def lossyCandidates(
      tokens: Iterator[String], epsilon: Double): Iterator[String] = {
    val w = math.ceil(1.0 / epsilon).toLong
    // token -> (count, bucket at insertion − 1)  [Manku–Motwani Δ]
    val counts = new java.util.HashMap[String, Array[Long]]()
    var seen = 0L
    var bucket = 1L
    while (tokens.hasNext) {
      val t = tokens.next()
      val slot = counts.get(t)
      if (slot == null) counts.put(t, Array(1L, bucket - 1L))
      else slot(0) += 1L
      seen += 1L
      if (seen % w == 0L) {
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue()(0) + e.getValue()(1) <= bucket) it.remove()
        }
        bucket += 1L
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala
  }

  /** `(token, n)` for every whitespace token of the normalized text
    * whose exact global count is ≥ `ceil(minSupport · totalTokens)` —
    * the classic frequent-items formulation, scale-free because the
    * threshold rides the corpus size. `epsilon` tunes the sketch pass
    * (candidate memory ~1/ε per task); `minSupport ≥ ε` is exactly the
    * lossy-counting completeness condition, checked statically, so the
    * exact GROUP-BY … HAVING oracle is licensed by construction. The
    * one extra corpus pass for `totalTokens` is the price of the
    * relative threshold (a fixed absolute `minCount` would skip it).
    */
  def heavyTokens(
      df: DataFrame,
      textCol: String,
      minSupport: Double = 0.03,
      epsilon: Double = 0.003): DataFrame = {
    require(minSupport >= epsilon,
      s"completeness needs minSupport >= eps: $minSupport < $epsilon")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(
      explode(split(TextOps.normalize(col(textCol)), " ")).as("token"))
    val total = toks.count()
    val minCount = math.ceil(minSupport * total).toLong
    val candidates = toks.as[String]
      .mapPartitions(it => lossyCandidates(it, epsilon))
      .distinct()
      .toDF("token")
    toks.join(broadcast(candidates), Seq("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
