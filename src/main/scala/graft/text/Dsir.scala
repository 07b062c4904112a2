package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick the raw-corpus documents that look most like a
  * target corpus, by importance weights under two bag-of-hashed-n-grams
  * unigram models.
  *
  *  1. Features: unigrams + bigrams of the normalized text, hashed into
  *     `b` buckets (the paper's 10k-bucket hashing trick — bounds model
  *     size regardless of vocabulary).
  *  2. Fit add-1-smoothed categorical models p (target) and q (raw) over
  *     buckets.
  *  3. Per raw doc: `log w = Σ_grams (log p_bucket − log q_bucket)`.
  *  4. Gumbel top-k = sampling k docs WITHOUT replacement proportionally
  *     to their importance weights (the Gumbel-max trick): add G =
  *     −ln(−ln U) noise to each log-weight and keep the k largest.
  *
  * Every randomized step rides the md5 device ([[Pipeline.hashUniform]]
  * header): gram→bucket hashing AND the per-doc Gumbel draw are md5-based
  * and bit-replayable in DuckDB, so the whole selection carries a full
  * oracle despite being a "random" sample.
  *
  * Scale shape: gram explosion is map-side; both corpus models are
  * b-bounded aggregates (map-side partial combine, ≤ b rows out); the
  * per-gram model lookup joins two BROADCAST b-row frames (never a
  * shuffle of the gram stream); per-doc reduction is one hash aggregate;
  * the final top-k is a TakeOrdered, not a global sort. Two passes over
  * the raw text (model fit + scoring), the x36 two-pass contract.
  */
object Dsir {

  /** Unigrams + bigrams over whitespace-normalized lowercase text, with
    * multiplicity (counts matter in the model).
    *
    * The token array is let-bound via the `element_at(transform(array(…`
    * idiom ([[Quality]] header): interpreted HOF lambdas re-evaluate
    * referenced OUTER expressions per element, so an unbound
    * `split(normalize(text))` inside the bigram lambda re-ran the
    * normalize regex + split twice per bigram — O(tokens²) regex work
    * per document (measured 34.7 → 4.3 s on x51 at sf0.1).
    */
  private def grams(text: Column): Column =
    element_at(transform(array(split(TextOps.normalize(text), " ")), w => {
      val bi = when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array().cast("array<string>"))
      concat(w, bi)
    }), 1)

  /** md5 gram→bucket hash, bit-replayable in DuckDB as
    * `('0x' || substring(md5('<seed>:' || g), 1, 8))::BIGINT % b`.
    */
  private def bucket(seed: Long, gram: Column, b: Int): Column =
    conv(substring(md5(concat_ws(":", lit(seed.toString), gram)), 1, 8),
      16, 10).cast("long") % b

  /** Exploded (id, bucket) stream of one corpus, multiplicity preserved. */
  private def docBuckets(
      df: DataFrame, idCol: String, textCol: String,
      seed: Long, b: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(grams(col(textCol))).as("__g"))
      .select(col("__id"), bucket(seed, col("__g"), b).as("__b"))

  /** Importance log-weights of every `raw` doc against the `target`
    * model: `(idCol, log_weight, n_grams)`. Add-1 smoothing over the `b`
    * buckets on both models keeps unseen buckets finite.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      b: Int = 8192,
      seed: Long = 7L): DataFrame = {
    require(b > 0 && b <= (1 << 20),
      s"bucket count $b is driver-collected model state; cap it at 2^20")
    val spark = raw.sparkSession
    // The two fitted models ARE ≤ b (bucket, count) rows by construction —
    // collect them once (the bounded driver-state read, same contract as
    // IVF centroids / PQ codebooks) instead of recomputing each b-row
    // aggregate for both the per-gram lookup and the corpus total. Net
    // text passes: target model + raw model + scoring = 3.
    def model(df: DataFrame): Seq[(Long, Long)] =
      docBuckets(df, idCol, textCol, seed, b)
        .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pcRows = model(target)
    val qcRows = model(raw)
    val np = pcRows.map(_._2).sum
    val nq = qcRows.map(_._2).sum
    val pc = spark.createDataFrame(pcRows).toDF("__b", "__cp")
    val qc = spark.createDataFrame(qcRows).toDF("__b", "__cq")
    // log w = Σ [ln(cp+1) − ln(cq+1)] + n·[ln(nq+b) − ln(np+b)]
    docBuckets(raw, idCol, textCol, seed, b)
      .join(broadcast(pc), Seq("__b"), "left")
      .join(broadcast(qc), Seq("__b"), "left")
      .groupBy(col("__id"))
      .agg(
        sum(log(coalesce(col("__cp"), lit(0L)) + 1.0) -
          log(coalesce(col("__cq"), lit(0L)) + 1.0)).as("__s"),
        count(lit(1)).as("n_grams"))
      .select(col("__id").as(idCol),
        (col("__s") + col("n_grams") *
          lit(math.log(nq + b.toDouble) - math.log(np + b.toDouble)))
          .as("log_weight"),
        col("n_grams"))
  }

  /** Gumbel top-k selection over the importance weights: the k docs of
    * `raw` most target-like under noisy importance sampling —
    * `(idCol, log_weight, gumbel_score)`, score-descending. The Gumbel
    * draw `G = −ln(−ln U)` uses `U = (md5_32("g<seed>:<id>") + 0.5)/2^32`
    * — strictly inside (0,1), so the logs never hit ±∞.
    */
  def resample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      b: Int = 8192,
      seed: Long = 7L): DataFrame = {
    val u = (conv(substring(md5(concat_ws(":",
        lit(s"g$seed"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0
    importanceWeights(raw, target, idCol, textCol, b, seed)
      .withColumn("gumbel_score", col("log_weight") - log(-log(u)))
      .orderBy(col("gumbel_score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("log_weight"), col("gumbel_score"))
  }
}
