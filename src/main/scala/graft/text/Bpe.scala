package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application (Sennrich et al.
  * 2016, arXiv:1508.07909) — the tokenizer-fit stage of a pretraining
  * pipeline, beside the fixed BPE-ish token ESTIMATE the corpus stats use
  * (`TextOps`, x8).
  *
  * Scale shape: merge learning never iterates over the corpus. One
  * distributed pass builds the word-frequency table; the table is capped
  * at `maxVocab` rows by `(count desc, word)` and collected — the bounded
  * driver model state, same contract as DSIR models / IVF centroids (the
  * standard trainer design: HF-tokenizers also fits merges on word
  * counts, not raw text). The greedy merge loop is O(vocab · word-length
  * · merges) driver compute. Tokenization is one distributed map with the
  * merge ranks broadcast and a per-partition word memo — words repeat, so
  * amortized per-row cost is the lookup, not the merge loop.
  *
  * Symbol model: plain characters, no end-of-word marker (merges never
  * cross words because encoding is per word). Ties in pair frequency
  * break to the lexicographically smallest pair — a total order, so
  * training is bit-deterministic for a given corpus.
  */
object Bpe {

  /** Word-frequency table of the corpus, top `maxVocab` by
    * `(count desc, word asc)` — the deterministic cap that bounds driver
    * state (dropping the long tail of hapaxes is also what keeps learned
    * merges corpus-representative).
    */
  def wordCounts(
      df: DataFrame, textCol: String, maxVocab: Int): Seq[(String, Long)] =
    df.select(explode(split(TextOps.normalize(col(textCol)), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Greedy merge of every occurrence of `pair` in a symbol sequence,
    * left to right — shared by training and encoding so the two always
    * agree on segmentation.
    */
  private def mergePair(
      syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Classic BPE training loop on a word-frequency table: `numMerges`
    * rounds of (count adjacent symbol pairs weighted by word frequency →
    * merge the most frequent pair everywhere). Stops early when no pair
    * occurs twice. Returns merges in rank order.
    */
  def learnMerges(
      wc: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = wc.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty), c)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** One distributed word-count pass + the driver merge loop. */
  def train(
      df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 65536): Seq[(String, String)] =
    learnMerges(wordCounts(df, textCol, maxVocab), numMerges)

  /** Encode one word under the learned ranks: repeatedly merge the
    * lowest-rank adjacent pair present (every occurrence) until no
    * adjacent pair is mergeable — the canonical BPE apply.
    */
  def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.split("").filter(_.nonEmpty)
    var continue = syms.length >= 2
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
      if (syms.length < 2) continue = false
    }
    syms.toSeq
  }

  /** Per-doc token count under the learned merges: one distributed map,
    * ranks broadcast, per-partition word→count memo (no shuffle beyond
    * whatever the caller does downstream). Output: `(idCol, n_tokens)`.
    */
  def tokenCounts(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val in: Dataset[Row] = df.select(col(idCol).cast("long"),
      TextOps.normalize(col(textCol)).as("__t"))
    import spark.implicits._
    in.mapPartitions { rows =>
      val r = bc.value
      val memo = scala.collection.mutable.HashMap.empty[String, Long]
      rows.map { row =>
        val id = row.getLong(0)
        val words = row.getString(1).split(" ").filter(_.nonEmpty)
        var n = 0L
        words.foreach { w =>
          n += memo.getOrElseUpdate(w, encodeWord(w, r).length.toLong)
        }
        (id, n)
      }
    }.toDF(idCol, "n_tokens")
  }
}
