package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cavnar–Trenkle n-gram language identification (Cavnar & Trenkle
  * 1994, "N-Gram-Based Text Categorization") — the published n-gram
  * rank-profile method behind the classic `textcat` family, beside the
  * cheaper stopword-hit argmax ([[TextOps.languageId]], x7): each
  * language gets a PROFILE (its `profileSize` most frequent character
  * n-grams in rank order, built from labeled corpus text), each document
  * gets its own top-`docGrams` rank list, and the predicted language
  * minimizes the out-of-place distance
  * Σ_g |rank_doc(g) − rank_profile(g)| with a `profileSize` penalty for
  * grams absent from the profile. Every step is a deterministic
  * aggregate with total-order tie-breaks (count desc, gram asc; distance
  * asc, lang asc), so training AND classification replay exactly in
  * ANSI SQL — no fitted-state thunk needed.
  *
  * Scale shape: the profile table is `langs × profileSize` rows —
  * broadcast-joined, never shuffled with the corpus. Documents are
  * tokenized into char n-grams once (one explode), ranked per doc by a
  * keyed window, and the distance is one broadcast join + one grouped
  * aggregate: corpus-linear, no all-pairs anywhere.
  */
object LangId {

  /** Character n-grams of the normalized text (positions
    * 1..len−n+1, duplicates preserved — frequency matters); empty when
    * the text is shorter than `n` normalized chars.
    */
  private def charGrams(textCol: String, n: Int): Column = {
    val norm = TextOps.normalize(col(textCol))
    when(length(norm) >= n,
      transform(sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** `(labelCol, gram, rank)` — each language's `profileSize`-gram rank
    * profile from its labeled corpus text (rank 1 = most frequent;
    * ties break to the lexicographically smallest gram).
    */
  def profiles(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      n: Int = 3,
      profileSize: Int = 100): DataFrame = {
    val w = Window.partitionBy(col(labelCol))
      .orderBy(col("__c").desc, col("__g"))
    df.select(col(labelCol), explode(charGrams(textCol, n)).as("__g"))
      .groupBy(col(labelCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= profileSize)
      .select(col(labelCol), col("__g").as("gram"), col("rank"))
  }

  /** One-pass self-labeled train+classify — [[profiles]] ∘ [[classify]]
    * over the SAME corpus, with per-doc counting never leaving the row:
    * [[graft.functions.GramCountList]] emits each document's finished
    * `(gram, count)` list already in `(count desc, gram asc)` order, so
    * the per-doc top-`docGrams` rank list is a zero-shuffle
    * `slice + posexplode` (the declarative path shuffles + window-sorts
    * ~13M exploded rows at bench SF just to rank within each doc — all
    * of whose grams sat in one row to begin with). The only cross-row
    * step left is the per-LANGUAGE profile aggregation: one
    * `explode → groupBy(lang, gram)` over the PRE-COUNTED entries
    * (partial aggregation compresses to ~langs × distinct-grams per
    * partition before the single shuffle), then the group-limited rank
    * window on the aggregated frame. Output and oracle are identical to
    * the [[profiles]] ∘ [[classify]] composition (equivalence-spec'd).
    */
  def classifySelfLabeled(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      n: Int = 3,
      profileSize: Int = 100,
      docGrams: Int = 50): DataFrame = {
    val counted = df.select(col(idCol).as("__id"), col(labelCol),
      graft.functions.GramCountList(TextOps.normalize(col(textCol)), n)
        .as("__gc"))
    val wLang = Window.partitionBy(col(labelCol))
      .orderBy(col("__c").desc, col("__g"))
    val prof = counted
      .select(col(labelCol), explode(col("__gc")).as("__e"))
      .select(col(labelCol), col("__e.gram").as("__g"), col("__e.c").as("__dc"))
      .groupBy(col(labelCol), col("__g"))
      .agg(sum(col("__dc")).as("__c"))
      .withColumn("rank", row_number().over(wLang))
      .filter(col("rank") <= profileSize)
      .select(col(labelCol), col("__g").as("gram"), col("rank"))
    val docRanks = counted
      .select(col("__id"),
        posexplode(slice(col("__gc"), 1, docGrams)).as(Seq("__pos", "__e")))
      .select(col("__id"), col("__e.gram").as("__g"),
        (col("__pos") + 1).cast("int").as("__dr"))
    score(docRanks, prof, labelCol, profileSize, idCol)
  }

  /** Classify every document: `(idCol, pred_lang, distance)` where
    * `pred_lang` minimizes the out-of-place distance of the doc's
    * top-`docGrams` rank list against each profile (absent grams cost
    * `profileSize`), ties to the lexicographically smallest language.
    * Documents shorter than `n` normalized chars are absent.
    */
  def classify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      prof: DataFrame,
      labelCol: String,
      n: Int = 3,
      profileSize: Int = 100,
      docGrams: Int = 50): DataFrame = {
    val wDoc = Window.partitionBy(col("__id"))
      .orderBy(col("__c").desc, col("__g"))
    val docRanks = df
      .select(col(idCol).as("__id"), explode(charGrams(textCol, n)).as("__g"))
      .groupBy(col("__id"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__dr", row_number().over(wDoc))
      .filter(col("__dr") <= docGrams)
      .select(col("__id"), col("__g"), col("__dr"))
    score(docRanks, prof, labelCol, profileSize, idCol)
  }

  /** Shared scorer: out-of-place distance per (doc, language) + argmin
    * pick. `docRanks` = `(__id, __g, __dr)`, `prof` = the [[profiles]]
    * frame.
    */
  private def score(
      docRanks: DataFrame,
      prof: DataFrame,
      labelCol: String,
      profileSize: Int,
      idCol: String): DataFrame = {
    val langs = prof.select(col(labelCol)).distinct()
    val scored = docRanks
      .crossJoin(broadcast(langs))
      .join(broadcast(prof.withColumnRenamed("gram", "__g")),
        Seq(labelCol, "__g"), "left")
      .groupBy(col("__id"), col(labelCol))
      .agg(sum(coalesce(
        abs(col("__dr") - col("rank")), lit(profileSize.toLong)))
        .as("__dist"))
    val wPick = Window.partitionBy(col("__id"))
      .orderBy(col("__dist"), col(labelCol))
    scored.withColumn("__rk", row_number().over(wPick))
      .filter(col("__rk") === 1)
      .select(col("__id").as(idCol), col(labelCol).as("pred_lang"),
        col("__dist").as("distance"))
  }
}
