package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index with term-bucket-pruned BM25 search — the
  * LEXICAL member of the persisted-index family (exact-hash, MinHash-LSH,
  * semantic, IVF, NSW, HNSW being the others): [[graft.text.Quality.bm25]]
  * recomputes corpus statistics from text on every call, which is the
  * right shape for one-off scoring but not for a search service — at
  * 100 TB a query must touch the few posting buckets its terms hash
  * into, never the corpus.
  *
  * Layout at `path`:
  *   - `postings/__b=<bucket>/` — `(term, doc_id, tf, dl)` rows,
  *     partitioned by `crc32(term) % nBuckets`. Document length `dl`
  *     rides denormalized in every posting (the classic posting-list
  *     design), so scoring needs NO doc-table join and candidate work
  *     is bounded by posting-list length.
  *   - `meta/` — `(n_docs, total_dl, n_buckets)` as exact BIGINTs;
  *     `avgdl = total_dl / n_docs` is derived at search time, so an
  *     append only rewrites this one tiny file.
  *
  * Search statistics stay EXACT under pruning: a term's full posting
  * list lives in one bucket, so `df(term)` counted over the pruned scan
  * equals the global document frequency, and `N`/`avgdl` come from meta.
  *
  * Appends are the ingest-loop shape of the family: new docs' postings
  * append into their term buckets (untouched buckets keep their files),
  * meta's two counters advance. [[deleteFromIndex]] is the x136/x137
  * bucket-pruned drop-then-append erasure (GDPR: erased docs' postings
  * leave only their term buckets rewritten); [[compactIndex]] is the
  * x127/x128 maintenance op (appends accumulate one file per touched
  * bucket per batch — compaction collapses each bucket back to one
  * file, row-set-identical by `require`).
  *
  * Tokenization matches [[Quality.bm25]] exactly: lowercased whitespace
  * words, empties dropped.
  */
object InvertedIndex {

  val DefaultBuckets = 64

  private def postingsPath(path: String) = s"$path/postings"
  private def metaPath(path: String) = s"$path/meta"

  private def toks(docs: DataFrame, idCol: String, textCol: String) =
    graft.Tables.spread(docs)
      .select(col(idCol).as("__id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)

  private def postingsOf(
      docs: DataFrame, idCol: String, textCol: String, nBuckets: Int) = {
    val t = toks(docs, idCol, textCol)
    val dl = t.groupBy(col("__id")).agg(count(lit(1)).as("__dl"))
    val tf = t.groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("__tf"))
    (tf.join(dl, "__id")
      .select(col("__w"), col("__id"), col("__tf"), col("__dl"),
        pmod(crc32(col("__w")), lit(nBuckets.toLong)).as("__b")), dl)
  }

  /** Build (overwrite) the index over `docs`. */
  def writeIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val spark = docs.sparkSession
    val (post, dl) = postingsOf(docs, idCol, textCol, nBuckets)
    post.repartition(col("__b"))
      .write.mode("overwrite").partitionBy("__b")
      .parquet(postingsPath(path))
    val s = dl.agg(count(lit(1)).cast("long"), sum(col("__dl")).cast("long")).head()
    // empty corpus: sum() is NULL — same guard as appendToIndex
    writeMeta(spark, path, s.getLong(0),
      if (s.isNullAt(1)) 0L else s.getLong(1), nBuckets)
  }

  /** Collapse each term bucket's accumulated append files into one file
    * per bucket — the x127/x128 maintenance discipline applied to the
    * lexical tier. Ingest batches append one file per touched bucket, so
    * an N-batch index reads N small files per bucket; compaction
    * rewrites the postings ONCE, bucket-partitioned, and proves the
    * row set unchanged (search results are invariant by construction —
    * same rows, same layout rule). Meta is untouched: counters don't
    * change when rows don't.
    */
  def compactIndex(spark: SparkSession, path: String): Unit = {
    val (_, _, nBuckets) = readMeta(spark, path)
    val stored = spark.read.parquet(postingsPath(path))
    val before = stored.count()
    if (before == 0L) return
    // materialize BEFORE overwriting the directory being read
    val pinned = stored
      .repartition(nBuckets, col("__b"))
      .localCheckpoint(true)
    pinned.write.mode("overwrite").partitionBy("__b").parquet(postingsPath(path))
    val after = spark.read.parquet(postingsPath(path)).count()
    require(after == before,
      s"compaction changed the posting set: $before -> $after rows")
  }

  /** Append a batch of NEW docs (ids must be absent from the index —
    * re-appending a doc would double its postings; enforce upstream with
    * the x32 exact-dedup ingest loop). Only the batch's term buckets
    * gain files; meta's counters advance.
    */
  def appendToIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    val (n, totalDl, nBuckets) = readMeta(spark, path)
    val (post, dl) = postingsOf(docs, idCol, textCol, nBuckets)
    post.repartition(col("__b"))
      .write.mode("append").partitionBy("__b")
      .parquet(postingsPath(path))
    val s = dl.agg(count(lit(1)).cast("long"), sum(col("__dl")).cast("long")).head()
    writeMeta(spark, path, n + s.getLong(0),
      totalDl + (if (s.isNullAt(1)) 0L else s.getLong(1)), nBuckets)
  }

  /** Erase docs from the index — right-to-be-forgotten on the lexical
    * tier (the x136/x137/x138 contract): the deletion input is the doc
    * rows themselves (id + the SAME text that was ingested), so the
    * touched term buckets are recomputed and only they rewrite
    * (drop-then-append; drained bucket directories vanish, untouched
    * buckets stay byte-identical); meta's counters decrement by the
    * erased docs actually present. Returns that count. A doc whose text
    * changed since ingest would leave stale postings in unrecomputed
    * buckets — same caveat as [[IncrementalNearDup.deleteFromIndex]],
    * same remedy (delete with the ingested content).
    */
  def deleteFromIndex(
      spark: SparkSession,
      path: String,
      docs: DataFrame,
      idCol: String,
      textCol: String): Long = {
    val (n, totalDl, nBuckets) = readMeta(spark, path)
    val (post, _) = postingsOf(docs, idCol, textCol, nBuckets)
    val buckets = post.select(col("__b")).distinct()
      .collect().map(_.getLong(0))
    if (buckets.isEmpty) return 0L
    val delIds = docs.select(col(idCol).cast("long").as("__id")).distinct()
    val touched = spark.read.parquet(postingsPath(path))
      .filter(col("__b").isInCollection(buckets))
    // counters of the docs actually present, taken BEFORE the rewrite
    val gone = touched
      .join(delIds, Seq("__id"), "left_semi")
      .select(col("__id"), col("__dl")).distinct()
      .agg(count(lit(1)).cast("long"), sum(col("__dl")).cast("long")).head()
    val removed = gone.getLong(0)
    if (removed == 0L) return 0L
    val kept = touched.join(delIds, Seq("__id"), "left_anti")
      .repartition(col("__b"))
      .localCheckpoint(true) // pinned before its source dirs are dropped
    val fs = new org.apache.hadoop.fs.Path(postingsPath(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    buckets.foreach { b =>
      val dir = new org.apache.hadoop.fs.Path(s"${postingsPath(path)}/__b=$b")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    if (!kept.isEmpty)
      kept.write.mode("append").partitionBy("__b").parquet(postingsPath(path))
    writeMeta(spark, path, n - removed, totalDl - gone.getLong(1), nBuckets)
    removed
  }

  private def writeMeta(
      spark: SparkSession, path: String,
      nDocs: Long, totalDl: Long, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((nDocs, totalDl, nBuckets))
      .toDF("n_docs", "total_dl", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(path))
  }

  private def readMeta(spark: SparkSession, path: String): (Long, Long, Int) = {
    val r = spark.read.parquet(metaPath(path)).head()
    (r.getAs[Long]("n_docs"), r.getAs[Long]("total_dl"),
      r.getAs[Int]("n_buckets"))
  }

  /** Bucket of `term` under the index's crc32 rule — driver-side twin of
    * the Spark `crc32` column function (CRC-32 over UTF-8 bytes).
    */
  private def bucketOf(term: String, nBuckets: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes("UTF-8"))
    java.lang.Long.remainderUnsigned(c.getValue, nBuckets.toLong)
  }

  /** The pruned postings scan for a term set: a partition filter on the
    * terms' buckets (provable with
    * [[graft.sources.Partitioned.prunedPartitionCount]]) followed by the
    * exact term filter. Exposed so callers can audit the pruning.
    */
  def prunedPostings(
      spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    val (_, _, nBuckets) = readMeta(spark, path)
    val tl = terms.map(_.toLowerCase).distinct
    val buckets = tl.map(bucketOf(_, nBuckets)).distinct
    spark.read.parquet(postingsPath(path))
      .filter(col("__b").isInCollection(buckets))
      .filter(col("__w").isInCollection(tl))
  }

  /** BM25 scores for every doc matching at least one term, computed
    * ENTIRELY from the index (pruned postings + meta — the corpus text
    * is never read): same formula and float-op order as
    * [[Quality.bm25]]. Output: `(doc_id, n_tokens, bm25)`.
    */
  def scoreBm25(
      spark: SparkSession,
      path: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (n, totalDl, _) = readMeta(spark, path)
    val avgdl = totalDl.toDouble / n.toDouble
    val post = prunedPostings(spark, path, terms)
    val dfs = post.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
    post.join(broadcast(dfs), "__w")
      .withColumn("__idf",
        log((lit(n.toDouble) - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__s",
        col("__idf") * col("__tf") * (k1 + 1) /
          (col("__tf") + (col("__dl") / avgdl * b + (1 - b)) * k1))
      .groupBy(col("__id"))
      .agg(first(col("__dl")).as("n_tokens"), sum(col("__s")).as("bm25"))
      .select(col("__id").as("doc_id"), col("n_tokens"), col("bm25"))
  }

  /** Top-`k` search: [[scoreBm25]] ranked score-desc, id-asc — planned
    * as a distributed TakeOrdered, never a single-task global window.
    */
  def searchBm25(
      spark: SparkSession,
      path: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    scoreBm25(spark, path, terms, k1, b)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }
}
