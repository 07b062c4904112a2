package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time incremental exact deduplication — the 100 TB ingestion
  * shape: a daily batch must dedup against the whole corpus WITHOUT
  * rescanning it. The corpus is represented by a persisted content-hash
  * index (md5 of [[TextOps.normalize]]d text — the same fingerprint as
  * [[TextOps.exactDedup]]), and each batch runs
  *
  *   within-batch dedup → anti-join vs index → append survivors' hashes,
  *
  * so ingesting the same batch twice is a no-op the second time
  * (idempotent by construction: every survivor's hash lands in the index
  * before the next batch reads it).
  *
  * Index layout (`<path>/hashes/`): hash strings ONLY — no ids, no text —
  * partitioned into [[DefaultBuckets]] directories by a crc32 bucket of
  * the hash, mirroring the cell-partitioned IVF index
  * ([[graft.similarity.Ivf.writeIndex]]). At corpus scale the index is
  * ~40 bytes/doc (4 TB for 100 B docs vs the 100 TB corpus); the
  * anti-join shuffles hash strings only, and the bucketed layout is the
  * on-disk shape a metastore-backed `bucketBy` table (or a per-bucket
  * map-side merge) needs to make the index side of that anti-join
  * shuffle-free. Appends repartition by bucket first so a batch adds
  * O(1) files per touched bucket, not one per upstream task.
  *
  * Reference semantics: exact dedup per `fdi_flow` preprocessing
  * (normalize → hash → keep-first); the incremental contract itself is
  * the standard training-data-pipeline ingest loop (no reference
  * counterpart — it has no persisted state).
  */
object IncrementalDedup {

  /** Buckets in the persisted hash index. 64 keeps sf-scale test indexes
    * small while bounding per-bucket file size at corpus scale; a real
    * deployment sizes this like bucketBy bucket counts (≈ index size /
    * target file size).
    */
  val DefaultBuckets = 64

  private def hashesPath(path: String) = s"$path/hashes"

  /** True iff an index has been written at `path`. */
  def indexExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(hashesPath(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** All parquet data files currently in the index — the pinned snapshot
    * [[dedupIncremental]] reads so its own append can't leak into the
    * batch it is deduping.
    */
  private def indexFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(hashesPath(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString
    }
    buf.toSeq
  }

  /** Delete the index at `path` (fresh-build convenience for tests and
    * re-runs; a production retrain writes to a new path and swaps).
    */
  def dropIndex(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Compact the index: rewrite the accumulated per-batch append files
    * into O(1) files per bucket (optionally re-bucketing to a new
    * `nBuckets` — capacity re-sizing as the corpus grows). After N daily
    * batches each bucket holds N small files and the snapshot read of
    * every subsequent batch pays O(N · buckets) opens; compaction
    * restores O(buckets). Semantics-free by construction: the hash SET
    * is unchanged, so every future [[dedupIncremental]] decision is
    * identical — the spec asserts it, and a require() guards the
    * read-back count. The full snapshot is pinned (explicit file list)
    * and materialized via localCheckpoint BEFORE the overwrite replaces
    * the directory (the graph-append device), so a crash mid-write
    * never reads its own partial output.
    */
  def compactIndex(
      spark: SparkSession,
      path: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    val snap = indexFiles(spark, path)
    if (snap.isEmpty) return
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val hashSchema = StructType(Seq(StructField("__h", StringType)))
    // row-conservation proof from parquet footers — exact, driver-side,
    // no count() scans bracketing the rewrite
    val before = graft.sources.Partitioned.footerRowCountFiles(spark, snap)
    val all = spark.read.schema(hashSchema).parquet(snap: _*)
      .select(col("__h"))
      .withColumn("__b", pmod(crc32(col("__h")), lit(nBuckets)))
      .repartition(nBuckets, col("__b"))
      .localCheckpoint(true)
    all.write.mode("overwrite").partitionBy("__b").parquet(hashesPath(path))
    val after = graft.sources.Partitioned.footerRowCount(
      spark, hashesPath(path))
    require(after == before,
      s"compaction changed the hash set: $before -> $after rows")
  }

  /** Delete a document set's content hashes from the persisted index —
    * the right-to-be-forgotten lifecycle op (GDPR erasure): a corpus
    * rewrite that removes documents must also remove their fingerprints,
    * or the erased content stays banned forever — any future legitimate
    * re-submission would be silently dropped as a duplicate of a doc
    * that no longer exists. Only buckets containing a to-delete hash
    * are touched: the deletion set (hashes only, distinct-ed — erasure
    * requests are small by nature) picks its buckets, the pruned
    * snapshot is anti-joined and materialized, the touched bucket
    * directories are dropped, and the survivors re-appended — a bucket
    * deleted to empty simply disappears from the layout (dynamic
    * partition overwrite would have left its stale files in place,
    * which is why the rewrite is drop-then-append). Untouched buckets
    * stay byte-identical. Returns the number of index rows removed.
    * `nBuckets` must match the index's bucketing, the same caller
    * contract as [[dedupIncremental]].
    */
  def deleteFromIndex(
      spark: SparkSession,
      path: String,
      docs: DataFrame,
      textCol: String,
      nBuckets: Int = DefaultBuckets): Long = {
    val snap = indexFiles(spark, path)
    if (snap.isEmpty) return 0L
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val hashSchema = StructType(Seq(StructField("__h", StringType)))
    val del = docs.select(TextOps.contentHash(col(textCol)).as("__h")).distinct()
      .withColumn("__b", pmod(crc32(col("__h")), lit(nBuckets)))
      .localCheckpoint()
    val touched = del.select(col("__b")).distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return 0L
    val bucketOf = "__b=([0-9]+)".r
    val touchedFiles = snap.filter(f =>
      bucketOf.findFirstMatchIn(f).exists(m => touched.contains(m.group(1).toLong)))
    if (touchedFiles.isEmpty) return 0L
    val resident = spark.read.schema(hashSchema).parquet(touchedFiles: _*)
      .select(col("__h"))
      .withColumn("__b", pmod(crc32(col("__h")), lit(nBuckets)))
    // whole files are read, so the pre-image count is footer metadata
    val before = graft.sources.Partitioned.footerRowCountFiles(
      spark, touchedFiles)
    // materialize the survivors BEFORE dropping the directories they read
    val kept = resident.join(del.select(col("__h")), Seq("__h"), "left_anti")
      .repartition(math.max(touched.size, 1), col("__b"))
      .localCheckpoint(true)
    val after = kept.count()
    val fs = new org.apache.hadoop.fs.Path(hashesPath(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val dir = new org.apache.hadoop.fs.Path(s"${hashesPath(path)}/__b=$b")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    if (after > 0)
      kept.write.mode("append").partitionBy("__b").parquet(hashesPath(path))
    before - after
  }

  /** Dedup one ingest batch against the persisted index at `path`,
    * append the survivors' hashes to the index, and return the surviving
    * rows (batch columns unchanged). First call on an empty `path`
    * creates the index — the bootstrap batch IS the initial corpus.
    *
    * `keepBy` orders within-batch candidates (first wins), exactly as
    * [[TextOps.exactDedup]]; cross-batch, earlier batches always win
    * (their hashes are already in the index).
    */
  def dedupIncremental(
      batch: DataFrame,
      textCol: String,
      keepBy: Seq[String],
      path: String,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    val spark = batch.sparkSession
    val withinBatch = TextOps.exactDedup(batch, textCol, keepBy)
      .withColumn("__h", TextOps.contentHash(col(textCol)))
    // Snapshot the index by listing its parquet files EXPLICITLY: the
    // append below targets the same directory, which (a) invalidates any
    // cache over a directory-scan plan (refreshByPath) and (b) would make
    // a re-executed directory scan see the batch's own hashes — wrongly
    // eliminating every survivor the caller consumes after the append.
    // A pinned file list keeps every (re-)execution on the pre-append
    // snapshot, whatever order the caller evaluates in.
    val snapshot = indexFiles(spark, path)
    // Snapshot reads carry an EXPLICIT schema (the IncrementalNearDup
    // device): with a plain file list Spark otherwise infers the schema
    // from parquet footers driver-side — O(files) at any scale.
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val hashSchema = StructType(Seq(StructField("__h", StringType)))
    val fresh =
      if (snapshot.nonEmpty)
        // ids/text never enter this join's index side — hash strings only
        withinBatch.join(
          spark.read.schema(hashSchema).parquet(snapshot: _*).select(col("__h")),
          Seq("__h"), "left_anti")
      else withinBatch
    // Cache only for the duration of the index append, then RELEASE: the
    // intended caller is a long-running foreachBatch ingest loop, and a
    // cache left pinned here would accumulate one batch of storage per
    // micro-batch for the life of the stream.
    val survivors = fresh.cache()
    try {
      survivors.select(col("__h"))
        .withColumn("__b", pmod(crc32(col("__h")), lit(nBuckets)))
        .repartition(nBuckets, col("__b"))
        .write.mode("append").partitionBy("__b").parquet(hashesPath(path))
    } finally survivors.unpersist(blocking = false)
    // The survivors ARE what the append just persisted — semi-join the
    // within-batch winners against the hashes read back from the newly
    // added files (pre-append snapshot diff; the IncrementalNearDup r10
    // return-path device). A caller consuming the result re-runs only
    // the batch-local election plus an O(batch) semi-join — never the
    // anti-join against the full index snapshot — and re-execution
    // stays deterministic on the pinned file list. `withinBatch` keeps
    // one row per hash, so the semi-join restores exactly the elected
    // survivor rows.
    val newFiles = (indexFiles(spark, path).toSet -- snapshot.toSet).toSeq
    if (newFiles.isEmpty) batch.filter(lit(false)) // everything deduped away
    else withinBatch.join(
      spark.read.schema(hashSchema).parquet(newFiles: _*).select(col("__h")),
      Seq("__h"), "left_semi").drop("__h")
  }
}
