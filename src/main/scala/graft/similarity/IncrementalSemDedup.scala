package graft.similarity

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Ingest-time incremental SEMANTIC deduplication — the embedding tier
  * completing the incremental-dedup triptych beside the exact hash index
  * ([[graft.text.IncrementalDedup]]) and the MinHash LSH index
  * ([[graft.text.IncrementalNearDup]]): a daily batch must drop
  * documents that are semantic duplicates (paraphrases, re-renderings —
  * what no n-gram screen sees) of anything already ingested, WITHOUT
  * rescanning the corpus. The [[SemDedup]] clustering device supplies
  * the confinement: a frozen seeded-KMeans quantizer (trained once on
  * the bootstrap batch — the FAISS frozen-quantizer contract of
  * `Ivf.appendToIndex`; a 100 TB corpus is never re-clustered per batch)
  * assigns every vector a cell, and duplicate candidates are compared
  * WITHIN their cell only, so each batch pays Σ|cell_residents|·|batch
  * cell| cosines instead of |corpus|·|batch|.
  *
  * Semantics (deterministic, ANSI-replayable end to end):
  *  - A batch row is assigned its argmin-distance cell
  *    ([[Ivf.probeCells]] — squared euclidean, cell-asc ties, the exact
  *    arithmetic the SQL oracle replays).
  *  - Within its cell, the batch is processed in ascending id order
  *    against a kept-set initialized with the cell's RESIDENTS: a row is
  *    dropped iff its ROUNDED (6 dp, half-up — the cross-engine x58
  *    device) cosine to ANY kept vector reaches `threshold`; survivors
  *    join the kept-set immediately, so later rows also dedup against
  *    earlier in-batch survivors (the greedy keep-first chain).
  *    Residents always win; re-ingesting a batch is a no-op (every
  *    survivor self-collides at cosine 1.0).
  *  - Survivors' `(id, vector, cell)` rows are appended to the
  *    cell-partitioned state, so the next batch's probe reads only the
  *    cells it touches (partition-pruned by the pinned file list).
  *
  * Scale shape: state is one vector per resident (production stores SQ8
  * codes — [[Ann.quantizeInt8]] — for 4× less; the bench keeps doubles
  * so the oracle replays bit-exactly). The only shuffle is the one
  * cell-keyed repartition of (touched residents ∪ batch); vectors never
  * move except into their own cell's task. Cell population is bounded by
  * quantizer sizing (cells ≈ corpus / nClusters — SemDeDup runs 110 k
  * clusters over 1.3 B embeddings); a cell's kept-set lives in one
  * task's memory, the same Σ|C|² posture as batch [[SemDedup]].
  *
  * Reference semantics: SemDeDup (Abbas et al. 2023) per SURVEY §2.8;
  * the incremental persisted-state contract is the standard
  * training-data ingest loop (no reference counterpart).
  */
object IncrementalSemDedup {

  private def statePath(path: String) = s"$path/state"
  private def centroidsPath(path: String) = s"$path/centroids"

  /** Per-(application, path) memo of the FROZEN quantizer: every ingest
    * wave and erasure consulted the centroid parquet with a full Spark
    * job (read + sort + collect) for 8 rows that are immutable by the
    * frozen-quantizer contract — only [[dropIndex]] removes them and only
    * the bootstrap writes them, so both maintain the memo. Keyed by
    * applicationId with dead-app eviction (the Tables.loadCache device);
    * parquet stays the source of truth for a fresh session.
    */
  private val centsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Array[Array[Double]]]()

  private def cacheKey(spark: SparkSession, path: String) = {
    val app = spark.sparkContext.applicationId
    centsCache.keySet.removeIf(_._1 != app)
    (app, path)
  }

  /** True iff an index (frozen quantizer) exists at `path`. */
  def indexExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(centroidsPath(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Delete the index at `path` (fresh-build convenience; a production
    * retrain writes to a new path and swaps).
    */
  def dropIndex(spark: SparkSession, path: String): Unit = {
    centsCache.remove(cacheKey(spark, path))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The frozen quantizer persisted at `path` (cell-ordered). */
  def centroids(spark: SparkSession, path: String): Array[Array[Double]] =
    centsCache.computeIfAbsent(cacheKey(spark, path), _ =>
      spark.read.parquet(centroidsPath(path))
        .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
        .orderBy(col("cell")).collect()
        .map(r => r.getSeq[Double](1).toArray))

  /** All parquet data files under `root` — the pinned snapshot each call
    * reads so its own append can't leak into the batch being deduped
    * (the [[graft.text.IncrementalDedup]] device).
    */
  private def listFiles(spark: SparkSession, root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString
    }
    buf.toSeq
  }

  /** Compact the state: rewrite the accumulated per-batch append files
    * into O(1) files per cell ([[graft.text.IncrementalDedup.compactIndex]]
    * contract; the cell layout is fixed by the frozen quantizer so there
    * is no re-bucketing knob here). Row-set preserved exactly
    * (require()-guarded); snapshot pinned and materialized before the
    * overwrite.
    */
  def compactIndex(spark: SparkSession, path: String): Unit = {
    val snap = listFiles(spark, statePath(path))
    if (snap.isEmpty) return
    val stSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__vec", ArrayType(DoubleType)),
      StructField("__c", IntegerType)))
    val all = spark.read.schema(stSchema).parquet(snap: _*)
      .withColumn("__cell", col("__c"))
    // row-conservation proof from parquet footers — exact, driver-side,
    // no count() scans bracketing the rewrite
    val before = graft.sources.Partitioned.footerRowCountFiles(spark, snap)
    val pinned = all.repartition(col("__cell")).localCheckpoint(true)
    pinned.write.mode("overwrite").partitionBy("__cell")
      .parquet(statePath(path))
    val after = graft.sources.Partitioned.footerRowCount(
      spark, statePath(path))
    require(after == before,
      s"compaction changed the state row set: $before -> $after rows")
  }

  /** Delete residents from the persisted state — the right-to-be-
    * forgotten op for the semantic tier (the x136/x137 contract on the
    * embedding index): erased docs' resident vectors are removed so
    * future semantic duplicates of the erased content readmit. The
    * deletion input carries the vectors — assignment against the FROZEN
    * centroids prunes the read to touched cells, the same pure argmin
    * the ingest used to place them. Drop-then-append per touched cell:
    * cells deleted to empty vanish rather than keeping stale files;
    * untouched cells stay byte-identical. Returns the number of
    * residents actually removed (ids with no state count zero).
    */
  def deleteFromIndex(
      spark: SparkSession,
      path: String,
      docs: DataFrame,
      idCol: String,
      vecCol: String): Long = {
    val snap = listFiles(spark, statePath(path))
    if (snap.isEmpty) return 0L
    val cents = centroids(spark, path)
    val del = docs
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__vec"))
      .withColumn("__c", Ivf.probeCells(col("__vec"), cents, 1).getItem(0))
      .localCheckpoint()
    val touched = del.select(col("__c")).distinct()
      .collect().map(_.getInt(0)).toSet
    val touchedSnap = snap.filter(f =>
      touched.exists(c => f.contains(s"__cell=$c/")))
    if (touchedSnap.isEmpty) return 0L
    val stSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__vec", ArrayType(DoubleType)),
      StructField("__c", IntegerType)))
    val resident = spark.read.schema(stSchema).parquet(touchedSnap: _*)
    // whole files are read, so the pre-image count is footer metadata
    val before = graft.sources.Partitioned.footerRowCountFiles(
      spark, touchedSnap)
    // materialize survivors BEFORE dropping the directories they read
    val kept = resident.join(del.select(col("__id")), Seq("__id"), "left_anti")
      .withColumn("__cell", col("__c"))
      .repartition(col("__cell"))
      .localCheckpoint(true)
    val after = kept.count()
    val fs = new org.apache.hadoop.fs.Path(statePath(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { c =>
      val dir = new org.apache.hadoop.fs.Path(s"${statePath(path)}/__cell=$c")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    if (after > 0)
      kept.write.mode("append").partitionBy("__cell").parquet(statePath(path))
    before - after
  }

  /** Spark-`round`-compatible 6 dp half-up rounding (BigDecimal over the
    * exact binary expansion — the same arithmetic `round(col, 6)`
    * performs, so the in-task decision replays as `round(cos, 6)` SQL).
    */
  private def round6(x: Double): Double =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Semantic-dedup one ingest batch against the persisted index at
    * `path`, append the survivors' vectors, and return the surviving
    * rows (batch columns unchanged). First call on an empty `path`
    * trains and freezes the quantizer on the batch — the bootstrap batch
    * IS the initial corpus. `idCol` must be unique within the batch and
    * across batches.
    */
  def dedupIncremental(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      threshold: Double,
      nClusters: Int = 8,
      seed: Long = 7L): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"need threshold in (0,1]: $threshold")
    val spark = batch.sparkSession
    import spark.implicits._
    val cents: Array[Array[Double]] =
      if (indexExists(spark, path)) centroids(spark, path)
      else {
        val c = SemDedup.trainCentroids(batch, idCol, vecCol, nClusters, seed)
        c.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
          .toDF("cell", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
        centsCache.put(cacheKey(spark, path), c)
        c
      }
    val assigned = batch
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__vec"))
      .withColumn("__c", Ivf.probeCells(col("__vec"), cents, 1).getItem(0))
    // pinned pre-append snapshot, pruned to the batch's touched cells
    // (cell dirs carry the partition value; untouched cells never read)
    val touched = assigned.select(col("__c")).distinct()
      .collect().map(_.getInt(0)).toSet
    val snap = listFiles(spark, statePath(path))
    val touchedSnap = snap.filter(f =>
      touched.exists(c => f.contains(s"__cell=$c/")))
    val stSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__vec", ArrayType(DoubleType)),
      StructField("__c", IntegerType)))
    val resident =
      if (touchedSnap.nonEmpty)
        spark.read.schema(stSchema).parquet(touchedSnap: _*)
          .select(col("__id"), col("__vec"), col("__c"), lit(true).as("__res"))
      else assigned.limit(0).withColumn("__res", lit(true))
    val thr = threshold
    // ONE cell-keyed shuffle; the greedy keep-first chain runs per cell
    // with the kept-set seeded by the residents
    val survivorIds = resident
      .unionByName(assigned.withColumn("__res", lit(false)))
      .repartition(math.max(touched.size, 1), col("__c"))
      .as[(Long, Seq[Double], Int, Boolean)]
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.flatMap { case (_, rows) =>
          def vn(v: Array[Double]): Double = {
            var s = 0.0; var i = 0
            while (i < v.length) { s += v(i) * v(i); i += 1 }
            math.sqrt(s)
          }
          val kept = scala.collection.mutable.ArrayBuffer.from(
            rows.filter(_._4).map { r =>
              val v = r._2.toArray; (v, vn(v))
            })
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.filter(!_._4).sortBy(_._1).foreach { case (id, vs, _, _) =>
            val v = vs.toArray
            val n = vn(v)
            val dup = kept.exists { case (k, kn) =>
              var s = 0.0; var i = 0
              while (i < v.length) { s += v(i) * k(i); i += 1 }
              val d = n * kn
              val c = if (d > 0) s / d else 0.0
              round6(c) >= thr
            }
            if (!dup) { kept += ((v, n)); out += id }
          }
          out.iterator
        }
      }
      .toDF("__id")
    // cache for the duration of the append only (the IncrementalDedup
    // lifetime contract), then release
    val survivors = assigned
      .join(survivorIds, Seq("__id"), "left_semi").cache()
    try {
      survivors
        .select(col("__id"), col("__vec"), col("__c"),
          col("__c").as("__cell"))
        .repartition(math.max(touched.size, 1), col("__cell"))
        .write.mode("append").partitionBy("__cell").parquet(statePath(path))
    } finally survivors.unpersist(blocking = false)
    // read-back return path: the survivors ARE what the append just
    // persisted (pre-append snapshot diff) — consumers re-run an
    // O(batch) semi-join, never the greedy chain
    val newFiles =
      (listFiles(spark, statePath(path)).toSet -- snap.toSet).toSeq
    if (newFiles.isEmpty) batch.filter(lit(false))
    else batch.join(
      spark.read.schema(StructType(Seq(StructField("__id", LongType))))
        .parquet(newFiles: _*).select(col("__id").as(idCol)),
      Seq(idCol), "left_semi")
  }
}
