package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-based MERGE INTO (upsert) for a partitioned parquet table — the
  * lakehouse primitive a re-crawl corpus needs (SQL MERGE / Delta's
  * `MERGE INTO`, re-expressed on plain parquet): rows in the update
  * batch REPLACE base rows with the same key, unmatched update rows
  * INSERT, and only the partitions the merge actually touches are
  * rewritten.
  *
  * Correctness subtlety the naive spelling misses: an update may MOVE a
  * row across partitions (a re-crawled doc changes source). Rewriting
  * only the updates' TARGET partitions would leave the old copy alive in
  * its current partition — a silent duplicate. So the merge first
  * locates each update key's CURRENT partition with an ids-only
  * column-pruned scan of the base (key + partition column — never the
  * payload), and the touched set is the union of current and target
  * partitions.
  *
  * Scale shape: one ids-only base scan (two columns), one join of
  * |updates| keys, then a rewrite confined to touched partitions
  * (drop-then-append — the deleteFromIndex device: a partition drained
  * by moves vanishes instead of keeping stale files; untouched
  * partition directories stay byte-identical). Update batches are small
  * relative to the table by nature, so the rewrite is O(touched), not
  * O(table). Idempotent: re-applying the same batch replaces rows with
  * identical content and inserts nothing.
  */
object Upsert {

  /** Merge `updates` into the partitioned table at `path`. `updates`
    * must carry the table's full schema including `partCol` (the target
    * partition). Returns `(updated, inserted)` row counts.
    */
  def mergeInto(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keyCol: String,
      partCol: String): (Long, Long) = {
    // ids-only scan locates each update key's CURRENT partition (the
    // cross-partition-move case); pinned — the rewrite replaces its source
    val baseKeys = spark.read.parquet(path)
      .select(col(keyCol), col(partCol).cast("string").as("__cur"))
    val located = updates
      .select(col(keyCol), col(partCol).cast("string").as("__new"))
      .join(baseKeys, Seq(keyCol), "left")
      .localCheckpoint()
    val updated = located.filter(col("__cur").isNotNull).count()
    val inserted = located.filter(col("__cur").isNull).count()
    val touched = located
      .select(explode(array(col("__cur"), col("__new"))).as("__p"))
      .filter(col("__p").isNotNull)
      .distinct().collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return (0L, 0L)
    // touched partitions: survivors (base minus updated keys) + the
    // update rows — materialized BEFORE the directories are dropped
    val kept = spark.read.parquet(path)
      .filter(col(partCol).cast("string").isin(touched.toSeq: _*))
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
    val out = kept.unionByName(updates.select(kept.columns.map(col): _*))
      .repartition(math.max(touched.size, 1), col(partCol))
      .localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { p =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/$partCol=$p")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    out.write.mode("append").partitionBy(partCol).parquet(path)
    (updated, inserted)
  }
}
