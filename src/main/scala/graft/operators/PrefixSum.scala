package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global running totals over a total order — the distributed
  * prefix-sum primitive behind budgeted data selection ("take the best
  * documents until the token budget is spent"), curriculum ordering and
  * cumulative mixing reports.
  *
  * The naive spelling — `sum(v) OVER (ORDER BY …)` with no PARTITION BY
  * — collapses the corpus into ONE task (the global-window trap the
  * Spark guide warns about). This is instead the weighted extension of
  * the x107 `globalShuffle` two-pass device: a sampled RANGE sort gives
  * every reducer a slice of the total order, a light first pass sums
  * each sorted partition's values (numPartitions longs — bounded driver
  * state), the driver folds exclusive offsets, and the second pass
  * streams each partition accumulating offset + local running value.
  * Range partitions are ordered and disjoint, so the result is a pure
  * function of the total order — sampled boundaries (and re-runs on any
  * cluster layout) never change it. The sorted frame is persisted across
  * the two passes, so the offsets are computed against the SAME physical
  * partitioning the output pass reads — without the pin, each action
  * re-plans the exchange and resamples range boundaries independently,
  * and offset correctness would ride on both samples landing identical
  * (deterministic on a quiet input, but layout-lucky, not layout-proof).
  * The returned frame is local-checkpointed (eager) so the input cache
  * can be released before returning; its storage bound is the same
  * O(rows) as the sort itself. At extreme scale, write the result to
  * storage immediately — the checkpoint blocks are the transient copy.
  */
object PrefixSum {

  /** Appends `outCol` = the inclusive running total of `valueCol` (cast
    * to long — exact integer arithmetic end to end) over the total
    * order `order` (sort expressions, direction included; make the key
    * unique — e.g. end with the id — so the order is total).
    */
  def runningTotal(
      df: DataFrame,
      order: Seq[Column],
      valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__v", col(valueCol).cast("long"))
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vIdx = sorted.schema.fieldIndex("__v")
      val partials = sorted.mapPartitions { it =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((TaskContext.getPartitionId(), s))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
        .collect().toMap
      val maxP = if (partials.isEmpty) -1 else partials.keys.max
      val offsets = (0 to maxP).scanLeft(0L)((acc, p) =>
        acc + partials.getOrElse(p, 0L)).toArray
      val bc = spark.sparkContext.broadcast(offsets)
      val outSchema = StructType(sorted.schema.fields :+
        StructField(outCol, LongType, nullable = false))
      // eager: materializes the second pass against the pinned cache, so
      // the finally below can release it without exposing callers to a
      // resampled re-execution
      sorted.mapPartitions { it =>
        val off = bc.value(TaskContext.getPartitionId())
        var running = 0L
        it.map { r =>
          running += r.getLong(vIdx)
          Row.fromSeq(r.toSeq :+ (off + running))
        }
      }(Encoders.row(outSchema)).drop("__v").localCheckpoint()
    } finally sorted.unpersist(blocking = false)
  }
}
