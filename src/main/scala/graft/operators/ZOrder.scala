package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout — the data-layout
  * device behind Delta Lake's `OPTIMIZE ZORDER BY` and Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`:
  * interleaving the bits of several rank-normalized columns gives a
  * 1-D sort key under which points close in EVERY dimension land close
  * in the file order, so a file's (min, max) footer range is tight in
  * ALL z-ordered columns at once and a multi-column box predicate can
  * skip most files. A single-column sort gives perfect pruning on that
  * column and none on the others — the gap x129 measures.
  *
  * Scale shape: one bounded agg pass for the per-column (min, max)
  * normalization literals, one codegen'd bit-interleave projection
  * (shifts/ors — no UDF), one range shuffle (`repartitionByRange` +
  * `sortWithinPartitions`, Spark's sampled range partitioner) and a
  * plain parquet write — exactly one pass over the data, the same cost
  * as any other sorted write. At 100 TB the skipping decisions are made
  * by the engine from parquet footers / table-format stats files;
  * [[fileRangeStats]] materializes those stats as a frame so the
  * benefit is observable (and testable) without a metadata layer.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative long
    * columns into one z-value: bit i of column j lands at position
    * `i * n + (n - 1 - j)` (column 0 owns the most significant bit of
    * each group — earlier columns split the space first, the documented
    * ZORDER BY column-priority contract). Pure column arithmetic, so
    * the whole projection stays inside whole-stage codegen.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "z-order needs at least two columns")
    require(bits * n <= 62, s"$n columns x $bits bits overflow a long")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rank-normalize a numeric column into [0, 2^bits) against fixed
    * (min, max) literals — the bounded driver state of the layout, one
    * pair per column (the stats a table format already keeps).
    */
  def normalize(c: Column, min: Double, max: Double, bits: Int): Column = {
    val hi = (1L << bits) - 1
    if (max <= min) lit(0L)
    else floor((c.cast("double") - lit(min)) * lit(hi.toDouble)
      / lit(max - min)).cast("long")
  }

  /** Append a `__z` Morton key over `cols` (min/max computed in one agg
    * pass and pinned as literals), then range-sort into `nFiles`
    * output partitions — ready for a plain parquet write of `nFiles`
    * z-clustered files. The range shuffle is the single data pass;
    * `sortWithinPartitions` keeps each file internally z-ordered so
    * row-group (not just file) min/max stay tight too.
    */
  def layoutZOrder(
      df: DataFrame, cols: Seq[String], nFiles: Int, bits: Int = 16): DataFrame = {
    val aggs = cols
      .flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      .zipWithIndex.map { case (c, i) => c.as(s"__m$i") }
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val normed = cols.zipWithIndex.map { case (c, j) =>
      normalize(col(c), mm.getDouble(2 * j), mm.getDouble(2 * j + 1), bits)
    }
    df.withColumn("__z", interleaveBits(normed, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Single-column baseline with the identical write shape (same
    * partitioner, same file count) — the contrast arm of the skipping
    * measurement: everything differs only in the sort key.
    */
  def layoutLinear(df: DataFrame, c: String, nFiles: Int): DataFrame =
    df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))

  /** Per-file (min, max) of each column — the parquet-footer / table-
    * format stats a scan planner prunes with, materialized as a frame:
    * one row per file, columns `file`, `<c>_min`, `<c>_max`. The scan
    * reads only the listed columns.
    */
  def fileRangeStats(
      spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(cols.flatMap(c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).head,
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).tail: _*)

  /** How many files a box predicate must touch under the given stats —
    * the pruning decision itself: a file is touched iff its [min, max]
    * intersects the box in EVERY dimension. `box` maps column → (lo, hi)
    * inclusive.
    */
  def filesTouched(stats: DataFrame, box: Map[String, (Double, Double)]): Long = {
    val pred = box.map { case (c, (lo, hi)) =>
      col(s"${c}_max").cast("double") >= lo && col(s"${c}_min").cast("double") <= hi
    }.reduce(_ && _)
    stats.filter(pred).count()
  }
}
