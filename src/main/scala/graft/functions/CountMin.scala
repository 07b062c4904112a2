package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") as a
  * DataFrame aggregate: `depth` independent hash rows × `width` counters;
  * a key's estimate is the MIN of its `depth` counters — an
  * overestimate by at most `εN` with the usual `(ε, δ)` bounds
  * (`width = e/ε`, `depth = ln(1/δ)`).
  *
  * Everything is deterministic and order-independent: the row hashes are
  * the md5 device (`md5("<seed>:<row>:<key>")`, bit-replayable in
  * DuckDB), and counter cells are plain sums — so unlike HLL/t-digest
  * blobs this sketch's estimates carry a FULL cross-engine oracle. Scale
  * shape: building is one map-side expansion of `depth` (row, bucket)
  * pairs per occurrence followed by a bounded aggregate (≤ depth×width
  * rows out, map-side partial combine); estimating a probe set joins the
  * probes' bucket coordinates against the sketch frame.
  */
object CountMin {

  /** Bucket of `key` in hash row `r`: first 8 md5 hex digits of
    * `"<seed>:<r>:<key>"` mod `width`.
    */
  def bucket(seed: Long, row: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":",
      lit(seed.toString), lit(row.toString), key)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the sketch over a key column: `(__row, __bucket, __count)`,
    * at most `depth × width` rows.
    */
  def sketch(
      df: DataFrame, keyCol: String,
      depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth > 0 && width > 0, s"need depth>0, width>0: $depth $width")
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("__row"),
          bucket(seed, r, col(keyCol), width).as("__bucket"))): _*)).as("__rb"))
      .select(col("__rb.__row").as("__row"), col("__rb.__bucket").as("__bucket"))
      .groupBy(col("__row"), col("__bucket"))
      .agg(count(lit(1)).as("__count"))
  }

  /** Merge sketches built with identical `(depth, width, seed)`: CMS is
    * a LINEAR sketch — cell-wise counter ADDITION yields exactly the
    * sketch of the concatenated streams (Cormode & Muthukrishnan §4.1),
    * so daily sketch files roll up into monthly/yearly ones without
    * rescanning any text. Same persisted-rollup contract as
    * [[Hll.merge]], but exact rather than register-max: the merged
    * counters are bit-identical to a direct build over the union, which
    * is what x131 require()-checks at runtime.
    */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("__row"), col("__bucket"))
      .agg(sum(col("__count")).as("__count"))
  }

  /** Point estimates for a probe-key frame against a built sketch:
    * appends `cm_estimate` (the min counter over the `depth` rows; 0 if
    * every row's bucket is empty). The probe side is exploded to its
    * (row, bucket) coordinates and joined against the sketch — the
    * sketch frame is depth×width-bounded, so AQE broadcasts it.
    */
  def estimate(
      probes: DataFrame, keyCol: String, cms: DataFrame,
      depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth > 0 && width > 0, s"need depth>0, width>0: $depth $width")
    val coords = probes
      .select(col(keyCol), explode(array((0 until depth).map(r =>
        struct(lit(r).as("__row"),
          bucket(seed, r, col(keyCol), width).as("__bucket"))): _*)).as("__rb"))
      .select(col(keyCol), col("__rb.__row").as("__row"),
        col("__rb.__bucket").as("__bucket"))
    coords
      .join(broadcast(cms), Seq("__row", "__bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__count"), lit(0L))).as("cm_estimate"))
  }
}
