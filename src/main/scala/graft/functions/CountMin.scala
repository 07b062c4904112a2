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

  /** Build the sketch over a key column: `(__row, __bucket, __count,
    * __depth, __width, __seed)`, at most `depth × width` rows. The
    * parameter triple travels WITH the counters (the reference-style
    * sketch-format posture: persisted sketch files are self-describing),
    * so a later [[merge]] or [[estimate]] can verify it instead of
    * trusting caller-passed values.
    */
  def sketch(
      df: DataFrame, keyCol: String,
      depth: Int, width: Int, seed: Long): DataFrame =
    sketchBy(df, keyCol, Seq.empty, depth, width, seed)

  /** [[sketch]] with extra grouping columns: one independent sketch per
    * `byCols` group, built in a SINGLE pass over the keys (≤ groups ×
    * depth × width counter rows out, map-side partial combine). Grouped
    * counters are by construction identical to running [[sketch]] once
    * per group slice — the one-pass shape a per-day rollup build wants
    * (three per-day sketches previously cost three corpus tokenization
    * passes; grouped, they cost one).
    */
  def sketchBy(
      df: DataFrame, keyCol: String, byCols: Seq[String],
      depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth > 0 && width > 0, s"need depth>0, width>0: $depth $width")
    df.select(byCols.map(col) :+ explode(array((0 until depth).map(r =>
        struct(lit(r).as("__row"),
          bucket(seed, r, col(keyCol), width).as("__bucket"))): _*)).as("__rb"): _*)
      .select(byCols.map(col) :+ col("__rb.__row").as("__row") :+
        col("__rb.__bucket").as("__bucket"): _*)
      .groupBy((byCols :+ "__row" :+ "__bucket").map(col): _*)
      .agg(count(lit(1)).as("__count"))
      .withColumn("__depth", lit(depth))
      .withColumn("__width", lit(width))
      .withColumn("__seed", lit(seed))
  }

  /** Merge sketches built with identical `(depth, width, seed)`: CMS is
    * a LINEAR sketch — cell-wise counter ADDITION yields exactly the
    * sketch of the concatenated streams (Cormode & Muthukrishnan §4.1),
    * so daily sketch files roll up into monthly/yearly ones without
    * rescanning any text. Same persisted-rollup contract as
    * [[Hll.merge]], but exact rather than register-max: the merged
    * counters are bit-identical to a direct build over the union, which
    * is what x131 require()-checks at runtime. Inputs carrying DIFFERENT
    * parameter triples (mixed-generation sketch files) would add
    * unrelated counters into silently wrong cells — rejected loudly via
    * the persisted `__depth/__width/__seed` columns (one bounded
    * aggregate over ≤ n·depth·width counter rows).
    */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    val all = sketches.reduce(_ unionByName _)
    val metas = all.select(col("__depth"), col("__width"), col("__seed"))
      .distinct().limit(3).collect()
    require(metas.length == 1,
      s"merge over sketches with different (depth, width, seed): " +
        metas.map(r => (r.get(0), r.get(1), r.get(2))).mkString(", "))
    all.groupBy(col("__row"), col("__bucket"))
      .agg(sum(col("__count")).as("__count"),
        first(col("__depth")).as("__depth"),
        first(col("__width")).as("__width"),
        first(col("__seed")).as("__seed"))
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
    // probe coordinates must be computed with the SKETCH's parameters —
    // verify the caller's triple against the persisted one
    if (cms.columns.contains("__depth")) {
      val metas = cms.select(col("__depth"), col("__width"), col("__seed"))
        .distinct().limit(3).collect()
      require(metas.length == 1 && metas.head.getInt(0) == depth &&
        metas.head.getInt(1) == width && metas.head.getLong(2) == seed,
        s"estimate params ($depth, $width, $seed) do not match the " +
          s"sketch's persisted (depth, width, seed): " +
          metas.map(r => (r.get(0), r.get(1), r.get(2))).mkString(", "))
    }
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
