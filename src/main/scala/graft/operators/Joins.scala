package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference's pandas workflow gets from
  * `pd.merge_asof` / boolean-mask slicing and Spark lacks as built-ins:
  * backward as-of join and bounded interval (range) join.
  *
  * Both are written against the scale contract, not the local fixture:
  *
  *  - [[asofJoin]] is the merge-sort + last-observation-carried-forward
  *    formulation (the classic tick-data "ticker join"): tag both inputs,
  *    union, and run ONE window pass per key ordered by time. Cost is a
  *    single hash shuffle on the join keys plus a per-partition sort —
  *    identical shape to any windowed aggregate — and never materializes
  *    candidate pairs, so a key with a million left rows and a million
  *    right rows streams through in O(n log n) instead of the O(n·m) a
  *    naive `l.ts >= r.ts` theta-join plans as (Spark executes that as
  *    BroadcastNestedLoop/cartesian — the #1 range-join scale killer).
  *  - [[rangeJoin]] buckets both sides by `floor(time / width)` so each
  *    left row meets only the right rows of its own and the previous
  *    bucket — candidates are bounded by 2× the per-bucket density, never
  *    the whole key group. The equi-join on (keys, bucket) hash-partitions
  *    like any join; AQE can still broadcast or skew-split it.
  *
  * Time columns are integer epochs (this repo's `events.ts` is epoch-nanos
  * per `Tables.events`); widths/tolerances are in the same unit and must
  * be positive. Bucket arithmetic uses floored integer division, correct
  * for negative epochs too.
  */
object Joins {

  /** Floored integer division as a Column (Spark's `div` truncates toward
    * zero, which would mis-bucket negative epochs).
    */
  private def floorDiv(c: Column, width: Long): Column = {
    val q = c.cast("long")
    val d = lit(width)
    (q - ((q % d) + d) % d) / d
  }

  /** As-of join, the full `pd.merge_asof(allow_exact_matches=True)`
    * contract: every `left` row picks one `right` row on equal `keys` —
    *
    *  - `direction = "backward"` (default): the latest right row with
    *    `right.time <= left.time`;
    *  - `"forward"`: the earliest right row with `right.time >= left.time`;
    *  - `"nearest"`: whichever of the two is closer in time (tie →
    *    backward)
    *
    * — optionally discarding matches farther than `tolerance`.
    *
    * Output = all `left` columns, plus each requested right `payload`
    * column as `asof_<name>`, plus `asof_staleness` (|left time − matched
    * right time|, same unit; null when no match within tolerance).
    *
    * Payload columns ride in ONE struct so the carried values always come
    * from the same right row, even when individual payload fields are
    * null. Ties: a right row at exactly the left row's time IS visible
    * (sorts before the left row); multiple right rows sharing one
    * timestamp resolve to the greatest `rightOrder` — a total order both
    * engines and re-runs agree on. Cost model in the header holds for all
    * three directions: `nearest` runs a second window ordering over the
    * SAME exchange (one extra sort, still zero joins).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightOrder: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")

    val lCols = left.columns.toSeq
    val payStruct = struct(
      col(rightTime).cast("long").as("__rt") +:
        col(rightOrder).cast("long").as("__rord") +:
        payload.map(p => col(p).as(p)): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("__t"),
        lit(0).as("__is_l"),
        payStruct.as("__pay")) ++
        // left-only columns, typed nulls, so unionByName lines up
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSide = left.select(
      lCols.map(col) ++ Seq(
        col(leftTime).cast("long").as("__t"),
        lit(1).as("__is_l"),
        lit(null).cast(rSide.schema("__pay").dataType).as("__pay")): _*)
    val unioned = lSide.unionByName(rSide)

    // Backward scan: ascending time; right rows sort before left rows at
    // equal time (exact matches count), __rord breaks right-vs-right ties
    // so `last` lands on the greatest. Forward scan: the time axis
    // reversed — the "last seen" right row is then the EARLIEST one
    // at-or-after the left row; __is_l/__rord orderings are unchanged
    // (rights still precede lefts at equal time, max __rord still wins).
    def carry(asc: Boolean): Column = {
      val t = if (asc) col("__t").asc else col("__t").desc
      val w = Window
        .partitionBy(keys.map(col): _*)
        .orderBy(t, col("__is_l").asc,
          coalesce(col("__pay.__rord"), lit(Long.MaxValue)).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__pay"), ignoreNulls = true).over(w)
    }
    // per-side distance (nonnegative by construction), gated by tolerance
    def pick(m: Column, dist: Column): Column = {
      val ok = tolerance match {
        case Some(tol) => m.isNotNull && dist <= lit(tol)
        case None      => m.isNotNull
      }
      when(ok, m)
    }
    val chosen = direction match {
      case "backward" =>
        val m = carry(asc = true)
        pick(m, col("__t") - m.getField("__rt"))
      case "forward" =>
        val m = carry(asc = false)
        pick(m, m.getField("__rt") - col("__t"))
      case "nearest" =>
        val b = pick(carry(asc = true),
          col("__t") - carry(asc = true).getField("__rt"))
        val f = pick(carry(asc = false),
          carry(asc = false).getField("__rt") - col("__t"))
        val db = col("__t") - b.getField("__rt")
        val df = f.getField("__rt") - col("__t")
        when(b.isNotNull && (f.isNull || db <= df), b).otherwise(f)
    }
    val carried = unioned.withColumn("__m", chosen)
    val dist = abs(col("__t") - col("__m.__rt"))
    carried
      .filter(col("__is_l") === 1)
      .select(
        lCols.map(col) ++
          payload.map(p => col("__m").getField(p).as(s"asof_$p")) :+
          dist.as("asof_staleness"): _*)
  }

  /** Bounded interval join: inner-join pairs `(l, r)` with equal `keys`
    * and `r.rightTime ∈ (l.leftTime − width, l.leftTime]` — "everything
    * that happened in the `width` before each left row".
    *
    * Each left row probes exactly two buckets (its own and the previous),
    * which together cover the whole half-open window; the exact range
    * predicate then trims the bucket slop. Column layout: all left
    * columns, plus each right `payload` column as `r_<name>` (callers
    * aggregate from there).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      width: Long,
      payload: Seq[String]): DataFrame = {
    require(width > 0, s"rangeJoin width must be positive, got $width")
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("__lt", col(leftTime).cast("long"))
      .withColumn("__b", explode(array(
        floorDiv(col(leftTime).cast("long"), width) - 1,
        floorDiv(col(leftTime).cast("long"), width))))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("__rt"),
        floorDiv(col(rightTime).cast("long"), width).as("__b")) ++
        payload.map(p => col(p).as(s"r_$p")): _*)
    l.join(r, keys :+ "__b")
      .filter(col("__rt") > col("__lt") - lit(width) &&
        col("__rt") <= col("__lt"))
      .select(lCols.map(col) ++ payload.map(p => col(s"r_$p")): _*)
  }

  /** Skew-safe equi-join: salt the (big, skewed) `left` side into `salt`
    * sub-keys and replicate every `right` row once per sub-key, so a hot
    * key's rows spread over `salt` reducers instead of piling onto one
    * straggler. Results are exactly a plain `left.join(right, keys,
    * joinType)` — salting only changes the partitioning.
    *
    * When to reach for it: AQE's skew-join handling already splits
    * oversized SORT-MERGE partitions at runtime, but it cannot help a
    * shuffled hash join it has no stats for, a skewed `groupBy` feeding
    * the join, or a deliberately AQE-less pipeline — this is the static
    * remedy. Cost: the right side is materialized `salt`× (keep `salt`
    * small and the right side slim); the left side gains one narrow
    * column. The left row's sub-key is a deterministic hash of its whole
    * row (not a `rand()`), so retries/speculative tasks land identically.
    *
    * Supported joinTypes: the left-preserving ones (`inner`, `left`,
    * `left_semi`, `left_anti`, `cross` excluded) — right/full-outer would
    * emit one unmatched-right row PER salt replica and are rejected.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports left-preserving joins only, got $joinType")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
