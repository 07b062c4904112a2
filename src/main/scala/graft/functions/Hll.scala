package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet & Meunier
  * 2007, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm") as a DataFrame aggregate: `m = 2^p` registers,
  * each holding the maximum "rank" (leading-zero run + 1) seen among the
  * hashed keys routed to it; the estimate is the bias-corrected harmonic
  * mean `α_m · m² / Σ 2^{-M_j}` with the small-range linear-counting
  * correction (`m·ln(m/V)` when `E ≤ 2.5m` and `V` registers are empty).
  *
  * Everything is deterministic and engine-portable — the sibling of
  * [[CountMin]] in the oracle-replayable-sketch family:
  *  - the 48-bit hash is the md5 device (`conv(substring(md5(...)))`),
  *  - ranks come from `bin()` string length (both Spark and DuckDB print
  *    minimal binary), no float log2,
  *  - `Σ 2^{-M_j}` sums exact powers of two spanning < 53 bits of
  *    mantissa, so the double sum is EXACT and order-independent,
  *  - `ln` parity between the JVM and DuckDB libm is the precedent
  *    established by the x36 cross-entropy oracle.
  *
  * Scale shape: building is one narrow map (hash → (idx, rank)) and one
  * bounded aggregate (≤ m rows per group after map-side combine; register
  * maxima are commutative so partials combine losslessly) — the classic
  * mergeable-sketch contract: per-partition register frames union +
  * re-max into the corpus sketch without re-reading keys ([[merge]]).
  * An exact `count(DISTINCT …)` at 100 TB shuffles every distinct key;
  * this shuffles ≤ m longs per group.
  */
object Hll {

  /** Hash-space width in bits: 12 md5 hex digits. 48 bits keeps the
    * value exact in a signed BIGINT on both engines; collisions matter
    * only past ~2^24 distinct keys per group — beyond that, shard groups
    * or raise to 15 digits (60 bits).
    */
  val HashBits = 48

  /** 48-bit key hash: first 12 md5 hex digits of `"<seed>:<key>"`. */
  def hash48(key: Column, seed: Long): Column =
    conv(substring(md5(concat_ws(":", lit(seed.toString), key)), 1, 12), 16, 10)
      .cast("long")

  /** Bias-correction constant `α_m` (the published values for small m,
    * the asymptotic form from m = 128).
    */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-group register frame `(groupCols…, __idx, __rank)`: register
    * index = top `p` hash bits, rank = leading-zero run in the remaining
    * `48-p` bits + 1 (an all-zero tail ranks `48-p+1`), register value =
    * max rank. Duplicate keys are absorbed by the max — no distinct
    * needed upstream.
    */
  def registersBy(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      p: Int,
      seed: Long = 7L): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16]: $p")
    val tailBits = HashBits - p
    val h = hash48(col(keyCol), seed)
    val idx = shiftrightunsigned(h, tailBits).as("__idx")
    val w = pmod(h, lit(1L << tailBits))
    val rank = when(w === 0L, lit(tailBits + 1))
      .otherwise(lit(tailBits + 1) - length(bin(w))).as("__rank")
    df.select(groupCols.map(col) :+ idx :+ rank: _*)
      .groupBy((groupCols :+ "__idx").map(col): _*)
      .agg(max(col("__rank")).as("__rank"))
  }

  /** Merge register frames (per-partition / per-day sketches → corpus
    * sketch): union + re-max. Lossless — merging sketches of two halves
    * yields bit-identical registers to sketching the union.
    */
  def merge(regs: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    regs.reduce(_.unionByName(_))
      .groupBy((groupCols :+ "__idx").map(col): _*)
      .agg(max(col("__rank")).as("__rank"))

  /** Cardinality estimates from a register frame:
    * `(groupCols…, n_present, v_zero, harmonic_sum, hll_estimate)`.
    * `harmonic_sum` is the exact dyadic `Σ 2^{-M_j}` (empty registers
    * contribute 1); `hll_estimate` applies the linear-counting branch
    * when `E_raw ≤ 2.5m` and zeros exist.
    */
  def estimateBy(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val a = alpha(m)
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_present"),
        sum(pow(lit(2.0), -col("__rank"))).as("__sp"))
    val s = col("__sp") + (lit(m.toDouble) - col("n_present"))
    val v = lit(m.toLong) - col("n_present")
    val eRaw = lit(a * m * m) / s
    val est = when(eRaw <= lit(2.5 * m) && v > 0L,
      lit(m.toDouble) * log(lit(m.toDouble) / v))
      .otherwise(eRaw)
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n_present"),
        v.as("v_zero"),
        s.as("harmonic_sum"),
        est.as("hll_estimate")): _*)
  }
}
