package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll

/** HyperLogLog sketch: estimate accuracy in the harmonic regime, the
  * linear-counting small-range branch, and lossless merge.
  */
class HllSpec extends SparkSpec {

  test("harmonic-regime estimate lands within the published error band") {
    import spark.implicits._
    // 5000 distinct keys, p=7 (m=128): expected rel. error ~1.04/sqrt(m)
    // ≈ 9.2%; assert a generous 3-sigma 30%
    val df = (0 until 5000).map(i => ("g", s"key$i")).toDF("g", "k")
    val est = Hll.estimateBy(Hll.registersBy(df, Seq("g"), "k", p = 7),
      Seq("g"), p = 7)
      .select(col("hll_estimate")).head().getDouble(0)
    assert(math.abs(est - 5000) / 5000.0 < 0.30, s"estimate $est")
  }

  test("small-range branch uses linear counting") {
    import spark.implicits._
    val df = (0 until 20).map(i => ("g", s"key$i")).toDF("g", "k")
    val row = Hll.estimateBy(Hll.registersBy(df, Seq("g"), "k", p = 7),
      Seq("g"), p = 7)
      .select(col("n_present"), col("v_zero"), col("hll_estimate")).head()
    val (n, v, est) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(n <= 20 && v == 128 - n)
    // the branch is m*ln(m/V) exactly
    assert(math.abs(est - 128.0 * math.log(128.0 / v)) < 1e-9)
    assert(math.abs(est - 20) / 20.0 < 0.35, s"estimate $est")
  }

  test("duplicate keys do not move the registers") {
    import spark.implicits._
    val once = (0 until 100).map(i => ("g", s"k$i")).toDF("g", "k")
    val thrice = (0 until 300).map(i => ("g", s"k${i % 100}")).toDF("g", "k")
    val a = Hll.registersBy(once, Seq("g"), "k", p = 6)
      .orderBy("__idx").collect().toSeq
    val b = Hll.registersBy(thrice, Seq("g"), "k", p = 6)
      .orderBy("__idx").collect().toSeq
    assert(a == b)
  }

  test("merge of two halves is bit-identical to the whole") {
    import spark.implicits._
    val all = (0 until 2000).map(i => ("g", s"key$i")).toDF("g", "k")
    val lo = all.filter(col("k") < "key5") // lexicographic split
    val hi = all.filter(col("k") >= "key5")
    val whole = Hll.registersBy(all, Seq("g"), "k", p = 7)
      .orderBy("__idx").collect().toSeq
    val merged = Hll.merge(
      Seq(Hll.registersBy(lo, Seq("g"), "k", p = 7),
        Hll.registersBy(hi, Seq("g"), "k", p = 7)), Seq("g"))
      .orderBy("__idx").collect().toSeq
    assert(merged == whole)
  }
}
