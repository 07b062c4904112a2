package graft

import org.apache.spark.sql.functions._

import graft.functions.{ArrayDot, HashRandom}

/** The native codegen'd dot product must agree bit-for-bit with the
  * composed `aggregate(zip_with(...))` form it replaced (same summation
  * order), in both codegen and interpreted evaluation.
  */
class ArrayDotSpec extends SparkSpec {

  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, d) => acc + d)

  test("matches the composed HOF form bit-for-bit on float arrays") {
    import spark.implicits._
    val rows = (0 until 50).map { i =>
      (i.toLong,
        Array.tabulate(64)(j => HashRandom.gaussian(1L, i.toLong, j.toLong).toFloat),
        Array.tabulate(64)(j => HashRandom.gaussian(2L, i.toLong, j.toLong).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
      (ArrayDot(col("a"), col("b")) - composed(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0, s"codegen vs composed diff $diff")
  }

  test("double arrays and mixed float/double work") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(ArrayDot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 32.0)
  }

  test("null element or length mismatch yields null (zip_with parity)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (2L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](1.0, 2.0))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), ArrayDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> true, 2L -> true))
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    import spark.implicits._
    val rows = (0 until 10).map { i =>
      (i.toLong, Array.tabulate(16)(j => HashRandom.gaussian(5L, i.toLong, j.toLong)),
        Array.tabulate(16)(j => HashRandom.gaussian(6L, i.toLong, j.toLong)))
    }
    val df = rows.toDF("id", "a", "b")
    val on = df.select(ArrayDot(col("a"), col("b"))).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = df.select(ArrayDot(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(on.toSeq == off.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("Md5Pack matches conv(substring(md5)) for both halves, codegen and interpreted") {
    import spark.implicits._
    import graft.functions.Md5Pack
    val texts = Seq("", "a", "hello", "five!", "  spaces  ", "émoji ✓ ünïcode",
      "0123456789abcdef0123456789abcdef", "\n\t", "べんち") ++
      (0 until 50).map(i => s"shingle-$i-${"x" * (i % 7)}")
    val df = texts.toDF("s")
    val p2 = Md5Pack(col("s"))
    val m = md5(col("s"))
    val bad = df.select(
      (shiftrightunsigned(p2, 32) - conv(substring(m, 1, 8), 16, 10).cast("long")).as("da"),
      (p2.bitwiseAND(lit(0xFFFFFFFFL)) - conv(substring(m, 9, 8), 16, 10).cast("long")).as("db"))
      .filter(col("da") =!= 0 || col("db") =!= 0).count()
    assert(bad == 0, s"$bad rows disagree with the composed md5 form")
    // interpreted path (no codegen): evaluate via a HOF lambda binding
    val viaHof = df.select(element_at(transform(array(col("s")),
      s2 => Md5Pack(s2)), 1).as("p")).collect().map(_.getLong(0))
    val direct = df.select(p2.as("p")).collect().map(_.getLong(0))
    assert(viaHof.toSeq == direct.toSeq, "interpreted eval must match codegen")
  }
}
