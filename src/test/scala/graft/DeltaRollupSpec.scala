package graft

import org.apache.spark.sql.functions._

import graft.operators.DeltaRollup

/** Incremental rollup: delta maintenance equals recompute, retraction to
  * zero drops keys, order of key-disjoint batches cannot matter.
  */
class DeltaRollupSpec extends SparkSpec {

  private def freshPath(): String = {
    val p = s"${Scratch.sub("rollup-test")}/${java.util.UUID.randomUUID()}"
    DeltaRollup.drop(spark, p)
    p
  }

  private def summary(path: String): Map[String, (Long, Long)] =
    DeltaRollup.read(spark, path).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("insert then retract maintains exactly the recompute; zeroed keys vanish") {
    import spark.implicits._
    val path = freshPath()
    val b1 = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "w")
      .withColumn("__op", lit(1))
    DeltaRollup.applyBatch(b1, path, Seq("k"), "__op", col("w"))
    assert(summary(path) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))
    // retract one 'a' row and ALL of 'b' — b must disappear entirely
    val b2 = Seq(("a", 10L), ("b", 5L)).toDF("k", "w")
      .withColumn("__op", lit(-1))
    DeltaRollup.applyBatch(b2, path, Seq("k"), "__op", col("w"))
    assert(summary(path) == Map("a" -> ((1L, 20L))))
  }

  test("mixed ops within one batch net out; disjoint batch order is irrelevant") {
    import spark.implicits._
    def run(batches: Seq[org.apache.spark.sql.DataFrame]): Map[String, (Long, Long)] = {
      val p = freshPath()
      batches.foreach(DeltaRollup.applyBatch(_, p, Seq("k"), "__op", col("w")))
      summary(p)
    }
    val x = Seq(("a", 3L, 1), ("a", 3L, -1), ("a", 7L, 1)).toDF("k", "w", "__op")
    val y = Seq(("c", 2L, 1), ("c", 4L, 1)).toDF("k", "w", "__op")
    val xy = run(Seq(x, y))
    val yx = run(Seq(y, x))
    assert(xy == yx, s"$xy != $yx")
    assert(xy == Map("a" -> ((1L, 7L)), "c" -> ((2L, 6L))))
  }

  test("over-retraction reports the honest negative net, not a silent clamp") {
    import spark.implicits._
    val path = freshPath()
    val b = Seq(("a", 9L)).toDF("k", "w").withColumn("__op", lit(-1))
    DeltaRollup.applyBatch(b, path, Seq("k"), "__op", col("w"))
    assert(summary(path) == Map("a" -> ((-1L, -9L))))
  }
}
