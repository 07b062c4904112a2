package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Morton-interleave arithmetic against hand-computed bit layouts,
  * layout invisibility (the written frame is the input multiset), and
  * the skipping property itself: on a uniform 2-D grid a box predicate
  * touches strictly fewer z-ordered files than single-column-sorted
  * files with the identical write shape.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches the hand-computed Morton layout") {
    // a = 0b10, b = 0b01, 2 bits: a's bit i lands at 2i+1, b's at 2i
    // -> z = a1<<3 | b1<<2 | a0<<1 | b0<<0 = 1000 | 0 | 0 | 1 = 9
    val r = Seq((2L, 1L)).toDF("a", "b")
      .select(ZOrder.interleaveBits(Seq(col("a"), col("b")), 2).as("z"))
      .head().getLong(0)
    assert(r == 9L, s"z(0b10, 0b01) = $r, want 9")
    // three columns, 1 bit each: col 0 owns the MSB of the group
    val r3 = Seq((1L, 0L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.interleaveBits(
        Seq(col("a"), col("b"), col("c")), 1).as("z"))
      .head().getLong(0)
    assert(r3 == 5L, s"z(1,0,1) = $r3, want 0b101")
  }

  test("normalize maps [min,max] onto [0, 2^bits) inclusive of both ends") {
    val vals = Seq(0L, 50L, 100L).toDF("v")
      .select(ZOrder.normalize(col("v"), 0.0, 100.0, 4).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(0L, 7L, 15L), s"got $vals")
    // degenerate range: everything lands on 0 rather than dividing by 0
    val flat = Seq(5L).toDF("v")
      .select(ZOrder.normalize(col("v"), 5.0, 5.0, 4).as("n"))
      .head().getLong(0)
    assert(flat == 0L)
  }

  test("z-order layout preserves the row multiset and skips more files than a linear sort") {
    // uniform 64x64 grid, one row per cell
    val grid = spark.range(0, 4096)
      .select((col("id") / 64).cast("long").as("x"),
        pmod(col("id"), lit(64L)).as("y"),
        col("id").as("payload"))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_spec"
    ZOrder.layoutZOrder(grid, Seq("x", "y"), nFiles = 16)
      .write.mode("overwrite").parquet(s"$base/z")
    ZOrder.layoutLinear(grid, "x", nFiles = 16)
      .write.mode("overwrite").parquet(s"$base/lin")
    // layout is invisible in the data
    val back = spark.read.parquet(s"$base/z")
      .select("x", "y", "payload").as[(Long, Long, Long)].collect().toSet
    val orig = grid.as[(Long, Long, Long)].collect().toSet
    assert(back == orig, "z-order write changed the row multiset")
    // quarter-range box in both dims ~ 1/16 of the grid
    val box = Map("x" -> (16.0, 31.0), "y" -> (16.0, 31.0))
    val z = ZOrder.filesTouched(
      ZOrder.fileRangeStats(spark, s"$base/z", Seq("x", "y")), box)
    val lin = ZOrder.filesTouched(
      ZOrder.fileRangeStats(spark, s"$base/lin", Seq("x", "y")), box)
    assert(z < lin, s"z-order touched $z files, linear $lin — want strict improvement")
    // and the box rows themselves are intact through the z layout
    val nBox = spark.read.parquet(s"$base/z")
      .filter(col("x").between(16, 31) && col("y").between(16, 31)).count()
    assert(nBox == 256L, s"box row count $nBox, want 16*16")
  }
}
