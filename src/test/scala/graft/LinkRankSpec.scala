package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkRank

/** Integer PageRank: hand-computed micro-unit values, cycle fixed point,
  * dangling-mass discard, partitioning invariance.
  */
class LinkRankSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric cycle is an exact fixed point at 1_000_000") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = ranks(LinkRank.pageRankInt(e, "s", "d", iterations = 7))
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L), r)
  }

  test("hand-computed two-iteration values on the 3-node funnel") {
    import spark.implicits._
    // 1->3, 2->3, 3->1; iter1: r3=1850000, r1=1000000, r2=150000
    // iter2: r3 = 150000 + (85*(1000000+150000)) div 100 = 1127500
    //        r1 = 150000 + (85*1850000) div 100 = 1722500, r2 = 150000
    val e = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = ranks(LinkRank.pageRankInt(e, "s", "d", iterations = 2))
    assert(r == Map(1L -> 1722500L, 2L -> 150000L, 3L -> 1127500L), r)
  }

  test("dangling node keeps receiving, contributes nothing (discard variant)") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("s", "d")
    val r = ranks(LinkRank.pageRankInt(e, "s", "d", iterations = 2))
    // iter1: r2 = 1000000, r1 = 150000; iter2: r2 = 277500, r1 = 150000
    assert(r == Map(1L -> 150000L, 2L -> 277500L), r)
  }

  test("bit-identical under repartitioning (integer sums commute exactly)") {
    import spark.implicits._
    val e = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 13) % 200), (i, (i * 7 + 26) % 200)))
      .filter(p => p._1 != p._2).toDF("s", "d")
    val a = LinkRank.pageRankInt(e, "s", "d", iterations = 5)
      .collect().map(_.toSeq).toSet
    val b = LinkRank.pageRankInt(e.repartition(13, col("d")), "s", "d",
      iterations = 5).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
