package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Count-Min sketch: md5-replayable buckets, overestimate-only errors. */
class CountMinSpec extends SparkSpec {

  private def bucketOf(seed: Long, row: Int, key: String, width: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$row:$key".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16) % width
  }

  test("sketch buckets follow the documented md5 rule; estimates are min-of-rows") {
    import spark.implicits._
    val keys = Seq("a", "a", "a", "b", "c", "c")
    val df = keys.toDF("k")
    val (depth, width, seed) = (3, 4, 11L)
    val cms = CountMin.sketch(df, "k", depth, width, seed)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // replay the counters off-Spark
    val expect = (for { k <- keys; r <- 0 until depth }
      yield (r, bucketOf(seed, r, k, width)))
      .groupBy(identity).map { case (rb, hits) => rb -> hits.size.toLong }
    assert(cms == expect)
    val est = CountMin.estimate(Seq("a", "b", "zz").toDF("k"), "k",
      CountMin.sketch(df, "k", depth, width, seed), depth, width, seed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // estimate = min over rows of the replayed counters
    def handEst(k: String) = (0 until depth)
      .map(r => expect.getOrElse((r, bucketOf(seed, r, k, width)), 0L)).min
    assert(est("a") == handEst("a") && est("b") == handEst("b"))
    assert(est("zz") == handEst("zz"), "unseen key estimate is its collision mass")
    // the CMS contract: never an underestimate
    assert(est("a") >= 3L && est("b") >= 1L && est("zz") >= 0L)
  }

  test("estimates never underestimate over a wide random key set") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"k${i % 60}")
    val df = keys.toDF("k")
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cms = CountMin.sketch(df, "k", depth = 4, width = 64, seed = 3L)
    val est = CountMin.estimate(keys.distinct.toDF("k"), "k", cms,
      depth = 4, width = 64, seed = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k underestimated: ${est(k)} < $c")
    }
  }

  test("merge of split-stream sketches equals the direct sketch, cell for cell") {
    import spark.implicits._
    val keys = (0 until 300).map(i => s"k${i % 40}")
    val (depth, width, seed) = (4, 32, 5L)
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // three disjoint "days" by position, as a rollup would split them
    val parts = keys.zipWithIndex.groupBy(_._2 % 3).values.toSeq
      .map(p => CountMin.sketch(p.map(_._1).toDF("k"), "k", depth, width, seed))
    val merged = cells(CountMin.merge(parts))
    val direct = cells(CountMin.sketch(keys.toDF("k"), "k", depth, width, seed))
    assert(merged == direct, "CMS merge must be exactly the direct sketch")
    // estimates off the merged sketch keep the no-underestimate contract
    val est = CountMin.estimate(keys.distinct.toDF("k"), "k",
      CountMin.merge(parts), depth, width, seed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    truth.foreach { case (k, c) => assert(est(k) >= c) }
  }

  test("sketchBy grouped counters equal one sketch() per group slice") {
    import spark.implicits._
    // the one-pass rollup-build contract (x131): grouping on the day key
    // must yield exactly the counters of three independent per-day builds
    val rows = (0 until 300).map(i => (i.toLong % 3, s"k${i % 13}"))
    val df = rows.toDF("day", "k")
    val (depth, width, seed) = (4, 32, 7L)
    val grouped = CountMin.sketchBy(df, "k", Seq("day"), depth, width, seed)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    (0L until 3L).foreach { d =>
      val slice = CountMin.sketch(df.filter($"day" === d), "k", depth, width, seed)
        .collect().map(r => (d, r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val g = grouped.filter(_._1._1 == d)
      assert(g == slice, s"day $d grouped counters diverge from per-slice build")
    }
  }

  test("parameter triple is persisted and guards merge/estimate against mismatches") {
    import spark.implicits._
    val df = (0 until 50).map(i => s"k${i % 7}").toDF("k")
    val a = CountMin.sketch(df, "k", depth = 4, width = 32, seed = 5L)
    val b = CountMin.sketch(df, "k", depth = 4, width = 64, seed = 5L)
    val c = CountMin.sketch(df, "k", depth = 4, width = 32, seed = 9L)
    // differing width or seed → loud rejection, not silently wrong counters
    val e1 = intercept[IllegalArgumentException] { CountMin.merge(Seq(a, b)) }
    assert(e1.getMessage.contains("different"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] { CountMin.merge(Seq(a, c)) }
    assert(e2.getMessage.contains("different"), e2.getMessage)
    // estimate with params that contradict the sketch's persisted triple
    val e3 = intercept[IllegalArgumentException] {
      CountMin.estimate(Seq("k1").toDF("k"), "k", a,
        depth = 4, width = 64, seed = 5L).collect()
    }
    assert(e3.getMessage.contains("persisted"), e3.getMessage)
    // the triple survives a parquet round-trip (self-describing files)
    val path = Scratch.sub(s"cms_meta_${java.util.UUID.randomUUID()}")
    a.write.mode("overwrite").parquet(path)
    val merged = CountMin.merge(Seq(spark.read.parquet(path), a))
    assert(merged.select("__depth", "__width", "__seed").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((4, 32, 5L)))
  }
}
