package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** As-of / interval join semantics against brute-force references:
  * backward match with exact-match visibility, tie resolution, tolerance,
  * missing-match nulls, and bucket-edge coverage of the range join
  * (including negative epochs, where `div`-style truncation would
  * mis-bucket).
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf: DataFrame = Seq(
    // (event_id, key, t)
    (100L, "a", 10L), (101L, "a", 25L), (102L, "a", 5L),
    (103L, "b", 50L), (104L, "c", 7L)
  ).toDF("event_id", "key", "t")

  private def rightDf: DataFrame = Seq(
    // (rid, key, t, v)
    (1L, "a", 10L, 1.0),  // exact-match tie with left 100
    (2L, "a", 10L, 2.0),  // same ts, higher rid — must win the tie
    (3L, "a", 20L, 3.0),
    (4L, "a", 30L, 4.0),  // after every left 'a' row but 101? no: 30>25 — never matched
    (5L, "b", 1L, 5.0)    // stale for left 103 under tight tolerance
  ).toDF("rid", "key", "t", "v")

  private def asofRows(tol: Option[Long]): Map[Long, (Option[Double], Option[Long])] =
    Joins.asofJoin(leftDf, rightDf, Seq("key"), "t", "t",
        payload = Seq("v"), rightOrder = "rid", tolerance = tol)
      .collect().map { r =>
        r.getAs[Long]("event_id") ->
          ((Option(r.getAs[Any]("asof_v")).map(_.asInstanceOf[Double]),
            Option(r.getAs[Any]("asof_staleness")).map(_.asInstanceOf[Long])))
      }.toMap

  test("asofJoin: backward match, exact-match ties, and misses") {
    val got = asofRows(tol = None)
    assert(got.size == 5, "every left row must survive exactly once")
    // 100 @ t=10: rids 1 and 2 both at t=10 are visible; max rid wins
    assert(got(100L) == ((Some(2.0), Some(0L))))
    // 101 @ t=25: latest right at-or-before is rid 3 @ t=20
    assert(got(101L) == ((Some(3.0), Some(5L))))
    // 102 @ t=5: no right row at-or-before → null match
    assert(got(102L) == ((None, None)))
    // 103 @ t=50: rid 5 @ t=1, staleness 49
    assert(got(103L) == ((Some(5.0), Some(49L))))
    // 104: key 'c' has no right rows at all
    assert(got(104L) == ((None, None)))
  }

  test("asofJoin: tolerance nulls out stale matches only") {
    val got = asofRows(tol = Some(10L))
    assert(got(100L) == ((Some(2.0), Some(0L))), "fresh match survives")
    assert(got(101L) == ((Some(3.0), Some(5L))), "staleness 5 <= 10 survives")
    assert(got(103L) == ((None, None)), "staleness 49 > 10 must be dropped")
  }

  test("asofJoin forward: earliest at-or-after match") {
    val got = Joins.asofJoin(leftDf, rightDf, Seq("key"), "t", "t",
        payload = Seq("v"), rightOrder = "rid", direction = "forward")
      .collect().map { r =>
        r.getAs[Long]("event_id") ->
          ((Option(r.getAs[Any]("asof_v")).map(_.asInstanceOf[Double]),
            Option(r.getAs[Any]("asof_staleness")).map(_.asInstanceOf[Long])))
      }.toMap
    // 100 @ t=10: rids 1,2 at exactly 10 visible; max rid wins → 2.0
    assert(got(100L) == ((Some(2.0), Some(0L))))
    // 101 @ t=25: earliest at-or-after is rid 4 @ t=30
    assert(got(101L) == ((Some(4.0), Some(5L))))
    // 102 @ t=5: earliest at-or-after is rid 1/2 @ t=10 → max rid 2
    assert(got(102L) == ((Some(2.0), Some(5L))))
    // 103 @ t=50: nothing after on key b
    assert(got(103L) == ((None, None)))
  }

  test("asofJoin nearest: closer side wins, backward breaks ties") {
    val left = Seq(
      (300L, "a", 12L), // back rid2@10 d=2, fwd rid3@20 d=8 → back
      (301L, "a", 18L), // back@10 d=8, fwd@20 d=2 → fwd
      (302L, "a", 15L)  // d=5 both ways → tie → backward
    ).toDF("event_id", "key", "t")
    val got = Joins.asofJoin(left, rightDf, Seq("key"), "t", "t",
        payload = Seq("v"), rightOrder = "rid", direction = "nearest")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Double]("asof_v")).toMap
    assert(got == Map(300L -> 2.0, 301L -> 3.0, 302L -> 2.0))
  }

  test("asofJoin nearest: tolerance gates each side before choosing") {
    // only the forward side is within tolerance 3 at t=18
    val left = Seq((400L, "a", 18L)).toDF("event_id", "key", "t")
    val row = Joins.asofJoin(left, rightDf, Seq("key"), "t", "t",
        payload = Seq("v"), rightOrder = "rid",
        tolerance = Some(3L), direction = "nearest")
      .collect().head
    assert(row.getAs[Any]("asof_v") == 3.0 &&
      row.getAs[Any]("asof_staleness") == 2L)
  }

  test("asofJoin: payload fields stay from one right row even when null") {
    // rid 11 has a null payload field; rid 12 (later) is fully populated.
    // Column-wise LOCF would stitch rid 12's v with rid 11's w — the
    // struct carry must never mix rows.
    val right = Seq(
      (11L, "a", 10L, Option.empty[Double], Option(1.5)),
      (12L, "a", 20L, Option(9.0), Option.empty[Double])
    ).toDF("rid", "key", "t", "v", "w")
    val left = Seq((200L, "a", 30L)).toDF("event_id", "key", "t")
    val row = Joins.asofJoin(left, right, Seq("key"), "t", "t",
        payload = Seq("v", "w"), rightOrder = "rid")
      .collect().head
    assert(row.getAs[Any]("asof_v") == 9.0)
    assert(row.getAs[Any]("asof_w") == null,
      "w must be rid 12's null, not rid 11's 1.5")
  }

  test("rangeJoin: half-open window, bucket edges, negative epochs") {
    // width 10, window (l.t - 10, l.t]
    val left = Seq((1L, "k", 0L), (2L, "k", 10L), (3L, "k", -5L))
      .toDF("lid", "key", "t")
    val right = Seq(
      ("k", -10L, 1.0), ("k", -14L, 2.0), ("k", 0L, 3.0),
      ("k", 1L, 4.0), ("k", 10L, 5.0), ("k", -5L, 6.0)
    ).toDF("key", "t", "v")
    val got = Joins.rangeJoin(left, right, Seq("key"), "t", "t",
        width = 10L, payload = Seq("v"))
      .groupBy(col("lid")).agg(collect_list(col("r_v")).as("vs"))
      .collect().map(r => r.getAs[Long]("lid") ->
        r.getSeq[Double](r.fieldIndex("vs")).sorted).toMap
    // brute force: lid 1 t=0 window (-10,0]: v at 0, -5 → (3.0, 6.0)
    assert(got(1L) == Seq(3.0, 6.0))
    // lid 2 t=10 window (0,10]: v at 1, 10 → (4.0, 5.0)
    assert(got(2L) == Seq(4.0, 5.0))
    // lid 3 t=-5 window (-15,-5]: v at -10, -14, -5 → (1.0, 2.0, 6.0)
    assert(got(3L) == Seq(1.0, 2.0, 6.0))
  }

  test("rangeJoin matches a brute-force theta join on random data") {
    val left = (0 until 200).map(i =>
      (i.toLong, s"k${i % 5}", (functionsHash(i, 1) % 1000))).toDF("lid", "key", "t")
    val right = (0 until 300).map(i =>
      (s"k${i % 5}", (functionsHash(i, 2) % 1000), i * 1.0)).toDF("key", "t", "v")
    val width = 37L
    val fast = Joins.rangeJoin(left, right, Seq("key"), "t", "t", width, Seq("v"))
      .select(col("lid"), col("r_v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val brute = left.as("l").join(right.as("r"),
        col("l.key") === col("r.key") &&
          col("r.t") > col("l.t") - lit(width) && col("r.t") <= col("l.t"))
      .select(col("l.lid"), col("r.v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(fast == brute)
  }

  /** Deterministic pseudo-random long in [0, 1e9) — keep draws seedable
    * without Math.random (spec determinism convention).
    */
  private def functionsHash(i: Int, salt: Int): Long =
    math.abs((i * 2654435761L + salt * 40503L) % 1000000000L)

  test("saltedJoin: result-identical to the plain join, inner and left") {
    val left = (0 until 300).map { i =>
      // heavy skew: 80% of rows on one key
      val k = if (i % 5 == 0) s"k${i % 7}" else "hot"
      (i.toLong, k, i * 0.5)
    }.toDF("lid", "key", "lv")
    val right = (0 until 40).map(i => (s"k${i % 9}", i * 1.0))
      .toDF("key", "rv") // "hot" is unmatched → exercises left-join nulls
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lid"), col("key"), col("lv"), col("rv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2, t._3, t._4.getOrElse(-1.0))).toSeq
    for (jt <- Seq("inner", "left")) {
      val plain = rows(left.join(right, Seq("key"), jt))
      val salted = rows(Joins.saltedJoin(left, right, Seq("key"), 8, jt))
      assert(salted == plain, s"salting must be invisible for $jt")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(left, right, Seq("key"), 8, "right_outer")
    }
  }

  test("asofJoin plan: one shuffle on the key, no nested-loop join") {
    val plan = Joins.asofJoin(leftDf, rightDf, Seq("key"), "t", "t",
      payload = Seq("v"), rightOrder = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"asof must never plan a pair-materializing join:\n$plan")
  }

  test("Bucketed: co-located layout elides the join shuffle; results unchanged") {
    import spark.implicits._
    import graft.sources.Bucketed
    val fact = (1 to 200).map(i => (i.toLong % 40, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dim = (0L to 39L).map(k => (k, s"name_$k")).toDF("k", "name")
    val ft = Bucketed.writeBucketed(fact, "spec_fact", "k", 8)
    val dt = Bucketed.writeBucketed(dim, "spec_dim", "k", 8)

    val j = Bucketed.bucketedJoin(spark, ft, dt, "k")
    assert(Bucketed.exchangeCount(j) == 0,
      "co-bucketed SMJ must plan zero exchanges:\n" + j.queryExecution.executedPlan)

    // contrast: the same join over the raw (un-bucketed) frames shuffles
    val raw = fact.hint("merge").join(dim, "k")
    assert(Bucketed.exchangeCount(raw) > 0, "plain SMJ should need exchanges")

    // the layout must be invisible in the results
    val got = j.groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = fact.join(dim, "k").groupBy($"k")
      .agg(org.apache.spark.sql.functions.sum($"v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == exp)
  }
}
