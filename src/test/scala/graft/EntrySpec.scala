package graft

/** Driver-contract smoke: entry > 0 rows; every query runs on sf0.001. */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries ALLOWED to plan a both-sides-shuffled CartesianProduct:
    * each is a documented bounded exact baseline over a sliced input,
    * never a corpus-scale path. Anything else planning one is a scale
    * regression. (BroadcastNestedLoopJoin is NOT flagged: its build side
    * is a broadcast — driver-bounded by construction — and the registry
    * uses it deliberately for the crossJoin(broadcast(scalarStats))
    * totals-attachment idiom and the broadcast-query exact rankers.)
    */
  private val cartesianAllowlist = Set(
    "x14_embed_dup" // cosineDupPairsExact over a 500-id slice (the exact baseline)
  )

  test("all registered queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      // plan-regression guard, same pass as the smoke count: no query may
      // silently pick up a both-sides-materializing join
      if (!cartesianAllowlist.contains(name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"query $name plans a cartesian product:\n$plan")
      }
      val n = df.count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  /** x69's single-plan composition re-scans `documents` once per branch
    * (corpus/bench split, contamination's two sides, near-dup, packing) —
    * 13 logical scans, explain-audited and accepted at bench SF with the
    * stage-materialization alternative documented in-query for 100×
    * scale. This budget pins that audit: the next pipeline stage added to
    * the capstone must either stay within budget or force the documented
    * switch to materialized stages — never silently become scan #14.
    */
  private def documentsScans(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.optimizedPlan.collectLeaves().count {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.exists(_.toString.contains("documents"))
        case _ => false
      }
      case _ => false
    }
  }

  test("x69 scan budget: at most 13 logical documents scans") {
    val df = SparkEntry.queries("x69_pretrain_dataset")(
      spark, "/root/testdata/sf0.001")
    val scans = documentsScans(df)
    assert(scans > 0 && scans <= 13,
      s"x69 plans $scans documents scans (budget 13): adding a branch " +
        "requires the stage-materialization redesign (x104)")
  }

  /** The staged build's RETURNED plan must read only materialized stages
    * — zero documents scans — which is the whole point of x104: the
    * 13-scan recompute tree of x69 collapses to a handful of bounded
    * stage-write jobs plus a final plan over parquet snapshots.
    */
  test("x104 staged build: final plan reads zero documents scans") {
    val df = SparkEntry.queries("x104_pretrain_dataset_staged")(
      spark, "/root/testdata/sf0.001")
    assert(documentsScans(df) == 0,
      "x104's final plan must scan only the materialized stages")
  }
}
