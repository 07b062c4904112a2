package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a link graph in DETERMINISTIC integer arithmetic — the
  * link-centrality quality signal of web-corpus curation (Common Crawl's
  * harmonic/PageRank rankings; Page et al. 1999), engineered the x139
  * way: every quantity lives in BIGINT micro-units and every division is
  * integer division, so per-iteration sums are order-independent exact
  * integers — a distributed float PageRank would hash differently on
  * every partitioning (float sums commute only approximately), this one
  * is bit-identical on any cluster AND in the DuckDB oracle.
  *
  * Semantics (documented exactly, because integer truncation IS the
  * contract): ranks start at 1_000_000 (1.0 micro); one iteration is
  *
  *   r'(v) = (1e6 · (100 − dampingPct)) / 100
  *         + (dampingPct · Σ_{u→v} (r(u) div outdeg(u))) div 100
  *
  * with `div` = floor division on non-negative BIGINTs. Mass lost to
  * truncation and to dangling nodes (outdeg 0) is NOT redistributed —
  * the standard "discard dangling mass" variant, stated loudly; ranks
  * are therefore a scored ORDERING, not a normalized distribution.
  *
  * Scale shape per iteration: one join of edges to the rank frame on
  * src (edges pre-partitioned by src would make this shuffle-free), one
  * dst-keyed integer-sum aggregate (map-side combine), one left join
  * back to the node set. Lineage is truncated every iteration via
  * localCheckpoint (the [[graft.text.Components]] discipline) so ten
  * iterations cost ten plans, not one 10-deep recursive plan.
  */
object LinkRank {

  /** Micro-unit integer PageRank. Returns `(node, rank_micro, out_deg,
    * in_deg)` for every node appearing as a source or destination.
    */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct in [0,100]: $dampingPct")
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst"))
    val nodes = e.select(col("__src").as("__n"))
      .unionByName(e.select(col("__dst").as("__n")))
      .distinct()
    val outDeg = e.groupBy(col("__src"))
      .agg(count(lit(1)).as("__out"))
    val inDeg = e.groupBy(col("__dst"))
      .agg(count(lit(1)).as("__in"))
    val base = (1000000L * (100 - dampingPct)) / 100
    var ranks = nodes.withColumn("__r", lit(1000000L)).localCheckpoint()
    (1 to iterations).foreach { _ =>
      val contrib = e
        .join(ranks.select(col("__n").as("__src"), col("__r")), Seq("__src"))
        .join(outDeg, Seq("__src"))
        .select(col("__dst"), expr("__r div __out").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__s"))
      ranks = nodes
        .join(contrib.select(col("__dst").as("__n"), col("__s")), Seq("__n"), "left")
        .select(col("__n"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(__s, 0L)) div 100")).as("__r"))
        .localCheckpoint()
    }
    ranks
      .join(outDeg.select(col("__src").as("__n"), col("__out")), Seq("__n"), "left")
      .join(inDeg.select(col("__dst").as("__n"), col("__in")), Seq("__n"), "left")
      .select(col("__n").as("node"), col("__r").as("rank_micro"),
        coalesce(col("__out"), lit(0L)).as("out_deg"),
        coalesce(col("__in"), lit(0L)).as("in_deg"))
  }
}
