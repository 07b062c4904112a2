package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate PAIR output — the last step
  * of every dedup pipeline: `x2`/`x12`/`x20` emit pairs, but the drop
  * decision needs clusters ("keep the minimum id of each component,
  * drop the rest"). Algorithm: iterated min-label propagation (the
  * MapReduce-CC family — Kiveris et al. 2014 "Connected Components in
  * MapReduce and Beyond"; this is their basic large-star/small-star
  * building block): every vertex repeatedly adopts the minimum label in
  * its closed neighborhood until a fixpoint.
  *
  * Scale shape: each round is one join edges⋈labels + one min-aggregate
  * — all shuffles keyed on vertex id, labels frame carries two longs per
  * vertex. Rounds needed = O(component diameter); near-dup components
  * are hub-shaped by construction (the hot-bucket star cap emits B−1
  * star edges, not B²/2 cliques), so they converge in 2–3 rounds. The
  * fixpoint check is a 1-row count per round; `maxIter` bounds
  * adversarial chains, and hitting it raises rather than returning a
  * half-merged clustering.
  */
object Components {

  /** Resolve undirected pair rows into components.
    *
    * @param pairs frame with two vertex-id columns (`aCol`, `bCol`)
    * @return (`id`, `component`) — component = min vertex id reachable;
    *         only vertices present in `pairs` appear (isolated docs are
    *         their own component by definition and need no row)
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    // lineage is TRUNCATED each round via eager localCheckpoint: the
    // round plan self-joins the previous labels, so a cache-only loop
    // doubles the logical plan per round (planning cost goes exponential
    // — measured 1.2 s → 14 s by round 3 before truncation). After the
    // checkpoint every round plans against a constant-size LogicalRDD.
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor-min: candidate label = min over the closed neighborhood
      val prop = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component", "__nl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("__nl")).as("__minNbr"))
        .join(labels, "id")
        .select(col("id"), col("component").as("__old"),
          least(col("component"), col("__minNbr")).as("__p"))
      // pointer jumping: also adopt the label OF the current label
      // (labels only decrease, so label(label(v)) ≤ label(v)) — turns
      // O(diameter) rounds into O(log diameter), which is what makes
      // chain-shaped dup components converge in a handful of rounds
      val next = prop
        .join(prop.select(col("id").as("__p"), col("__p").as("__jump")),
          Seq("__p"), "left")
        .select(col("id"), col("__old"),
          least(col("__p"), coalesce(col("__jump"), col("__p"))).as("component"))
        .localCheckpoint(true)
      val changed = next.agg(
        sum(when(col("component") =!= col("__old"), 1L).otherwise(0L))).head().getLong(0)
      labels = next.select(col("id"), col("component"))
      converged = changed == 0
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Per-component dedup plan from pair output: one row per component
    * with its keeper (min id), member count, and the drop count.
    */
  def dedupPlan(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        (count(lit(1)) - 1).as("n_dropped"))

  /** Quality-priority dedup plan: like [[dedupPlan]], but each
    * near-duplicate component keeps its HIGHEST-SCORING member (max
    * `scoreCol`, ties to the smallest id) instead of the smallest id —
    * the RefinedWeb-style rule that a duplicate cluster should surrender
    * everything but its best exemplar, with "best" supplied by any
    * quality signal (Gopher score, LM cross-entropy, length, …).
    *
    * `scores` maps `idCol` → `scoreCol` for at least every id in the
    * pair stream (an inner join drops unscored members — score what you
    * dedup). Scale shape: the component labels are id-pairs (never doc
    * text); the keeper election is one rank window over (component,
    * score desc, id) — WindowGroupLimit forwards a single candidate per
    * map task.
    *
    * Output: `component`, `keeper`, `keeper_score`, `n_members`,
    * `n_dropped`.
    */
  def dedupPlanBy(
      pairs: DataFrame, aCol: String, bCol: String,
      scores: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = connectedComponents(pairs, aCol, bCol)
      .join(scores.select(col(idCol).as("id"), col(scoreCol).as("__s")), "id")
    val w = Window.partitionBy(col("component"))
      .orderBy(col("__s").desc, col("id"))
    labeled
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("component"))
      .agg(
        max(when(col("__rk") === 1, col("id"))).as("keeper"),
        max(when(col("__rk") === 1, col("__s"))).as("keeper_score"),
        count(lit(1)).as("n_members"),
        (count(lit(1)) - 1).as("n_dropped"))
  }
}
