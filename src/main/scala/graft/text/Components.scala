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
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .cache()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // candidate label per vertex: min over itself and its neighbors'
      // current labels
      val next = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component", "__nl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("__nl")).as("__minNbr"))
        .join(labels, "id")
        .select(col("id"), least(col("component"), col("__minNbr")).as("component"))
        .cache()
      next.count() // materialize before unpersisting the parent
      val changed = next.join(labels.withColumnRenamed("component", "__old"), "id")
        .filter(col("component") =!= col("__old")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      it += 1
    }
    edges.unpersist(blocking = false)
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
}
