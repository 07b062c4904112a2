package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Components

/** SemDeDup — semantic deduplication by embedding clustering (Abbas,
  * Tirumala, Simig, Ganguli & Morcos 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): cluster the embedding space with KMeans, call two
  * items semantic duplicates when their cosine similarity WITHIN the same
  * cluster reaches a threshold, resolve duplicate groups as connected
  * components of that within-cluster threshold graph, and keep from each
  * group only the item with the LOWEST cosine similarity to its cluster
  * centroid — the paper's keep rule: the most atypical member survives,
  * the redundant semantic core is dropped.
  *
  * Scale shape — the reason the paper clusters at all: the quadratic pair
  * search is confined within clusters, Σ|Cᵢ|² instead of N² (SemDeDup
  * runs 110k clusters over 1.3 B embeddings this way). Here the corpus
  * shuffles ONCE keyed by cluster id, the within-cluster join carries
  * ids + vectors for members of one cluster per task, centroids ship as
  * a broadcast frame, and the group resolution is the pointer-jumping
  * [[Components.connectedComponents]] — every stage is the 100 TB shape
  * the sibling dedup paths use.
  *
  * Determinism: the quantizer is seeded KMeans on a bounded hash-gated
  * sample ([[Ivf.quantizerInput]]); cluster ASSIGNMENT is the native
  * argmin expression ([[Ivf.probeCells]], squared euclidean with
  * cell-asc tie-break) rather than MLlib's `transform`, so given the
  * trained centroids every downstream step — assignment, pairs, closure,
  * keep rule — is exact arithmetic a SQL oracle replays bit-identically.
  * The keep rule compares the ROUNDED (6 dp) centroid cosine with id-asc
  * tie-break, so the decision is stable cross-engine by construction.
  */
object SemDedup {

  /** Per-item semantic dedup decision over an embedding column. Output:
    * `idCol, cluster, component, cos_centroid (6 dp), keep` — `component`
    * is the min member id of the item's duplicate group (itself when the
    * item has no within-cluster duplicate), `keep` marks the group's
    * survivor under the lowest-centroid-cosine rule.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      featCol: String,
      nClusters: Int = 8,
      threshold: Double = 0.8,
      seed: Long = 7L,
      maxIter: Int = 10): DataFrame =
    semDedupWith(df, idCol, featCol,
      trainCentroids(df, idCol, featCol, nClusters, seed, maxIter), threshold)

  /** The seeded KMeans clustering stage alone — same bounded-sample +
    * random-init training posture as the IVF coarse quantizer (cluster
    * shape converges long before the corpus has been seen; dedup quality
    * is threshold-driven, not init-driven). Exposed so a caller can keep
    * the centroids (e.g. to interpolate them into an oracle, or to reuse
    * one clustering across corpus snapshots).
    */
  def trainCentroids(
      df: DataFrame,
      idCol: String,
      featCol: String,
      nClusters: Int,
      seed: Long = 7L,
      maxIter: Int = 10): Array[Array[Double]] = {
    val vecs = df.select(col(idCol).as("__id"),
      col(featCol).cast("array<double>").as("__f"))
      .withColumn("__v", array_to_vector(col("__f")))
    val km = new KMeans().setK(nClusters).setSeed(seed).setInitMode("random")
      .setMaxIter(maxIter).setFeaturesCol("__v").setPredictionCol("__c")
    km.fit(Ivf.quantizerInput(vecs, "__id")).clusterCenters.map(_.toArray)
  }

  /** [[semDedup]] against EXPLICIT centroids — the deterministic tail of
    * the pipeline, exposed so callers (and the driver oracle) can replay
    * decisions off persisted or literal centroids.
    */
  def semDedupWith(
      df: DataFrame,
      idCol: String,
      featCol: String,
      centroids: Array[Array[Double]],
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // spread: per-row centroid argmin over a single-split local scan
    // would run in one task (no-op at cluster scale); the FROZEN
    // centroids come in as literals, so assignment values are unchanged
    val vecs = graft.Tables.spread(df).select(col(idCol).as("__id"),
      col(featCol).cast("array<double>").as("__f"))
    val assigned = vecs
      .withColumn("__c", Ivf.probeCells(col("__f"), centroids, 1).getItem(0))
      .withColumn("__n", Ann.norm(col("__f")))
    // centroid cosine once per row via a broadcast centroid frame —
    // rounded to 6 dp HERE because the keep rule compares it
    val cents = broadcast(
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("__c", "__cent")
        .withColumn("__cn", Ann.norm(col("__cent"))))
    val scored = assigned.join(cents, Seq("__c"))
      .withColumn("cos_centroid",
        round(Ann.dot(col("__f"), col("__cent")) / (col("__n") * col("__cn")), 6))
      .select(col("__id"), col("__f"), col("__n"), col("__c"), col("cos_centroid"))
    // within-cluster pair graph: the shuffle is keyed by cluster id, so
    // the quadratic term never leaves a cluster
    val a = scored.select(col("__c"), col("__id").as("id_a"),
      col("__f").as("__fa"), col("__n").as("__na"))
    val b = scored.select(col("__c"), col("__id").as("id_b"),
      col("__f").as("__fb"), col("__n").as("__nb"))
    val pairs = a.join(b, Seq("__c")).filter(col("id_a") < col("id_b"))
      .withColumn("__cos",
        Ann.dot(col("__fa"), col("__fb")) / (col("__na") * col("__nb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"))
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
    val labeled = scored.join(
        comp.select(col("id").as("__id"), col("component")), Seq("__id"), "left")
      .withColumn("component", coalesce(col("component"), col("__id")))
    // keep = the group's (cos_centroid, id) minimum — rounded cosine
    // first (atypicality), id as the deterministic tie-break
    val keepers = labeled.groupBy(col("component"))
      .agg(min(struct(col("cos_centroid"), col("__id"))).as("__k"))
      .select(col("component"), col("__k.__id").as("__keepId"))
    labeled.join(keepers, Seq("component"))
      .select(col("__id").as(idCol), col("__c").as("cluster"),
        col("component"), col("cos_centroid"),
        (col("__id") === col("__keepId")).as("keep"))
  }
}
