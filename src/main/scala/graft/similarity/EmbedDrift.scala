package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space drift monitor for the ANN ingest loop — the embedding
  * analog of the token-KL batch gate (`Quality.klDrift`, x67/x72): an
  * ingest batch of vectors is scored against a FROZEN baseline under the
  * index's FROZEN coarse quantizer, answering "has the distribution my
  * IVF cells were trained on moved?" BEFORE the cell-balance telemetry
  * (`Ivf.imbalanceFactor`) can see it in the index itself.
  *
  * Two signals:
  *  - cell-occupancy KL: assign both frames to their nearest centroid
  *    (the native argmin used by every IVF path), add-1-smooth the K-cell
  *    histograms, and compute `KL(batch ‖ baseline)` — rising KL means
  *    new mass is landing in cells the quantizer under-serves, the
  *    retrain trigger FAISS sizes by imbalance after the fact;
  *  - mean-direction cosine: the cosine between the two frames' mean
  *    vectors — a centroid-of-mass shift invisible to occupancy when
  *    drift moves WITHIN cells.
  *
  * Scale shape: centroids are a driver-sized literal (the IVF contract),
  * assignment is one narrow codegen'd pass per frame, the histograms are
  * K-bounded aggregates, and the mean vectors are one posexplode + avg
  * per frame — no shuffle carries vectors keyed by anything bigger than
  * the dimension index. Deterministic end to end: with the centroids as
  * literals the whole report (assignment argmin, counts, KL terms, mean
  * cosine, gate decision) replays in ANSI SQL.
  *
  * Output: metric rows `(metric, cell, value)` — per cell `n_base`,
  * `n_batch`, `kl_term` (6 dp); summary rows `kl` (total, 6 dp),
  * `mean_cos` (6 dp) and `accept` (1.0 iff rounded KL ≤ `gate`) at
  * `cell = -1`.
  */
object EmbedDrift {

  def drift(
      baseline: DataFrame,
      batch: DataFrame,
      featCol: String,
      centroids: Array[Array[Double]],
      gate: Double): DataFrame = {
    val spark = baseline.sparkSession
    val k = centroids.length
    require(k > 0, "need at least one centroid")

    def assigned(df: DataFrame): DataFrame = df.select(
      Ivf.probeCells(col(featCol).cast("array<double>"), centroids, 1)
        .getItem(0).as("__cell"))

    val cells = spark.range(k.toLong).select(col("id").cast("int").as("__cell"))
    val nb = assigned(baseline).groupBy(col("__cell"))
      .agg(count(lit(1)).as("__nb"))
    val nx = assigned(batch).groupBy(col("__cell"))
      .agg(count(lit(1)).as("__nx"))
    val full = cells
      .join(nb, Seq("__cell"), "left")
      .join(nx, Seq("__cell"), "left")
      .select(col("__cell"),
        coalesce(col("__nb"), lit(0L)).as("__nb"),
        coalesce(col("__nx"), lit(0L)).as("__nx"))
    val tot = full.agg(sum(col("__nb")).as("__tb"), sum(col("__nx")).as("__tx"))
    val pB = (col("__nb") + 1) / (col("__tb") + lit(k.toDouble))
    val pX = (col("__nx") + 1) / (col("__tx") + lit(k.toDouble))
    val terms = full.crossJoin(broadcast(tot))
      .select(col("__cell"), col("__nb"), col("__nx"),
        (pX * log(pX / pB)).as("__term"))

    // K-bounded: the union below consumes terms three times; one tiny
    // materialization beats three assignment passes over both frames.
    terms.cache()
    try {
      val perCell = terms.select(lit("n_base").as("metric"),
          col("__cell").as("cell"), col("__nb").cast("double").as("value"))
        .unionByName(terms.select(lit("n_batch").as("metric"),
          col("__cell").as("cell"), col("__nx").cast("double").as("value")))
        .unionByName(terms.select(lit("kl_term").as("metric"),
          col("__cell").as("cell"), round(col("__term"), 6).as("value")))

      val klRow = terms.agg(round(sum(col("__term")), 6).as("__kl"))
      val accept = klRow.select(
        lit("accept").as("metric"), lit(-1).as("cell"),
        when(col("__kl") <= gate, 1.0).otherwise(0.0).as("value"))
      val klOut = klRow.select(lit("kl").as("metric"), lit(-1).as("cell"),
        col("__kl").as("value"))

      def meanVec(df: DataFrame, as: String): DataFrame = df
        .select(posexplode(col(featCol).cast("array<double>")))
        .groupBy(col("pos")).agg(avg(col("col")).as(as))
      val mb = meanVec(baseline, "__mb")
      val mx = meanVec(batch, "__mx")
      val meanCos = mb.join(mx, "pos")
        .agg(round(
          sum(col("__mb") * col("__mx")) /
            (sqrt(sum(col("__mb") * col("__mb"))) *
              sqrt(sum(col("__mx") * col("__mx")))), 6).as("value"))
        .select(lit("mean_cos").as("metric"), lit(-1).as("cell"), col("value"))

      val out = perCell.unionByName(klOut).unionByName(meanCos)
        .unionByName(accept)
      // materialize before releasing the cache so callers don't recompute
      out.localCheckpoint(true)
    } finally terms.unpersist(blocking = false)
  }
}
