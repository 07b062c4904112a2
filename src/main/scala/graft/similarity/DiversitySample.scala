package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-stratified (diversity-balanced) corpus downsampling — the
  * embedding-space complement of the source-level temperature/quota
  * mixers: assign every vector to its nearest coarse-quantizer cell,
  * then keep at most `capPerCell` rows per cell, drawn by md5 rank (a
  * reproducible uniform draw within the cell, the same stateless
  * md5-coin device as the hash split / quota samplers). Dominant modes
  * (boilerplate clusters, over-crawled topics) are capped while tail
  * clusters survive intact — cluster-balanced selection as practiced in
  * embedding-curated pretrain pipelines (the SemDeDup/DCLM family of
  * data-curation work keeps per-cluster budgets for the same reason).
  *
  * Scale shape: the centroid table is a literal broadcast into a
  * codegen'd per-row argmin ([[Ivf.probeCells]] — no join, no shuffle to
  * assign), then ONE shuffle on `cell` for the bounded per-cell window;
  * output is ≤ nlist × cap rows regardless of corpus size. The quantizer
  * itself trains on a bounded sample ([[Ivf.trainQuantizer]]), so no
  * stage here scales super-linearly in the corpus.
  */
object DiversitySample {

  /** Kept rows only: `(idCol, cell, cell_n)` where `cell_n` is the
    * cell's pre-sampling population (the cap's denominator — what a
    * mixing report needs to compute realized rates).
    */
  def clusterStratified(
      corpus: DataFrame,
      featCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      capPerCell: Int): DataFrame = {
    require(capPerCell > 0, s"need capPerCell > 0: $capPerCell")
    val assigned = corpus
      .select(col(idCol).as("__id"), col(featCol).as("__f"))
      .withColumn("__cell", Ivf.probeCells(col("__f"), centroids, 1).getItem(0))
    val cellW = Window.partitionBy(col("__cell"))
    val drawW = cellW.orderBy(md5(col("__id").cast("string")), col("__id"))
    assigned
      .withColumn("__n", count(lit(1)).over(cellW))
      .withColumn("__rk", row_number().over(drawW))
      .filter(col("__rk") <= capPerCell)
      .select(col("__id").as(idCol), col("__cell").as("cell"),
        col("__n").as("cell_n"))
  }
}
