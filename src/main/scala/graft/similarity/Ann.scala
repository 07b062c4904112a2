package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{Scored, TopKAgg}

/** Similarity search over embedding columns (`Array[Float]`) — SURVEY
  * §2.8 north-star: brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the 100 TB scale path (probe
  * only matching buckets instead of the full cross product).
  *
  * Plan shape shared by both paths: per-row norms are computed ONCE
  * before the join (cosine then costs a single dot-product pass per
  * candidate pair), and the per-query ranking is the bounded
  * [[graft.functions.TopKAgg]] — map-side partials keep ≤k candidates per
  * (partition, query), so the exchange carries k·P rows per query instead
  * of the whole candidate product.
  */
object Ann {

  /** Sequential double-precision dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, d) => acc + d)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (|a|·|b|) in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def topK(k: Int) = udaf(new TopKAgg(k), Encoders.product[Scored])

  /** Rank candidate pairs `(__qid, __cid, __qf/__qn, __cf/__cn)` by exact
    * cosine and keep the top-k per query. Score is negated cosine so the
    * ascending bounded heap yields descending similarity; ties break on
    * the smaller corpus id, matching `ORDER BY cos DESC, cid ASC`.
    */
  private def rankTopK(cands: DataFrame, queryIdCol: String, k: Int): DataFrame =
    cands
      .withColumn("__cos", dot(col("__qf"), col("__cf")) / (col("__qn") * col("__cn")))
      .groupBy(col("__qid"))
      .agg(topK(k)(-col("__cos"), col("__cid").cast("long"), lit(0L)).as("__tk"))
      .select(col("__qid"), posexplode(col("__tk.hits")).as(Seq("__pos", "__h")))
      .select(col("__qid").as(queryIdCol), (col("__pos") + 1).cast("int").as("rank"),
        col("__h.id").as("neighbor_id"), (-col("__h.score")).as("cosine"))

  /** Exact brute-force cosine top-k: each query row against every corpus
    * row. Queries are broadcast; corpus streams once; ranking is the
    * bounded top-k aggregate. Output: queryId, rank, neighbor_id, cosine.
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      featCol: String,
      corpusIdCol: String,
      queryIdCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("__qid"), col(featCol).as("__qf"))
      .withColumn("__qn", norm(col("__qf"))))
    val cands = corpus
      .select(col(corpusIdCol).as("__cid"), col(featCol).as("__cf"))
      .withColumn("__cn", norm(col("__cf")))
      .crossJoin(q)
      .filter(if (excludeSelf) col("__cid") =!= col("__qid") else lit(true))
    rankTopK(cands, queryIdCol, k)
  }

  /** Deterministic pseudo-random hyperplane component for LSH: a unit-free
    * ±hash value per (plane, dimension), derived from xxhash64 — no RNG
    * state, reproducible across executors.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim) % 1000).cast("double") / 1000d

  /** Random-hyperplane (SimHash) signature of an embedding: `nPlanes`
    * sign bits packed into a long. Rows whose signatures share a bucket
    * are near-duplicate candidates; join on the bucket instead of the
    * full cross product — this is the piece that scales.
    */
  def hyperplaneSignature(feat: Column, dim: Int, nPlanes: Int): Column = {
    require(nPlanes <= 63)
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(feat, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0d), (acc, d) => acc + d)
      when(proj >= 0d, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate cosine top-k: candidates = pairs sharing a
    * signature band; exact cosine re-ranking within candidates only.
    * `bands` × `bitsPerBand` ≤ 63. Recall grows with bands; cost stays
    * |bucket|² instead of |corpus|².
    */
  def cosineTopKLsh(
      corpus: DataFrame,
      queries: DataFrame,
      featCol: String,
      corpusIdCol: String,
      queryIdCol: String,
      k: Int,
      dim: Int,
      bands: Int = 4,
      bitsPerBand: Int = 12): DataFrame = {
    require(bands * bitsPerBand <= 63)
    val sig = hyperplaneSignature(col(featCol), dim, bands * bitsPerBand)
    val mask = (1L << bitsPerBand) - 1
    val c = corpus
      .withColumn("__sig", sig)
      .select(
        col(corpusIdCol).as("__cid") +: col(featCol).as("__cf") +:
          (0 until bands).map(b =>
            (shiftright(col("__sig"), b * bitsPerBand).bitwiseAND(mask)).as(s"__band$b")): _*)
      .withColumn("__cn", norm(col("__cf")))
    val q = queries
      .withColumn("__sig", sig)
      .select(
        col(queryIdCol).as("__qid") +: col(featCol).as("__qf") +:
          (0 until bands).map(b =>
            (shiftright(col("__sig"), b * bitsPerBand).bitwiseAND(mask)).as(s"__band$b")): _*)
      .withColumn("__qn", norm(col("__qf")))
    // candidate pairs: union over bands of same-band joins, dedup'd
    val cands = (0 until bands).map { b =>
      c.join(broadcast(q.select(col("__qid"), col("__qf"), col("__qn"), col(s"__band$b"))),
          Seq(s"__band$b"))
        .select(col("__cid"), col("__cf"), col("__cn"), col("__qid"), col("__qf"), col("__qn"))
    }.reduce(_.unionByName(_)).dropDuplicates("__cid", "__qid")
      .filter(col("__cid") =!= col("__qid"))
    rankTopK(cands, queryIdCol, k)
  }
}
