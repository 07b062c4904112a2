package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — SURVEY
  * §2.8 north-star: brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the 100 TB scale path (probe
  * only matching buckets instead of the full cross product).
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

  /** Exact brute-force cosine top-k: each query row against every corpus
    * row. Queries are broadcast; corpus streams once; ranking is a
    * top-k-per-group window. Output: queryId, rank, neighbor_id, cosine.
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      featCol: String,
      corpusIdCol: String,
      queryIdCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("__qid"), col(featCol).as("__qf")))
    val joined = corpus
      .select(col(corpusIdCol).as("__cid"), col(featCol).as("__cf"))
      .crossJoin(q)
      .filter(if (excludeSelf) col("__cid") =!= col("__qid") else lit(true))
      .withColumn("__cos", cosine(col("__qf"), col("__cf")))
    joined.withColumn("rank",
      row_number().over(Window.partitionBy(col("__qid"))
        .orderBy(col("__cos").desc, col("__cid").asc)))
      .filter(col("rank") <= k)
      .select(col("__qid").as(queryIdCol), col("rank"),
        col("__cid").as("neighbor_id"), col("__cos").as("cosine"))
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
    def banded(df: DataFrame, idAs: String, featAs: String) = df
      .withColumn("__sig", sig)
      .select(
        col(corpusIdCol).as(idAs) +: col(featCol).as(featAs) +:
          (0 until bands).map(b =>
            (shiftright(col("__sig"), b * bitsPerBand).bitwiseAND(mask)).as(s"__band$b")): _*)
    val c = banded(corpus, "__cid", "__cf")
    val q = queries
      .withColumn("__sig", sig)
      .select(
        col(queryIdCol).as("__qid") +: col(featCol).as("__qf") +:
          (0 until bands).map(b =>
            (shiftright(col("__sig"), b * bitsPerBand).bitwiseAND(mask)).as(s"__band$b")): _*)
    // candidate pairs: union over bands of same-band joins, dedup'd
    val cands = (0 until bands).map { b =>
      c.join(broadcast(q.select(col("__qid"), col("__qf"), col(s"__band$b"))), Seq(s"__band$b"))
        .select(col("__cid"), col("__cf"), col("__qid"), col("__qf"))
    }.reduce(_.unionByName(_)).dropDuplicates("__cid", "__qid")
      .filter(col("__cid") =!= col("__qid"))
    cands.withColumn("__cos", cosine(col("__qf"), col("__cf")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("__qid"))
          .orderBy(col("__cos").desc, col("__cid").asc)))
      .filter(col("rank") <= k)
      .select(col("__qid").as(queryIdCol), col("rank"),
        col("__cid").as("neighbor_id"), col("__cos").as("cosine"))
  }
}
