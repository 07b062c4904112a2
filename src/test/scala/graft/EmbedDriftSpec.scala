package graft

import org.apache.spark.sql.functions._

import graft.similarity.EmbedDrift

/** Embedding drift gate: identical frames score zero drift; a shifted
  * batch trips the gate.
  */
class EmbedDriftSpec extends SparkSpec {

  private val cents = Array(
    Array(1.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0),
    Array(0.0, 0.0, 1.0))

  private def vecs(shift: Double) = {
    import spark.implicits._
    (0 until 90).map { i =>
      val axis = i % 3
      val v = Array.tabulate(3)(j =>
        (if (j == axis) 1.0 else 0.1) + (if (axis == 0) shift else 0.0))
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def metric(df: org.apache.spark.sql.DataFrame, m: String): Double =
    df.filter(col("metric") === m).select(col("value")).head().getDouble(0)

  test("identical frames: zero KL, unit mean cosine, accept") {
    val b = vecs(0.0)
    val out = EmbedDrift.drift(b, b, "embedding", cents, gate = 0.01)
    assert(metric(out, "kl") == 0.0)
    assert(metric(out, "mean_cos") == 1.0)
    assert(metric(out, "accept") == 1.0)
  }

  test("shifted batch raises KL and trips a tight gate") {
    val base = vecs(0.0)
    // push every axis-0 vector toward axis 1: occupancy moves cells
    val drifted = {
      import spark.implicits._
      (0 until 90).map { i =>
        val axis = if (i % 3 == 0) 1 else i % 3
        (i.toLong, Array.tabulate(3)(j => if (j == axis) 1.0 else 0.1).toSeq)
      }.toDF("vec_id", "embedding")
    }
    val out = EmbedDrift.drift(base, drifted, "embedding", cents, gate = 0.01)
    assert(metric(out, "kl") > 0.01)
    assert(metric(out, "accept") == 0.0)
    assert(metric(out, "mean_cos") < 1.0)
  }

  test("per-cell counts sum to the frame sizes") {
    val out = EmbedDrift.drift(vecs(0.0), vecs(0.0), "embedding", cents, 1.0)
    val nb = out.filter(col("metric") === "n_base")
      .agg(sum(col("value"))).head().getDouble(0)
    assert(nb == 90.0)
  }
}
