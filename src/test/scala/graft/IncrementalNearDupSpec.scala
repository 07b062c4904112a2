package graft

import org.apache.spark.sql.functions._

import graft.text.IncrementalNearDup

/** Incremental MinHash near-dup index: bootstrap, cross-batch drops,
  * re-ingest idempotence, short-doc fallback.
  */
class IncrementalNearDupSpec extends SparkSpec {

  private def freshPath(tag: String): String = {
    val p = s"${Scratch.sub("neardup-test")}/$tag"
    IncrementalNearDup.dropIndex(spark, p)
    p
  }

  /** A long distinct doc: `n` tokens seeded by `tag`. */
  private def longDoc(tag: String, n: Int = 60): String =
    (0 until n).map(i => s"$tag${i * 31 % 97}w").mkString(" ")

  /** `doc` with one middle token replaced — trigram Jaccard ≈ 0.9. */
  private def nearVariant(doc: String): String = {
    val w = doc.split(" ")
    w.updated(w.length / 2, "changedtoken").mkString(" ")
  }

  test("within-batch near-dups drop; distinct docs survive") {
    import spark.implicits._
    val a = longDoc("alpha")
    val batch = Seq(
      (1L, a),
      (2L, nearVariant(a)), // near-dup of 1 -> dropped
      (3L, longDoc("gamma"))
    ).toDF("doc_id", "text")
    val path = freshPath("within")
    val surv = IncrementalNearDup
      .dedupIncremental(batch, "doc_id", "text", path)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(surv == Seq(1L, 3L))
  }

  test("cross-batch: near-dups and exact dups of indexed docs drop") {
    import spark.implicits._
    val a = longDoc("alpha")
    val c = longDoc("gamma")
    val path = freshPath("cross")
    val b1 = Seq((1L, a), (3L, c)).toDF("doc_id", "text")
    val s1 = IncrementalNearDup.dedupIncremental(b1, "doc_id", "text", path)
    assert(s1.count() == 2)

    val b2 = Seq(
      (4L, nearVariant(a)), // near-dup of indexed 1 -> dropped
      (5L, longDoc("delta")), // fresh -> survives
      (6L, c) // exact text of indexed 3 -> dropped
    ).toDF("doc_id", "text")
    val s2 = IncrementalNearDup.dedupIncremental(b2, "doc_id", "text", path)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s2 == Seq(5L))
  }

  test("re-ingest is a no-op: every survivor self-collides at est 1.0") {
    import spark.implicits._
    val path = freshPath("idem")
    val b = Seq((1L, longDoc("alpha")), (2L, longDoc("beta")))
      .toDF("doc_id", "text")
    assert(IncrementalNearDup.dedupIncremental(b, "doc_id", "text", path).count() == 2)
    assert(IncrementalNearDup.dedupIncremental(b, "doc_id", "text", path).count() == 0)
  }

  test("short docs ride the normalized-text fallback shingle") {
    import spark.implicits._
    val path = freshPath("short")
    // below the 3-word shingle floor: state is the normalized text itself
    val b1 = Seq((1L, "tiny doc"), (2L, "other one")).toDF("doc_id", "text")
    assert(IncrementalNearDup.dedupIncremental(b1, "doc_id", "text", path).count() == 2)
    val b2 = Seq(
      (3L, "  TINY   doc "), // normalizes to indexed 1 -> dropped
      (4L, "fresh short")
    ).toDF("doc_id", "text")
    val s2 = IncrementalNearDup.dedupIncremental(b2, "doc_id", "text", path)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s2 == Seq(4L))
  }

  test("survivors keep their original batch columns") {
    import spark.implicits._
    val path = freshPath("cols")
    val b = Seq((1L, longDoc("alpha"), "web"), (2L, longDoc("beta"), "code"))
      .toDF("doc_id", "text", "source")
    val out = IncrementalNearDup.dedupIncremental(b, "doc_id", "text", path)
    assert(out.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(out.count() == 2)
  }

  test("deleteFromIndex: erased doc's near-dups readmit; other residents still block theirs") {
    import spark.implicits._
    val path = freshPath("delete")
    val a = longDoc("alpha")
    val g = longDoc("gamma")
    val b1 = Seq((1L, a), (3L, g)).toDF("doc_id", "text")
    assert(IncrementalNearDup.dedupIncremental(b1, "doc_id", "text", path)
      .count() == 2)
    // erase doc 1; a deletion of a never-indexed doc removes nothing
    val removed = IncrementalNearDup.deleteFromIndex(
      spark, path, Seq((1L, a), (99L, longDoc("ghost"))).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(removed == 1L, s"removed $removed")
    // the erased doc's state is gone: no __id=1 rows on either side
    val ids = spark.read.parquet(s"$path/state")
      .select("__id").as[Long].collect().toSet
    assert(ids == Set(3L))
    // a near-variant of the erased content now survives ingest, while a
    // near-variant of the REMAINING resident is still dropped
    val b2 = Seq((10L, nearVariant(a)), (11L, nearVariant(g)))
      .toDF("doc_id", "text")
    val s2 = IncrementalNearDup.dedupIncremental(b2, "doc_id", "text", path)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s2 == Seq(10L), s"got $s2")
  }

  test("LSH parameters persist in meta: mismatched ingest rejected, delete/compact read them") {
    import spark.implicits._
    val path = freshPath("meta")
    val a = longDoc("alpha")
    val b1 = Seq((1L, a), (2L, longDoc("beta"))).toDF("doc_id", "text")
    // bootstrap with a non-default quadruple
    assert(IncrementalNearDup.dedupIncremental(
      b1, "doc_id", "text", path, numHashes = 64, bands = 8, nBuckets = 8)
      .count() == 2)
    // a later batch with drifted structural params is rejected loudly
    val e = intercept[IllegalArgumentException] {
      IncrementalNearDup.dedupIncremental(
        Seq((3L, longDoc("gamma"))).toDF("doc_id", "text"),
        "doc_id", "text", path) // defaults: 128 hashes, 16 bands, 64 buckets
    }
    assert(e.getMessage.contains("persisted"), e.getMessage)
    // deleteFromIndex with WRONG caller params still erases correctly —
    // it reads the persisted meta, not the arguments
    val removed = IncrementalNearDup.deleteFromIndex(
      spark, path, Seq((1L, a)).toDF("doc_id", "text"), "doc_id", "text",
      shingleN = 5, numHashes = 32, bands = 4, nBuckets = 16)
    assert(removed == 1L, s"removed $removed")
    assert(spark.read.parquet(s"$path/state")
      .select("__id").as[Long].collect().toSet == Set(2L))
    // a re-bucketing compact records the new bucket count, and a
    // subsequent ingest ADOPTS it (buckets are layout, not sketch
    // structure) — even with a stale caller value the append lands in
    // the compacted layout
    IncrementalNearDup.compactIndex(spark, path, nBuckets = Some(4))
    assert(IncrementalNearDup.readMeta(spark, path).map(_.nBuckets)
      .contains(4))
    assert(IncrementalNearDup.dedupIncremental(
      Seq((4L, longDoc("delta"))).toDF("doc_id", "text"),
      "doc_id", "text", path, numHashes = 64, bands = 8, nBuckets = 8)
      .count() == 1)
    val buckets = spark.read.parquet(s"$path/state")
      .selectExpr("cast(__b as long)").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(buckets.forall(_ < 4), s"append escaped the compacted layout: $buckets")
  }
}
