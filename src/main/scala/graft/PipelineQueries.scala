package graft

import org.apache.spark.sql.functions._

import graft.text.Pipeline

/** Corpus-preparation pipeline queries (SURVEY §2.8 north-star): benchmark
  * decontamination, deterministic domain mixing, and both sequence-packing
  * layouts — all oracle-checked (the sampling hash and the packing
  * recurrences replay exactly in DuckDB).
  */
object PipelineQueries {

  /** Shared x8-style DuckDB token count (ceil(len/4) per whitespace word). */
  private val tokSql =
    """greatest(COALESCE(list_aggregate(
      |      list_transform(string_split_regex(trim(text), '\s+'),
      |        w -> CAST(ceil(length(w)/4.0) AS BIGINT)), 'sum'), 0), 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── X23: benchmark decontamination — word 5-gram overlap of every
    //    corpus doc against the (broadcast) eval split's gram set; the
    //    GPT-3-style n-gram leakage screen. Fully replayed in DuckDB ──
    QueryDef(
      "x23_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Pipeline.contaminationReport(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", n = 5, minShared = 1)
          .select(col("doc_id"), col("n_shared_grams"), col("n_grams"),
            round(col("overlap"), 6).as("overlap"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
          FROM documents
        ), w AS (
          SELECT doc_id, string_split(norm, ' ') AS w FROM d
        ), sh AS (
          SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-4),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS s
          FROM w WHERE len(w) >= 5
        ), corp AS (
          SELECT doc_id, len(s) AS ng, unnest(s) AS g FROM sh WHERE doc_id % 7 != 0
        ), bench AS (
          SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 7 = 0
        )
        SELECT doc_id, count(*) AS n_shared_grams,
          CAST(ng AS BIGINT) AS n_grams,
          round(count(*)::DOUBLE / ng, 6) AS overlap
        FROM corp JOIN bench USING (g)
        GROUP BY doc_id, ng
      """.stripMargin.trim)),

    // ── X24: deterministic domain mixing — per-source target sampling
    //    rates decided by the md5 hash of (seed, doc_id); the achieved
    //    sample is bit-reproducible and the oracle replays the hash ──
    QueryDef(
      "x24_domain_mix",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val rates = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.1)
        val sampled = Pipeline.stratifiedSample(
          docs, "doc_id", "source", rates, defaultRate = 1.0, seed = 42L)
        docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
          .join(sampled.groupBy(col("source")).agg(count(lit(1)).as("n_sampled")),
            Seq("source"), "left")
          .select(col("source"), col("n_total"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      },
      Some("""
        WITH u AS (
          SELECT source,
            (('0x' || substring(md5('42:' || doc_id::VARCHAR), 1, 8))::BIGINT
              / 4294967296.0) AS u,
            CASE WHEN source = 'src0' THEN 0.5
                 WHEN source = 'src1' THEN 0.25
                 WHEN source = 'src2' THEN 0.1
                 ELSE 1.0 END AS rate
          FROM documents
        )
        SELECT source, count(*) AS n_total,
          CAST(COALESCE(sum(CASE WHEN u < rate THEN 1 END), 0) AS BIGINT) AS n_sampled
        FROM u GROUP BY source
      """.stripMargin.trim)),

    // ── X25: sequence packing, concat-and-chunk (GPT-line layout: docs
    //    concatenated per source in doc_id order, the token stream cut
    //    every 256 tokens; docs may straddle chunks). Window cumsum +
    //    integer division — exact oracle ──
    QueryDef(
      "x25_seq_pack",
      (s, dir) => {
        Pipeline.packChunked(Tables.documents(s, dir),
          Seq("source"), Seq("doc_id"), "text", budget = 256L)
          .select(col("doc_id"), col("source"), col("__tok").as("n_tokens"),
            col("chunk_first"), col("n_chunks"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, source, $tokSql AS tok
          FROM documents
        ), o AS (
          SELECT doc_id, source, tok,
            CAST(COALESCE(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
          FROM t
        )
        SELECT doc_id, source, CAST(tok AS BIGINT) AS n_tokens,
          CAST(off // 256 AS BIGINT) AS chunk_first,
          CAST((off + tok - 1) // 256 - off // 256 + 1 AS BIGINT) AS n_chunks
        FROM o
      """.stripMargin.trim)),

    // ── X26: sequence packing, greedy first-fit-in-order (T5-line layout:
    //    a doc never straddles packs; new pack when the doc doesn't fit).
    //    A true remaining-capacity recurrence — Spark side rides the
    //    Recurrence kernel; the oracle replays it with a recursive CTE ──
    QueryDef(
      "x26_seq_pack_greedy",
      (s, dir) => {
        Pipeline.packGreedy(Tables.documents(s, dir),
          Seq("source"), Seq("doc_id"), "text", budget = 256L)
          .groupBy(col("source"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("total_tokens"))
      },
      Some(s"""
        WITH RECURSIVE t AS (
          SELECT doc_id, source, $tokSql AS tok,
            row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents
        ), r AS (
          SELECT source, rn, tok, CAST(0 AS BIGINT) AS pack, 256 - tok AS rem
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.source, t.rn, t.tok,
            CASE WHEN t.tok <= r.rem THEN r.pack ELSE r.pack + 1 END,
            CASE WHEN t.tok <= r.rem THEN r.rem - t.tok ELSE 256 - t.tok END
          FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1
        )
        SELECT source, pack AS pack_id, count(*) AS n_docs,
          CAST(sum(tok) AS BIGINT) AS total_tokens
        FROM r GROUP BY source, pack
      """.stripMargin.trim))
  )
}
