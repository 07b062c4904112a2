package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the first dedup stage of
  * every web-crawl corpus pipeline (RefinedWeb §3.2 runs URL dedup before
  * any content-based stage because it is orders of magnitude cheaper: a
  * string normalization plus one hash shuffle, no tokenization, no
  * shingles).
  *
  * [[canonicalize]] is RFC-3986-lite normalization as a pure codegen'd
  * expression chain (regexp extract/replace + array HOFs — no UDF, stays
  * inside whole-stage codegen):
  *   - scheme and host lowercased; fragment dropped
  *   - leading `www.` and the scheme's default port (`:80` http /
  *     `:443` https) stripped from the host
  *   - trailing slashes stripped from the path; empty path → `/`
  *   - tracking query params dropped (`utm_*`, `gclid`, `fbclid`,
  *     `msclkid`, `mc_cid`, `mc_eid`, `ref`), remaining params sorted so
  *     param order cannot defeat the dedup
  *
  * Scale shape: canonicalization is a narrow projection; the dedup is one
  * hash-partition shuffle on the canonical string (the same shape as
  * [[TextOps.exactDedup]]) with map-side partial aggregation. At 100 TB
  * this stage runs BEFORE content hashing so the expensive stages see each
  * canonical URL once.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  /** Params dropped during canonicalization (click/campaign trackers). */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)(=|$)"

  /** Canonical form of `url` per the rules above. URLs without a
    * `scheme://` prefix canonicalize to the empty-host form and simply
    * group with their identical twins — garbage in, consistent garbage
    * out, never an error.
    */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val host0 = lower(regexp_extract(noFrag, SchemeRe + "([^/?]*)", 2))
    val host1 = regexp_replace(host0, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(host1, ":443$", ""))
      .when(scheme === "http", regexp_replace(host1, ":80$", ""))
      .otherwise(host1)
    val path0 = regexp_extract(noFrag, SchemeRe + "[^/?]*([^?]*)", 2)
    val path1 = regexp_replace(path0, "/+$", "")
    val path = when(path1 === "", lit("/")).otherwise(path1)
    val q0 = regexp_extract(noFrag, "\\?(.*)", 1)
    val keep = filter(split(q0, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val qs = array_join(array_sort(keep), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Group `df` by the canonical form of `urlCol`: one row per canonical
    * URL with its duplicate count and the deterministic keeper
    * (min `idCol`). One shuffle, map-side combined.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))
}
