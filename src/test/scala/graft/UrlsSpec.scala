package graft

import org.apache.spark.sql.functions._

import graft.text.Urls

class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalize lowercases scheme/host, strips www and fragment") {
    assert(canon("HTTPS://WWW.Example.COM/a#frag") == Seq("https://example.com/a"))
  }

  test("canonicalize strips only the scheme's default port") {
    assert(canon(
      "https://h.com:443/x", "http://h.com:80/x",
      "http://h.com:443/x", "https://h.com:8443/x") ==
      Seq("https://h.com/x", "http://h.com/x",
        "http://h.com:443/x", "https://h.com:8443/x"))
  }

  test("canonicalize normalizes path: trailing slashes stripped, empty becomes /") {
    assert(canon("https://h.com/a/b/", "https://h.com", "https://h.com/?q=1") ==
      Seq("https://h.com/a/b", "https://h.com/", "https://h.com/?q=1"))
  }

  test("canonicalize drops trackers and sorts surviving params") {
    assert(canon(
      "https://h.com/p?utm_source=f&b=2&a=1",
      "https://h.com/p?a=1&utm_campaign=x&b=2",
      "https://h.com/p?gclid=z&fbclid=y&ref=t") ==
      Seq("https://h.com/p?a=1&b=2", "https://h.com/p?a=1&b=2", "https://h.com/p"))
  }

  test("param-order and tracker variants of one URL collapse to one group") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://www.h.com/p?b=2&a=1&utm_source=s"),
      (2L, "HTTPS://h.com:443/p/?a=1&b=2#x"),
      (3L, "https://h.com/p?a=1&b=2"),
      (4L, "https://h.com/other")).toDF("doc_id", "url")
    val got = Urls.dedupByUrl(df, "url", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("https://h.com/p?a=1&b=2", 3L, 1L), ("https://h.com/other", 1L, 4L)))
  }

  test("schemeless or malformed input canonicalizes consistently, never errors") {
    // both malformed twins collapse to the same canonical form
    val c = canon("not a url", "not a url")
    assert(c(0) == c(1))
  }
}
