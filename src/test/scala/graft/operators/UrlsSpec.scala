package graft.operators

import graft.SparkTestBase

/** URL component extraction semantics, including the cases the x35
  * injected URLs don't exercise (deep subdomains, missing params).
  */
class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  test("urlParts: host, registered domain, path, query param") {
    val docs = Seq(
      (0L, "https://a.b.example.com/deep/path/page?q=1&id=42"),
      (1L, "http://example.org/?id=7"),
      (2L, "https://plain.net/nopath")) // no query → param null
      .toDF("doc_id", "url")
    val out = Urls.urlParts(docs, "url", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "a.b.example.com")
    assert(out(0).getString(2) == "example.com") // last two labels, deep subdomain
    assert(out(0).getString(3) == "/deep/path/page")
    assert(out(0).getString(4) == "42")
    assert(out(1).getString(2) == "example.org" && out(1).getString(4) == "7")
    assert(out(2).getString(2) == "plain.net" && out(2).isNullAt(4))
  }

  test("domainStats aggregates docs and token volume per registered domain") {
    val parts = Urls.urlParts(Seq(
        (0L, "https://x.site.com/a"), (1L, "https://y.site.com/b"),
        (2L, "https://other.net/c")).toDF("doc_id", "url"), "url", "doc_id")
    val docs = Seq((0L, "one two"), (1L, "three"), (2L, "four five six"))
      .toDF("doc_id", "text")
    val out = Urls.domainStats(parts, docs, "text")
      .orderBy("reg_domain").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("other.net", 1L, 3L), ("site.com", 2L, 3L)))
  }
}
