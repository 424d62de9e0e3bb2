package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * URL canonicalization (`TextOps.canonicalUrl`/`urlHost`/
 * `registeredDomain`/`urlPathDepth`) — the web-corpus URL-dedup key.
 * Hand-pinned canonical forms for the adversarial cases: mixed case,
 * www, default/non-default ports, tracking params in every position,
 * fragments, trailing slashes, bare hosts, cc-SLD domains, non-URLs.
 */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(TextOps.canonicalUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("canonicalUrl collapses case/www/default-port/tracking/" +
      "fragment/trailing-slash variants to one key") {
    assert(canon(
      "HTTPS://WWW.Site.COM:443/a/?utm_source=x#frag",
      "https://site.com/a",
      "https://www.site.com/a/",
      "https://Site.com:443/a?utm_campaign=y&utm_medium=z"
    ).distinct === Seq("https://site.com/a"))
    // tracking params between real ones keep the real ones
    assert(canon("http://h.io/p?a=1&utm_source=s&b=2&gclid=g") ===
      Seq("http://h.io/p?a=1&b=2"))
    // all params tracking -> query gone entirely
    assert(canon("http://h.io/p?utm_a=1&fbclid=2&ref=3") ===
      Seq("http://h.io/p"))
    // non-default port survives; bare host loses trailing slash
    assert(canon("http://h.io:8080/x", "https://h.io/") ===
      Seq("http://h.io:8080/x", "https://h.io"))
    // non-URL text passes through (fragment strip only)
    assert(canon("not a url", "hello#world") ===
      Seq("not a url", "hello"))
  }

  test("urlHost, registeredDomain heuristic, and path depth") {
    val df = Seq(
      "https://a.b.site.co.uk/x/y?q=1",
      "https://deep.sub.example.com/1/2/3/",
      "https://example.com",
      "plain text").toDF("u")
    val rows = df.select(
      TextOps.urlHost(col("u")).as("h"),
      TextOps.registeredDomain(TextOps.urlHost(col("u"))).as("d"),
      TextOps.urlPathDepth(TextOps.canonicalUrl(col("u"))).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows(0) === (("a.b.site.co.uk", "site.co.uk", 2)),
      "cc-SLD keeps three labels")
    assert(rows(1) === (("deep.sub.example.com", "example.com", 3)))
    assert(rows(2) === (("example.com", "example.com", 0)))
    assert(rows(3) === (("", "", 0)))
  }
}
