package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlOps

/** [[UrlOps]] — RFC 3986 §6 canonicalization semantics, pinned case by
  * case, plus extraction from running text and idempotence.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()

  test("scheme/host lowercased, www and default port stripped, path case kept") {
    assert(canon("HTTPS://WWW.Example.COM:443/Docs/Page") == "https://example.com/Docs/Page")
    assert(canon("HTTP://Example.com:80/a") == "http://example.com/a")
  }

  test("non-default ports and userinfo") {
    assert(canon("http://user:pw@example.com:8080/a/") == "http://example.com:8080/a")
    assert(canon("https://example.com:80/x") == "https://example.com:80/x") // 80 not default for https
  }

  test("fragment dropped, tracking params dropped, remaining params sorted") {
    assert(canon("https://ex.org/p?utm_source=x&b=2&a=1#frag") == "https://ex.org/p?a=1&b=2")
    assert(canon("https://ex.org/p?gclid=1&fbclid=2&ref=3&utm_medium=m") == "https://ex.org/p")
    assert(canon("https://ex.org/?z=1&y=2") == "https://ex.org?y=2&z=1")
  }

  test("trailing slashes and sentence punctuation trimmed; bare host stable") {
    assert(canon("https://ex.org/a/b/") == "https://ex.org/a/b")
    assert(canon("https://ex.org/a/b.") == "https://ex.org/a/b")
    assert(canon("https://ex.org/a;") == "https://ex.org/a")
    assert(canon("https://ex.org") == "https://ex.org")
    assert(canon("https://ex.org/") == "https://ex.org")
  }

  test("canonicalization is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/Page/?utm_source=f&b=2&a=1#x",
      "http://u:p@cdn.ex.org:8080/lib/",
      "https://ex.org",
      "https://ex.org/p?a=1")
    urls.foreach { u =>
      val once = canon(u)
      assert(canon(once) == once, s"not idempotent for $u")
    }
  }

  test("extractUrls finds all URLs case-insensitively, bounded by whitespace") {
    val text = "see HTTPS://A.com/x and http://b.org/y?q=1. done"
    val got = Seq(text).toDF("t")
      .select(explode(UrlOps.extractUrls(col("t"))).as("u"))
      .as[String].collect().toSeq
    assert(got == Seq("HTTPS://A.com/x", "http://b.org/y?q=1."))
  }

  test("urlHost strips userinfo, www and port from raw or canonical URLs") {
    val hosts = Seq(
      "https://WWW.Example.com:8443/a",
      "http://u:p@sub.ex.org/b",
      "https://plain.io").toDF("u")
      .select(UrlOps.urlHost(col("u")).as("h")).as[String].collect().toSeq
    assert(hosts == Seq("example.com", "sub.ex.org", "plain.io"))
  }
}
