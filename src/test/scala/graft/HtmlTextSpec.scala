package graft

import graft.ingest.HtmlText

/** HTML → text extraction: the web-corpus ingest step. Pins the
  * failure modes that actually poison training text — JS leakage,
  * attribute `>` mis-parsing, entity corruption, word-splitting inline
  * tags — plus malformed-input robustness. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String = HtmlText.extract(html).text

  test("basic page: title captured, blocks become lines, inline tags vanish in place") {
    val e = HtmlText.extract(
      """<html><head><title> My  Page </title></head>
        |<body><h1>Heading</h1><p>First <b>bo</b>ld paragraph.</p>
        |<p>Second</p></body></html>""".stripMargin)
    assert(e.title === "My Page")
    assert(e.text === "Heading\nFirst bold paragraph.\nSecond")
  }

  test("script/style/noscript content is dropped whole, even with tricky closers") {
    val t = text(
      """<p>before</p><script type="text/javascript">
        |var x = "</scriptx>"; if (a < b && c > d) { alert('</ '); }
        |</script><style>.c { content: "</style-not" }</style>
        |<noscript><p>fallback junk</p></noscript><p>after</p>""".stripMargin)
    assert(t === "before\nafter")
  }

  test("a '>' inside a quoted attribute does not end the tag") {
    val t = text("""<p data-json='{"a": "x>y"}' onclick="f(1>0)">kept</p>""")
    assert(t === "kept")
  }

  test("comments, CDATA, doctype and processing instructions vanish") {
    val t = text(
      "<!DOCTYPE html><?xml version=\"1.0\"?><!-- note <p>nope</p> -->" +
        "<p>body<![CDATA[ <raw> ]]></p>")
    assert(t === "body")
  }

  test("character references decode; invalid ones pass through literally") {
    assert(text("<p>a &amp; b &lt;c&gt; &quot;q&quot; &nbsp;s &#233;t&#xE9; &copy;</p>")
      === "a & b <c> \"q\" s été ©")
    assert(text("<p>AT&T and &unknown; and &#xZZ; stay</p>")
      === "AT&T and &unknown; and &#xZZ; stay")
  }

  test("whitespace collapses per line; blank runs fold to one separator") {
    val t = text("<div>  a   b  </div><div></div><div></div><div>c</div>")
    assert(t === "a b\nc")
  }

  test("malformed input never throws: unclosed tags, stray brackets, null") {
    assert(text("<p>tail cut <b unclosed") === "tail cut")
    assert(text("2 < 3 and 5 > 4") === "2 4")      // bare '<' starts a dropped pseudo-tag
    assert(text("<script>never closed") === "")
    assert(HtmlText.extract(null) === HtmlText.Extracted("", ""))
  }

  test("withText maps a frame scan-locally and keeps other columns") {
    val df = Seq(
      (1L, "<html><title>T1</title><p>one</p></html>"),
      (2L, "<p>two &amp; two</p>")).toDF("id", "html").repartition(2)
    val got = HtmlText.withText(df).select("id", "title", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L) === (("T1", "one")))
    assert(got(2L) === (("", "two & two")))
  }

  test("the extracted text feeds the existing pipeline stages cleanly") {
    val html =
      """<html><body><p>The quick brown fox jumps over the lazy dog in the field.</p>
        |<script>trackUser({"id": 42});</script>
        |<p>Contact us at info@example.com for details.</p></body></html>""".stripMargin
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val extracted = HtmlText.withText(df, "html")
    val masked = extracted.withColumn("text",
      graft.ops.TextSanitize.sanitize(org.apache.spark.sql.functions.col("text")))
    val t = masked.select("text").head.getString(0)
    assert(!t.contains("trackUser"), "no JS in the corpus")
    assert(t.contains("<EMAIL>") && !t.contains("info@example.com"), "PII masked downstream")
  }
}
