package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.ingest.{HtmlText, Warc}

/** WARC/WET ingestion: byte-exact record parsing, Common Crawl's
  * multi-member gzip, the HTTP-envelope strip, and the full
  * WARC → HtmlText → sanitize → WebDataset chain. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(t: String, uri: String, ctype: String, payload: Array[Byte]): Array[Byte] = {
    val h = s"WARC/1.0\r\nWARC-Type: $t\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    h.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private val html =
    "<html><head><title>Page</title><script>var x=1;</script></head>" +
      "<body><p>Real prose &amp; more.</p></body></html>"
  private def httpPayload(body: String): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body).getBytes(UTF_8)

  // a BINARY payload containing the record separator bytes — only
  // Content-Length-exact parsing survives this; delimiter scanning dies
  private val binaryPayload: Array[Byte] =
    Array[Byte](1, 2, 13, 10, 13, 10, 3, 4) ++ "WARC/1.0 fake".getBytes(UTF_8)

  private def archive: Array[Byte] =
    rec("warcinfo", "", "application/warc-fields", "robots: classic\r\n".getBytes(UTF_8)) ++
      rec("response", "http://ex.com/a", "application/http; msgtype=response", httpPayload(html)) ++
      rec("resource", "http://ex.com/img", "image/png", binaryPayload) ++
      rec("conversion", "http://ex.com/a", "text/plain", "pre-extracted text".getBytes(UTF_8))

  test("parse is byte-exact: types, uris, and binary payloads with embedded separators") {
    val got = Warc.parse(new ByteArrayInputStream(archive)).toSeq
    assert(got.map(_.warcType) === Seq("warcinfo", "response", "resource", "conversion"))
    assert(got(1).uri === "http://ex.com/a")
    assert(got(2).payload.toSeq === binaryPayload.toSeq)
    assert(new String(Warc.httpBody(got(1).payload), UTF_8) === html)
  }

  test("multi-member gzip (the Common Crawl layout) reads as one stream") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // one member per record — how crawl dumps are actually written
    val multi = gz(rec("warcinfo", "", "application/warc-fields", "x".getBytes(UTF_8))) ++
      gz(rec("response", "http://ex.com/a", "application/http", httpPayload(html))) ++
      gz(rec("conversion", "http://ex.com/a", "text/plain", "t".getBytes(UTF_8)))
    val dir = Files.createTempDirectory("graft-warc").toString
    Files.write(Paths.get(dir, "part-00000.warc.gz"), multi)
    val got = Warc.read(spark, s"$dir/*.warc.gz").collect()
    assert(got.length === 3)
    assert(got.map(_.getString(1)).toSeq === Seq("warcinfo", "response", "conversion"))
  }

  test("pages() strips the HTTP envelope and feeds HtmlText; wetText() reads conversions") {
    val dir = Files.createTempDirectory("graft-warc").toString
    Files.write(Paths.get(dir, "a.warc"), archive)
    val pages = Warc.pages(spark, s"$dir/*.warc")
    val withText = HtmlText.withText(pages, "html").collect()
    assert(withText.length === 1)
    val r = withText.head
    assert(r.getAs[String]("title") === "Page")
    assert(r.getAs[String]("text") === "Real prose & more.")
    val wet = Warc.wetText(spark, s"$dir/*.warc").collect()
    assert(wet.length === 1 && wet.head.getAs[String]("text") === "pre-extracted text")
  }

  test("a truncated record fails loudly instead of silently dropping the tail") {
    val cut = archive.take(archive.length - 30)
    val ex = intercept[Exception] {
      Warc.parse(new ByteArrayInputStream(cut)).toSeq
    }
    assert(ex.getMessage.toLowerCase.contains("truncated") ||
      ex.getMessage.toLowerCase.contains("warc"))
  }

  test("the full web path: WARC -> HtmlText -> sanitize -> WebDataset shards") {
    val dir = Files.createTempDirectory("graft-warc").toString
    val many = (0 until 6).map { i =>
      rec("response", s"http://ex.com/p$i", "application/http",
        httpPayload(s"<html><title>T$i</title><body><p>Document $i body &amp; prose.</p>" +
          "<script>junk()</script></body></html>"))
    }.reduce(_ ++ _)
    Files.write(Paths.get(dir, "crawl.warc"), many)
    val docs = HtmlText.withText(Warc.pages(spark, s"$dir/*.warc"), "html")
      .withColumn("text", graft.ops.TextSanitize.sanitize(org.apache.spark.sql.functions.col("text")))
      .withColumn("key", org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.col("url"), "[^a-z0-9]+", "-"))
    val out = Files.createTempDirectory("graft-wds-out").toString
    val manifest = graft.pipeline.WebDataset.writeShards(
      docs.repartition(2), out, Seq("text" -> "txt", "title" -> "title"), keyCol = "key")
    assert(manifest.agg(org.apache.spark.sql.functions.sum("samples")).head.getLong(0) === 6L)
    val back = graft.pipeline.WebDataset.readShards(spark, out)
      .filter(org.apache.spark.sql.functions.col("ext") === "txt").collect()
    assert(back.length === 6)
    back.foreach { r =>
      val t = new String(r.getAs[Array[Byte]]("data"), UTF_8)
      assert(t.contains("body & prose") && !t.contains("junk"), t)
    }
  }
}
