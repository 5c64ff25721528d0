package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{HtmlText, Warc}

/** Fuzz the web-ingest parsers: random binary payloads round-trip the
  * WARC parser byte-exactly, random truncations fail loudly or parse a
  * clean prefix (never hang, never silently absorb garbage), and
  * random byte soup through the HTML extractor never throws. */
class WarcFuzzSpec extends AnyFunSuite {

  private def rec(rnd: scala.util.Random, i: Int): (String, Array[Byte], Array[Byte]) = {
    val uri = s"http://f.ex/$i"
    val payload = Array.fill[Byte](rnd.nextInt(2000))(rnd.nextInt(256).toByte)
    val header = (s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/octet-stream\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes(UTF_8)
    (uri, payload, header ++ payload ++ "\r\n\r\n".getBytes(UTF_8))
  }

  test("random binary payloads round-trip byte-exactly (300 records over 10 seeds)") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val recs = (0 until 30).map(rec(rnd, _))
      val archive = recs.map(_._3).reduce(_ ++ _)
      val got = Warc.parse(new ByteArrayInputStream(archive)).toSeq
      assert(got.size === 30)
      got.zip(recs).foreach { case (g, (uri, payload, _)) =>
        assert(g.uri === uri)
        assert(g.payload.toSeq === payload.toSeq)
      }
    }
  }

  test("random truncation points: clean prefix or loud failure, never a silent partial record") {
    val rnd = new scala.util.Random(99)
    val recs = (0 until 10).map(rec(rnd, _))
    val archive = recs.map(_._3).reduce(_ ++ _)
    (1 to 60).foreach { _ =>
      val cut = 1 + rnd.nextInt(archive.length - 1)
      val parsed =
        try Right(Warc.parse(new ByteArrayInputStream(archive.take(cut))).toSeq)
        catch { case e: Exception => Left(e) }
      parsed match {
        case Right(rs) =>
          // every parsed record must be one of the real ones, intact
          rs.foreach { r =>
            val orig = recs.find(_._1 == r.uri)
            assert(orig.isDefined && r.payload.toSeq === orig.get._2.toSeq,
              s"cut=$cut yielded a corrupted record for ${r.uri}")
          }
        case Left(_) => () // loud failure is the accepted outcome
      }
    }
  }

  test("the HTML extractor survives arbitrary byte soup and truncated markup") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val junk = new String(
        Array.fill[Byte](rnd.nextInt(500))(rnd.nextInt(256).toByte), UTF_8)
      val e = HtmlText.extract(junk) // must not throw
      assert(e.text != null && e.title != null)
    }
    // structured-but-broken markup
    Seq("<p><b><i>deep <", "<script>x", "<!-- open", "<![CDATA[ open",
      "<p attr='unclosed", "&#xffffffffff;", "<>", "</>")
      .foreach(h => HtmlText.extract(h))
  }
}
