package graft

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.functions._

import graft.ingest.DocxReader
import graft.pipeline.Extract

/** End-to-end parity on the reference's actual ingest corpus — the
  * SafeMobile 15.0 installation manual (`BASELINE.md`: 2,362 paragraphs,
  * 70 tables, 9 images, ~107 KB visible text). This is the only
  * real-world OOXML the reference ships: localized style names resolved
  * through styles.xml, Russian figure/table captions, vMerge'd tables —
  * none of which the synthetic fixtures cover.
  */
class ReferenceDocxSpec extends SparkSpec {
  import spark.implicits._

  private val refDir = "/root/reference"
  private val refName = "Руководство_по_установке_и_настройке_SafeMobile_15.0.docx"
  private val refFile = java.nio.file.Paths.get(refDir, refName)

  private def requireManual(): Unit =
    assume(java.nio.file.Files.exists(refFile), s"reference manual not present at $refFile")

  /** Raw OOXML facts, counted the way BASELINE.md counts them: every
    * `w:p` anywhere in document.xml (top-level and inside table cells)
    * and every visible `w:t` character. */
  private def rawOoxmlFacts(bytes: Array[Byte]): (Int, Long) = {
    val W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    var docXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null && docXml == null) {
        if (e.getName == "word/document.xml") docXml = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(docXml))
    var nPara = 0
    var nChars = 0L
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getNamespaceURI == W =>
          r.getLocalName match {
            case "p" => nPara += 1
            case "t" => nChars += r.getElementText.length
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    (nPara, nChars)
  }

  test("BASELINE corpus facts: 2362 paragraphs, 70 tables, 9 images, ~107KB text") {
    requireManual()
    val bytes = java.nio.file.Files.readAllBytes(refFile)

    val (nParaAll, nChars) = rawOoxmlFacts(bytes)
    assert(nParaAll == 2362, "total w:p (incl. table-cell paragraphs)")
    assert(nChars > 100000L && nChars < 112000L, s"~107 KB visible text, got $nChars")

    val blocks = DocxReader.parseBytes(refName, bytes)
    assert(blocks.count(_.kind == "table") == 70)
    assert(blocks.map(_.image_rel_ids.size).sum == 9)
    assert(blocks.count(_.kind == "para") == 1081) // body-level paragraphs
    // document order is dense and gapless
    assert(blocks.map(_.seq) == (0L until blocks.size.toLong))
    // localized built-in styles resolve to python-docx UI names
    assert(blocks.exists(b => b.style.startsWith("Heading ")))
    // media parts reachable from document.xml.rels: 10 PNG image rels
    // (the package holds 13 media files; 3 are not referenced there)
    val media = DocxReader.mediaBytes(refName, bytes)
      .filter(_.target.startsWith("media/"))
    assert(media.count(_.target.endsWith(".png")) == 10)
    assert(blocks.flatMap(_.image_rel_ids).toSet.subsetOf(media.map(_.rel_id).toSet))
  }

  test("real image decode: the manual's PNGs through the multimodal pipeline") {
    requireManual()
    import graft.multimodal.Multimodal
    val bytes = java.nio.file.Files.readAllBytes(refFile)
    val media = DocxReader.mediaBytes(refName, bytes)
      .filter(_.target.endsWith(".png"))
    val assets = media.map(m => (m.rel_id, "image", m.bytes))
      .toDF("asset_id", "kind", "media")

    val decoded = Multimodal.withFeatures(assets, Multimodal.ImageIoDecoder()).cache()
    assert(decoded.count() == 10)
    // every PNG truly decodes: positive dims, real screenshots are wide
    val dims = decoded.select("width", "height").as[(Int, Int)].collect()
    assert(dims.forall { case (w, h) => w > 0 && h > 0 })
    assert(dims.exists { case (w, _) => w > 200 }, s"dims: ${dims.toSeq}")
    // features are real color layouts (not all-zero, within [0,1])
    val feats = decoded.select("features").as[Seq[Float]].collect()
    assert(feats.forall(f => f.length == 48 && f.forall(x => x >= 0f && x <= 1f)))
    assert(feats.exists(_.exists(_ > 0.05f)))

    // resize: every output fits 256 and payloads re-decode at the new dims
    val resized = Multimodal.resizeImages(assets, maxSide = 256)
    val outDims = resized.select("out_width", "out_height").as[(Int, Int)].collect()
    assert(outDims.forall { case (w, h) => math.max(w, h) <= 256 && w > 0 && h > 0 })
  }

  test("distributed extractor pipeline over the real manual") {
    requireManual()
    val blocks = DocxReader.read(spark, refDir).cache()
    try {
      assert(blocks.select("doc_id").distinct().as[String].collect().toSeq == Seq(refName))
      assert(blocks.count() == 1081 + 70)

      // sections: iter_sections drop rules (docx_parser.py:54-86) — only
      // heading-titled sections, no empty bodies, no blank paragraphs kept
      val secs = Extract.sections(blocks).cache()
      val n = secs.count()
      assert(n > 50, s"expected a rich section structure, got $n")
      assert(secs.filter(length(trim(col("title"))) === 0).count() == 0)
      assert(secs.filter(length(trim(col("text"))) === 0).count() == 0)

      // captioned assets: the manual numbers its figures/tables in Russian
      val assets = Extract.assets(blocks).cache()
      val byKind = assets.groupBy("kind").count().as[(String, Long)].collect().toMap
      assert(byKind.getOrElse("table", 0L) > 0, s"kinds: $byKind")
      assert(assets.select("filename").distinct().count() == assets.count(),
        "filenames are collision-suffixed unique")

      // table cells flow to CSV-ready rows; vMerge continuations carry
      // the merge-origin content (39 vMerge cells in this manual)
      val cells = Extract.tableRows(blocks)
      assert(cells.count() > 100)

      // full ingest: every index row unit-normalized, version denormalized
      val idx = Extract.ingest(blocks, version = "15.0",
        embedder = graft.embed.HashingEmbedder(128))
      val norms = idx.select(graft.index.VectorIndex.l2Norm(col("embedding")))
        .as[Double].collect()
      assert(norms.nonEmpty)
      norms.foreach(x => assert(math.abs(x - 1.0) < 1e-9))
    } finally blocks.unpersist()
  }
}
