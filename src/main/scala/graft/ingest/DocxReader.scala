package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — DOCX scan. The reference iterates a document's body paragraphs
  * and tables in document order via python-docx
  * (`scripts/parsers/docx_parser.py:89-95`). No Spark connector exists
  * for DOCX, so this is a pure-Scala OOXML reader: `ZipInputStream` over
  * the package, StAX (`javax.xml.stream`) over `word/document.xml`,
  * emitting one block row per paragraph/table in order. Styles are
  * resolved to display names through `word/styles.xml` (python-docx
  * semantics — the shipped manual's localized styles resolve there), and
  * image relationship ids through `word/_rels/document.xml.rels`.
  *
  * Distribution model: one task per file (`binaryFile` source →
  * `flatMap` parse). A DOCX is a single zip — intrinsically unsplittable
  * — so parallelism comes from the corpus, which is the 100 TB shape
  * (many documents), not from within one file.
  */
object DocxReader {

  /** One body block: a paragraph or a table, in document order. */
  case class Block(
      doc_id: String,
      seq: Long,
      kind: String, // "para" | "table"
      style: String,
      text: String,
      table_cells: Seq[Seq[String]],
      image_rel_ids: Seq[String])

  /** A binary part of the package (images under word/media/). */
  case class Media(doc_id: String, rel_id: String, target: String, bytes: Array[Byte])

  private val WNS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
  private val RNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** python-docx BabelFish parity: Word writes the built-in heading
    * styles into styles.xml under lowercase internal names ("heading 1"),
    * but python-docx reports the capitalized UI alias — which is what the
    * reference's `startswith("Heading")` gate sees
    * (`docx_parser.py:72-73`). python-docx aliases exactly the nine
    * heading styles and nothing else. */
  private val babelFish: Map[String, String] =
    (1 to 9).map(i => s"heading $i" -> s"Heading $i").toMap

  @inline private def uiStyleName(internal: String): String =
    babelFish.getOrElse(internal, internal)

  /** Per-entry inflation cap. Zip headers declare sizes but liars are
    * cheap: a "zip bomb" part compresses kilobytes into gigabytes and
    * would OOM the executor through `readAllBytes`. The cap bounds the
    * ACTUALLY inflated bytes (headers are never trusted); 256 MiB is
    * far beyond any real OOXML part. */
  private[graft] val MaxEntryBytes: Int = 256 << 20

  /** Word caps tables at 63 columns; a crafted `gridSpan` of 2^30 would
    * otherwise OOM via merged-cell replication. Generous headroom. */
  private val MaxGridSpan = 512

  private def readCapped(zin: ZipInputStream, cap: Int): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(8192)
    val tmp = new Array[Byte](64 * 1024)
    var n = zin.read(tmp)
    while (n >= 0) {
      if (buf.size + n > cap)
        throw new java.io.IOException(s"zip entry inflates past $cap bytes")
      buf.write(tmp, 0, n)
      n = zin.read(tmp)
    }
    buf.toByteArray
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] =
    zipEntries(bytes, MaxEntryBytes, salvage = false)

  /** `salvage = true` keeps the entries inflated before the first
    * failure (truncated archive, bombing entry) instead of failing the
    * whole package — the lenient corpus-ingest mode. */
  private[graft] def zipEntries(
      bytes: Array[Byte], cap: Int, salvage: Boolean): Map[String, Array[Byte]] = {
    val out = Map.newBuilder[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      try {
        var e = zin.getNextEntry
        while (e != null) {
          if (!e.isDirectory) out += (e.getName -> readCapped(zin, cap))
          e = zin.getNextEntry
        }
      } catch { case e: Exception => if (!salvage) throw e }
    } finally zin.close()
    out.result()
  }

  private def newReader(xml: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  /** styleId → display name from word/styles.xml. */
  private[ingest] def parseStyles(xml: Array[Byte]): Map[String, String] = {
    val map = Map.newBuilder[String, String]
    val r = newReader(xml)
    var curId: String = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "style" => curId = r.getAttributeValue(WNS, "styleId")
            case "name" if curId != null =>
              val v = r.getAttributeValue(WNS, "val")
              if (v != null) { map += (curId -> v); curId = null }
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    map.result()
  }

  /** relationship id → target (e.g. media/image1.png). */
  private[ingest] def parseRels(xml: Array[Byte]): Map[String, String] = {
    val map = Map.newBuilder[String, String]
    val r = newReader(xml)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "Relationship" =>
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null) map += (id -> target)
        case _ =>
      }
    }
    r.close()
    map.result()
  }

  /** [[parseBytes]] for corpus-scale ingest: malformed packages
    * (truncated zips, invalid XML, bombing entries) must not fail the
    * task — at 100 TB one corrupt file cannot kill a 100M-file ingest.
    * SALVAGES rather than discards: zip entries inflated before the
    * corruption point are kept, and blocks parsed before a mid-stream
    * XML failure are returned (a truncated document.xml still yields
    * its leading paragraphs). Returns empty only when nothing at all
    * was recoverable. The distributed paths ([[read]], streaming
    * ingest) use this. */
  def parseBytesLenient(docId: String, bytes: Array[Byte]): Seq[Block] =
    try parseImpl(docId, zipEntries(bytes, MaxEntryBytes, salvage = true),
      salvage = true)
    catch { case e: Exception =>
      System.err.println(s"[docx] skipping unparseable $docId: ${e.getMessage}")
      Seq.empty
    }

  /** [[mediaBytes]]'s lenient twin: media parts recovered before the
    * corruption point are kept. */
  def mediaBytesLenient(docId: String, bytes: Array[Byte]): Seq[Media] =
    try mediaImpl(docId, zipEntries(bytes, MaxEntryBytes, salvage = true),
      salvage = true)
    catch { case e: Exception =>
      System.err.println(s"[docx] skipping unreadable media of $docId: ${e.getMessage}")
      Seq.empty
    }

  /** Parse one DOCX package into ordered body blocks (strict: malformed
    * packages throw — use [[parseBytesLenient]] on untrusted corpora). */
  def parseBytes(docId: String, bytes: Array[Byte]): Seq[Block] =
    parseImpl(docId, zipEntries(bytes), salvage = false)

  private def parseImpl(
      docId: String,
      entries: Map[String, Array[Byte]],
      salvage: Boolean): Seq[Block] = {
    val styles =
      try entries.get("word/styles.xml").map(parseStyles).getOrElse(Map.empty)
      catch { case e: Exception =>
        if (salvage) Map.empty[String, String] else throw e
      }
    val doc = entries.getOrElse("word/document.xml",
      return Seq.empty)

    val blocks = ArrayBuffer.empty[Block]
    val r = newReader(doc)
    var seq = 0L

    // paragraph state
    var inPara = false
    var paraDepth = 0 // nesting guard: paragraphs inside tables
    var style = ""
    var text: StringBuilder = null
    var rels: ArrayBuffer[String] = null

    // table state. gridSpan-merged cells are repeated to fill their
    // span, and vMerge continuation cells repeat the merge-origin
    // cell's content — python-docx iteration semantics (the reference
    // sees merged cells repeated, docx_etl.py:160-171).
    var tableDepth = 0
    var rows: ArrayBuffer[ArrayBuffer[String]] = null
    var cell: StringBuilder = null
    var cellSpan = 1
    var cellVMergeCont = false
    // grid column index → text of that column's current vMerge origin
    var vMergeOrigin: scala.collection.mutable.Map[Int, String] = null
    // structured-document-tag depth: python-docx's document.paragraphs/
    // .tables take only DIRECT body children (`./w:p`, `./w:tbl`), so
    // sdt-wrapped blocks (e.g. a TOC container) are invisible to the
    // reference (`docx_parser.py:66` iterates document.paragraphs) and
    // must be skipped here too.
    var sdtDepth = 0

    // In salvage mode a mid-stream XML failure (truncated entry, byte
    // corruption) ends the walk and returns the blocks accumulated so
    // far; strict mode propagates it.
    try {
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "sdt" =>
              sdtDepth += 1
            case "tbl" =>
              tableDepth += 1
              if (tableDepth == 1) {
                rows = if (sdtDepth == 0) ArrayBuffer.empty else null
                vMergeOrigin = scala.collection.mutable.Map.empty
              }
            case "tr" if tableDepth == 1 && rows != null =>
              rows += ArrayBuffer.empty[String]
            case "tc" if tableDepth == 1 && rows != null =>
              cell = new StringBuilder
              cellSpan = 1
              cellVMergeCont = false
            case "gridSpan" if tableDepth == 1 && cell != null =>
              val v = r.getAttributeValue(WNS, "val")
              // toIntOption + clamp: a corrupt or hostile span value
              // must neither throw nor replicate a cell 2^30 times
              if (v != null) v.toIntOption.foreach { s =>
                cellSpan = math.min(math.max(1, s), MaxGridSpan)
              }
            case "vMerge" if tableDepth == 1 && cell != null =>
              // <w:vMerge/> or val="continue" continues a vertical
              // merge; val="restart" opens one (origin cell).
              val v = r.getAttributeValue(WNS, "val")
              cellVMergeCont = v == null || v == "continue"
            case "p" =>
              if (tableDepth == 0 && sdtDepth == 0) {
                inPara = true; style = ""; text = new StringBuilder
                rels = ArrayBuffer.empty
              }
              paraDepth += 1
            case "pStyle" if inPara && tableDepth == 0 =>
              val v = r.getAttributeValue(WNS, "val")
              if (v != null) style = uiStyleName(styles.getOrElse(v, v))
            case "t" =>
              val t = r.getElementText
              if (tableDepth >= 1 && cell != null) cell.append(t)
              else if (inPara) text.append(t)
            case "blip" if inPara && tableDepth == 0 =>
              val embed = r.getAttributeValue(RNS, "embed")
              if (embed != null) rels += embed
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "sdt" =>
              sdtDepth -= 1
            case "p" =>
              paraDepth -= 1
              if (inPara && tableDepth == 0 && paraDepth == 0) {
                blocks += Block(docId, seq, "para", style, text.toString,
                  Seq.empty, rels.toSeq)
                seq += 1
                inPara = false
              }
            case "tc" if tableDepth == 1 && cell != null =>
              val colIdx = rows.last.size
              val content =
                if (cellVMergeCont) vMergeOrigin.getOrElse(colIdx, cell.toString)
                else cell.toString
              if (!cellVMergeCont)
                (0 until cellSpan).foreach(i => vMergeOrigin(colIdx + i) = content)
              (0 until cellSpan).foreach(_ => rows.last += content)
              cell = null
            case "tbl" =>
              if (tableDepth == 1 && rows != null) {
                blocks += Block(docId, seq, "table", "", "",
                  rows.map(_.toSeq).toSeq, Seq.empty)
                seq += 1
                rows = null
              }
              tableDepth -= 1
            case _ =>
          }
        case _ =>
      }
    }
    } catch { case e: Exception => if (!salvage) throw e }
    finally { try r.close() catch { case _: Exception => () } }
    blocks.toSeq
  }

  /** Extract binary media parts with their relationship ids (strict —
    * see [[mediaBytesLenient]]). */
  def mediaBytes(docId: String, bytes: Array[Byte]): Seq[Media] =
    mediaImpl(docId, zipEntries(bytes), salvage = false)

  private def mediaImpl(
      docId: String,
      entries: Map[String, Array[Byte]],
      salvage: Boolean): Seq[Media] = {
    val rels =
      try entries.get("word/_rels/document.xml.rels")
        .map(parseRels).getOrElse(Map.empty)
      catch { case e: Exception =>
        if (salvage) Map.empty[String, String] else throw e
      }
    rels.toSeq.collect {
      case (id, target) if entries.contains(s"word/$target") =>
        Media(docId, id, target, entries(s"word/$target"))
    }
  }

  /** Distributed scan: every `.docx` under `path` → ordered block rows
    * `(doc_id, seq, kind, style, text, table_cells, image_rel_ids)`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.docx")
      .load(path)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("doc_id"),
        col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseBytesLenient(name, bytes) }
      .toDF()
  }

  /** Distributed media scan: `(doc_id, rel_id, target, bytes)` rows —
    * the S8 assets source (BinaryType column). */
  def readMedia(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.docx")
      .load(path)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("doc_id"),
        col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => mediaBytesLenient(name, bytes) }
      .toDF()
  }
}
