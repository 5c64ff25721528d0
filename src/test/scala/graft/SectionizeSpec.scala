package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Sectionize

/** O-SEC: distributed fill-down result ≡ a single-pass fold mirroring the
  * reference's iter_sections (docx_parser.py:54-86). */
class SectionizeSpec extends SparkSpec {
  import spark.implicits._

  /** Single-pass oracle of the reference semantics: heading opens a
    * section; non-empty paragraphs accumulate; pre-heading text dropped;
    * empty sections dropped. */
  private def foldOracle(blocks: Seq[(String, String)]): Seq[(String, String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var title: Option[String] = None
    var paras = List.empty[String]
    def flush(): Unit = title.foreach { t =>
      if (paras.nonEmpty) out += ((t, paras.reverse.mkString(" "), paras.size.toLong))
    }
    blocks.foreach { case (style, text) =>
      if (style.startsWith("Heading")) { flush(); title = Some(text); paras = Nil }
      else if (text.trim.nonEmpty && title.isDefined) paras ::= text
    }
    flush()
    out.toSeq
  }

  private def run(blocks: Seq[(String, String)]): Seq[(String, String, Long)] = {
    val df = blocks.zipWithIndex
      .map { case ((style, text), i) => (1L, i.toLong, style, text) }
      .toDF("doc_id", "seq", "style", "text")
    Sectionize(df).orderBy("sec_id")
      .select("title", "text", "n_paragraphs")
      .as[(String, String, Long)].collect().toSeq
  }

  test("reference fixture: pre-heading dropped, empty section dropped, dup titles distinct") {
    val blocks = Seq(
      ("Normal", "orphan text before any heading"),
      ("Heading 1", "Intro"),
      ("Normal", "a"),
      ("Normal", ""),
      ("Normal", "b"),
      ("Heading 1", "Empty Section"),
      ("Heading 1", "Intro"), // duplicate title, stays distinct
      ("Normal", "c"))
    val got = run(blocks)
    assert(got == Seq(("Intro", "a b", 2L), ("Intro", "c", 1L)))
    assert(got == foldOracle(blocks))
  }

  test("property: distributed sectionizer ≡ single-pass fold") {
    val styleGen = Gen.frequency(3 -> Gen.const("Normal"), 1 -> Gen.const("Heading 1"))
    val textGen = Gen.frequency(
      5 -> Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString),
      1 -> Gen.const(""), 1 -> Gen.const("  "))
    val blocksGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(styleGen, textGen)))
    (0 until 30).foreach { i =>
      blocksGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { blocks =>
        assert(run(blocks) == foldOracle(blocks), s"mismatch on $blocks")
      }
    }
  }

  test("multiple documents sectionize independently") {
    val df = Seq(
      (1L, 1L, "Heading 1", "T1"), (1L, 2L, "Normal", "x"),
      (2L, 1L, "Normal", "dropped"), (2L, 2L, "Heading 1", "T2"), (2L, 3L, "Normal", "y"))
      .toDF("doc_id", "seq", "style", "text")
    val got = Sectionize(df).select("doc_id", "title", "text")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "T1", "x"), (2L, "T2", "y")))
  }
}
