package graft

import graft.ops.{PairAssets, UniqueNames}

/** O-PAIR / O-UNIQ edge cases from SURVEY §5.1 (reference behavior at
  * docx_etl.py:174-205 and :128-135). */
class PairAssetsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(blocks: Seq[(Long, String)]): Seq[(Long, Long, String)] = {
    val df = blocks.zipWithIndex
      .map { case ((doc, kind), i) => (doc, i.toLong + 1, kind, s"b$i") }
      .toDF("doc_id", "seq", "kind", "text")
    PairAssets(df).orderBy("doc_id", "cap_seq")
      .select("cap_seq", "asset_seq", "kind")
      .as[(Long, Long, String)].collect().toSeq
  }

  test("pending caption survives intervening paragraphs") {
    val got = pairs(Seq(
      (1L, "caption_figure"), (1L, "para"), (1L, "para"), (1L, "figure")))
    assert(got == Seq((1L, 4L, "figure")))
  }

  test("caption pairs only with its FIRST following asset") {
    val got = pairs(Seq((1L, "caption_figure"), (1L, "figure"), (1L, "figure")))
    assert(got == Seq((1L, 2L, "figure")))
  }

  test("asset before any caption is missed by design") {
    assert(pairs(Seq((1L, "figure"), (1L, "caption_figure"))) == Seq.empty)
  }

  test("a later caption re-arms over an unconsumed one") {
    val got = pairs(Seq(
      (1L, "caption_figure"), (1L, "caption_figure"), (1L, "figure")))
    assert(got == Seq((2L, 3L, "figure")))
  }

  test("figure and table captions arm independently") {
    val got = pairs(Seq(
      (1L, "caption_figure"), (1L, "caption_table"), (1L, "table"), (1L, "figure")))
    assert(got == Seq((1L, 4L, "figure"), (2L, 3L, "table")))
  }

  test("table caption does not consume a figure and vice versa") {
    assert(pairs(Seq((1L, "caption_table"), (1L, "figure"))) == Seq.empty)
  }

  test("unique names: collisions become base_1, base_2; exts independent") {
    val df = Seq(
      (1L, 1L, "img", ".png"), (1L, 2L, "img", ".png"), (1L, 3L, "img", ".png"),
      (1L, 4L, "img", ".gif"), (2L, 5L, "img", ".png"))
      .toDF("doc_id", "seq", "base", "ext")
    val got = UniqueNames(df).orderBy("seq")
      .select("filename").as[String].collect().toSeq
    assert(got == Seq("img.png", "img_1.png", "img_2.png", "img.gif", "img.png"))
  }
}
