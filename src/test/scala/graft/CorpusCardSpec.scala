package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusCard

/** [[graft.pipeline.CorpusCard]] — hand-computed card values incl. a
  * whitespace-variant duplicate, a NULL language, integer fixed-point
  * means, and layout invariance. */
class CorpusCardSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("en"), "alpha beta gamma"),
    (2L, Some("en"), "alpha  beta gamma"), // whitespace variant → exact dup
    (3L, Some("fr"), "uno"),
    (4L, None: Option[String], "x y z")
  ).toDF("doc_id", "lang", "text")

  private def run(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    CorpusCard.card(df,
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("card values are exact: volume, length, dup rate, languages, quality") {
    val got = run(fixture)
    val chars = Seq(16L, 17L, 3L, 5L)
    assert(got(("volume", "n_docs")) == 4L)
    assert(got(("volume", "n_tokens")) == 3 + 3 + 1 + 3)
    assert(got(("volume", "n_chars")) == chars.sum)
    assert(got(("length", "min_chars")) == 3L)
    assert(got(("length", "max_chars")) == 17L)
    assert(got(("length", "mean_chars_fp6")) == 1000000L * chars.sum / 4)
    assert(got(("duplication", "distinct_docs")) == 3L)
    assert(got(("duplication", "n_exact_dup_docs")) == 1L)
    assert(got(("duplication", "dup_rate_fp6")) == 250000L)
    assert(got(("languages", "lang:en")) == 2L)
    assert(got(("languages", "lang:fr")) == 1L)
    assert(got(("languages", "lang:null")) == 1L)
    assert(got(("quality", "short_docs_lt50_tokens")) == 4L)
    assert(got.size == 13, got.toString)
  }

  test("layout invariance: repartition does not move a single value") {
    assert(run(fixture) == run(fixture.repartition(7)))
  }

  test("cell-maintained card equals the from-scratch card bit-for-bit across a CDC transition") {
    import graft.pipeline.{BucketedView, MergeTable}
    val dir = s"${java.nio.file.Files.createTempDirectory("graft-cardcells")}/t"
    val tk = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    def cardOf(df: org.apache.spark.sql.DataFrame) =
      CorpusCard.card(df, tk).as[(String, String, Long)].collect().toSeq
    def cellsCard(lang: org.apache.spark.sql.DataFrame,
        dup: org.apache.spark.sql.DataFrame) =
      CorpusCard.cardFromCells(lang, dup)
        .as[(String, String, Long)].collect().toSeq

    // seed corpus: cross-BUCKET duplicates (same text, far-apart keys)
    // so a per-bucket distinct sum would overcount — the ledger must not
    val docs = ((1L to 40L).map(i =>
        (i, if (i % 5 == 0) null else s"l${i % 3}",
          if (i % 4 == 0) "shared duplicate body" else s"unique body $i")))
      .toDF("doc_id", "lang", "text")
    MergeTable.create(spark, dir, docs, "doc_id", nBuckets = 8)
    val lang1 = BucketedView.compute(spark, dir, "l",
      CorpusCard.langPartials(tk), 1, CorpusCard.deriveLang())
    val dup1 = BucketedView.compute(spark, dir, "h",
      CorpusCard.dupPartials, 1, CorpusCard.deriveDup)
    assert(cellsCard(lang1, dup1) == cardOf(MergeTable.read(spark, dir, 1)))

    // transition: rewrite one text into the dup group, delete a dup
    // carrier, insert a brand-new language
    val upd = Seq(
      (3L, "l0", "shared duplicate body", false),
      (4L, "l1", "", true),
      (100L, "zz", "a freshly arrived document body", false))
      .toDF("doc_id", "lang", "text", "_del")
    MergeTable.merge(spark, dir, upd, "doc_id", deleteCol = Some("_del"))
    val lang2 = BucketedView.refresh(spark, dir, lang1, "l",
      CorpusCard.langPartials(tk), 1, 2, CorpusCard.deriveLang())
    val dup2 = BucketedView.refresh(spark, dir, dup1, "h",
      CorpusCard.dupPartials, 1, 2, CorpusCard.deriveDup)
    assert(cellsCard(lang2, dup2) == cardOf(MergeTable.read(spark, dir, 2)),
      "maintained card must equal the from-scratch card after the merge")
  }

  test("empty corpus: maintained and from-scratch cards agree — counts 0, min/max/means NULL") {
    import graft.pipeline.{BucketedView, MergeTable}
    val dir = s"${java.nio.file.Files.createTempDirectory("graft-cardempty")}/t"
    val tk = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    // real cell schemas via the real machinery, then emptied — the
    // shape an erased/filtered-out corpus hands cardFromCells
    MergeTable.create(spark, dir,
      Seq((1L, "en", "body")).toDF("doc_id", "lang", "text"), "doc_id", 2)
    val lang1 = BucketedView.compute(spark, dir, "l",
      CorpusCard.langPartials(tk), 1, CorpusCard.deriveLang())
    val dup1 = BucketedView.compute(spark, dir, "h",
      CorpusCard.dupPartials, 1, CorpusCard.deriveDup)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Option[Long])].collect().toSeq
    val fromScratch = rows(CorpusCard.card(fixture.filter(lit(false)), tk))
    val fromCells = rows(CorpusCard.cardFromCells(
      lang1.filter(lit(false)), dup1.filter(lit(false))))
    assert(fromScratch == fromCells,
      s"empty-card shapes diverge: $fromScratch vs $fromCells")
    val m = fromScratch.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("volume", "n_docs")) == Some(0L))
    assert(m(("volume", "n_tokens")) == Some(0L))
    assert(m(("quality", "short_docs_lt50_tokens")) == Some(0L))
    assert(m(("duplication", "distinct_docs")) == Some(0L))
    assert(m(("length", "min_chars")).isEmpty)
    assert(m(("length", "max_chars")).isEmpty)
    assert(m(("length", "mean_chars_fp6")).isEmpty)
    assert(m(("duplication", "dup_rate_fp6")).isEmpty)
  }
}
