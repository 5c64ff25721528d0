package graft

import graft.pipeline.Curate

/** The full curation composition: sanitize → quality → repetition →
  * language → exact dedup → near-dup dedup → chunk/embed/index, with
  * per-stage attrition. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("curation drops junk, dups, near-dups and wrong languages; indexes the rest") {
    val good = "the quick brown fox jumps over the lazy dog and it is a fine day for running in the field"
    val docs = Seq(
      (1L, good, "en"),
      (2L, good, "en"),                      // exact dup of 1
      (3L, good + " indeed it is", "en"),    // near dup of 1
      (4L, "spam spam spam spam spam spam spam spam", "en"), // low quality
      (5L, "el gato y la casa de los perros en un día por la mañana y el sol", "es"), // wrong lang
      (6L, "a completely different quality document about the engines of analytics and the data they process every day"
        + "\nCopyright 2024 MegaCorp. All rights reserved.", "en"), // boilerplate line sanitized away
      (7L, "the cat sat on the mat " * 15, "en")) // passes quality, repetition spam
      .toDF("doc_id", "text", "lang")

    val (index, report) = Curate.run(docs,
      Curate.Config(minQuality = 0.5, languages = Seq("en"),
        jaccardThreshold = 0.4, chunkSize = 60, chunkOverlap = 15,
        embedder = graft.embed.HashingEmbedder(64),
        maxTopTrigramFrac = 0.12))

    assert(report.input == 7)
    assert(report.afterQuality == 6, s"$report")   // spam dropped
    assert(report.afterRepetition == 5, s"$report") // template spam dropped
    assert(report.afterLang == 4, s"$report")      // spanish dropped
    assert(report.afterExact == 3, s"$report")     // exact dup dropped
    assert(report.afterNearDup == 2, s"$report")   // near dup folded
    assert(report.chunks >= 2)

    val kept = index.select("doc_id").distinct().as[String].collect().toSet
    assert(kept == Set("1", "6"))
    // the sanitize stage removed doc 6's boilerplate before indexing
    val chunkTexts = index.select("chunk_text").as[String].collect()
    assert(chunkTexts.forall(!_.toLowerCase.contains("copyright")))
    // index rows are the standard ingest shape, unit-normalized
    assert(index.columns.toSeq ==
      Seq("id", "doc_id", "chunk_idx", "chunk_text", "embedding"))
  }

  test("calibrateQuality picks a threshold that keeps ~the target rate") {
    val docs = Tables.documents(spark, sf0001)
    val theta = Curate.calibrateQuality(docs, targetKeepRate = 0.8)
    val total = docs.count().toDouble
    val kept = docs.filter(
      graft.ops.TextAnalysis.qualityScore(org.apache.spark.sql.functions.col("text")) >= theta
    ).count().toDouble
    val rate = kept / total
    assert(rate >= 0.6 && rate <= 1.0, s"theta=$theta keeps $rate")
    // tighter target keeps fewer (or equal, for coarse distributions)
    val thetaStrict = Curate.calibrateQuality(docs, targetKeepRate = 0.2)
    assert(thetaStrict >= theta)
  }
}
