package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.ops.{Dedup, TextAnalysis}
import graft.streaming.StreamingIngest

/** End-to-end training-corpus curation — the composition the north star
  * is about: filter junk, collapse exact and near duplicates, keep the
  * target languages, then chunk/embed/index what survives.
  *
  * Every stage is the operator implemented elsewhere in this engine;
  * this module only sequences them, and reports per-stage row counts so
  * a 100 TB run can audit its own attrition. Stage order follows cost:
  * cheap per-row filters first (quality, language), then the
  * constant-width exact-dedup shuffle, then banded LSH + connected
  * components on the already-shrunk corpus.
  */
object Curate {

  case class Config(
      minQuality: Double = 0.5,
      languages: Seq[String] = Seq("en"),
      jaccardThreshold: Double = 0.5,
      chunkSize: Int = 700,
      chunkOverlap: Int = 200,
      embedder: Embedder = HashingEmbedder())

  case class Report(
      input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, afterNearDup: Long, chunks: Long)

  /** Run the curation; returns the final index rows and the per-stage
    * attrition report. `docs` needs `(doc_id, text)`; a `lang` column is
    * used when present, else the heuristic language-ID decides. */
  def run(docs: DataFrame, cfg: Config = Config()): (DataFrame, Report) = {
    val input = docs.count()

    val quality = docs
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
      .filter(col("__q") >= cfg.minQuality)
      .drop("__q")
    val nQuality = quality.count()

    val langed =
      if (docs.columns.contains("lang"))
        quality.filter(col("lang").isin(cfg.languages: _*))
      else quality.filter(
        TextAnalysis.langId(col("text")).getField("lang").isin(cfg.languages: _*))
    val nLang = langed.count()

    val exact = Dedup.dropExactDups(langed)
    val nExact = exact.count()

    val pairs = Dedup.minHashPairs(exact, threshold = cfg.jaccardThreshold)
      .select("id_a", "id_b")
    val deduped = Dedup.dropNearDups(exact, pairs)
    val nNear = deduped.count()

    val index = StreamingIngest.ingestBatch(
      deduped.select(col("doc_id").cast("string").as("doc_id"), col("text")),
      cfg.embedder, cfg.chunkSize, cfg.chunkOverlap)
    val nChunks = index.count()

    (index, Report(input, nQuality, nLang, nExact, nNear, nChunks))
  }
}
