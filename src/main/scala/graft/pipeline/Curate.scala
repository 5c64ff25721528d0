package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.ops.{Dedup, TextAnalysis}
import graft.streaming.StreamingIngest

/** End-to-end training-corpus curation — the composition the north star
  * is about: sanitize (boilerplate/PII), strip cross-document duplicate
  * passages, filter junk, repetition spam and out-of-distribution text,
  * collapse exact and near duplicates, keep the target languages, then
  * chunk/embed/index what survives.
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
      embedder: Embedder = HashingEmbedder(),
      /** Unicode-NFC the text before everything else
        * ([[graft.expr.NormalizeUnicode]]) so byte-distinct but
        * equal-rendering encodings collapse for every downstream
        * hash/dedup/score; fuses into the sanitize projection — no
        * extra pass */
      unicodeNfc: Boolean = false,
      /** strip boilerplate lines + mask PII before anything else —
        * also makes dedup robust to boilerplate-only differences */
      sanitize: Boolean = true,
      /** drop docs whose top trigram exceeds this share (repetition /
        * template spam); 1.0 disables the stage */
      maxTopTrigramFrac: Double = 1.0,
      /** drop docs whose character entropy ([[TextAnalysis
        * .charEntropy]], nats) falls below this floor — the
        * compression-ratio stand-in for repetitive/degenerate spam the
        * trigram share misses (e.g. long runs of few symbols).
        * 0.0 disables the stage (entropy is never negative) */
      minCharEntropy: Double = 0.0,
      /** also require the Gopher rule conjunction
        * ([[TextAnalysis.gopherRules]] `passes`, paper-default bounds)
        * — fused into the quality stage's scan, so enabling it adds a
        * predicate, not a pass; attrition lands in `afterQuality` */
      gopherGate: Boolean = false,
      /** corpus-level duplicated-passage removal
        * ([[Dedup.stripDuplicatePassages]], the C4 span rule) before
        * the per-row filters; rewrites `text` to the surviving
        * passages (whitespace/case-normalized) and drops documents
        * that were pure boilerplate */
      passageDedup: Boolean = false,
      passageSegTokens: Int = 10,
      passageMaxDocs: Int = 2,
      /** drop docs whose [[TextAnalysis.charTrigramLm]] mean log10
        * trigram probability falls below this floor (out-of-
        * distribution text); NegativeInfinity disables the stage */
      minTrigramLogProb: Double = Double.NegativeInfinity,
      /** final DSIR selection ([[graft.ops.ImportanceSampling]]): keep
        * `dsirK` survivors drawn ∝ importance weight against
        * `dsirTarget` (None → uniform weights, i.e. a deterministic
        * uniform without-replacement draw); 0 disables the stage */
      dsirK: Int = 0,
      dsirTarget: Option[org.apache.spark.sql.Column] = None,
      /** learned-filter stage ([[graft.ops.QualityClassifier]] — the
        * GPT-3/CCNet discriminative filter): train the NB classifier
        * on this weak-label predicate over the DEDUPLICATED corpus
        * (a near-dup cluster would otherwise stuff the class models)
        * and keep docs scoring above `classifierThresholdFp`
        * (fixed-point log10 odds; 0 = the NB decision boundary).
        * None disables the stage. */
      classifierLabel: Option[org.apache.spark.sql.Column] = None,
      classifierThresholdFp: Long = 0L,
      /** release gate ([[graft.ops.Privacy.kAnonymize]]): suppress
        * rows whose quasi-identifier combination over these columns
        * is shared by < `kAnonK` survivors. Runs LAST — a
        * combination that was k-anonymous in the raw corpus may have
        * been thinned below k by the selection stages, so the gate
        * must see the final set. Empty disables the stage. */
      kAnonQuasi: Seq[String] = Nil,
      kAnonK: Int = 3)

  /** Published-pipeline presets: each maps a documented curation recipe
    * onto this engine's stage flags, so "run C4 over this corpus" is
    * one line. Thresholds follow the papers where stated; quality/LM
    * floors that the papers tune per-corpus are left at permissive
    * defaults and should be calibrated with [[calibrateQuality]] /
    * a held-out [[graft.ops.TextAnalysis.charTrigramLm]] percentile.
    *
    *  - [[c4Config]] — Raffel et al. 2020 §2.2: boilerplate line
    *    removal (sanitize), three-sentence/duplicated-span rule
    *    (passage dedup over 10-token windows), English-only, exact +
    *    near dedup.
    *  - [[refinedWebConfig]] — Penedo et al. 2023: quality gates via
    *    Gopher rules + repetition screens, then strict MinHash
    *    deduplication (their §3.3 "aggressive" 0.8 Jaccard band).
    *  - [[ccnetConfig]] — Wenzek et al. 2020: language ID + per-language
    *    LM perplexity floor (char-trigram proxy here) + exact dedup.
    */
  def c4Config: Config = Config(
    minQuality = 0.0, languages = Seq("en"),
    sanitize = true, passageDedup = true,
    passageSegTokens = 10, passageMaxDocs = 2,
    jaccardThreshold = 0.5)

  def refinedWebConfig: Config = Config(
    minQuality = 0.0, languages = Seq("en"),
    sanitize = true, gopherGate = true,
    maxTopTrigramFrac = 0.18, // Rae et al. table A1 top-2-gram band
    jaccardThreshold = 0.8)

  def ccnetConfig(minLogProb: Double = -3.5): Config = Config(
    minQuality = 0.0, languages = Seq("en", "fr", "de", "es", "zh"),
    sanitize = true, minTrigramLogProb = minLogProb,
    jaccardThreshold = 1.0) // CCNet dedups exact (paragraph hash), not near

  case class Report(
      input: Long, afterPassage: Long, afterQuality: Long,
      afterRepetition: Long, afterEntropy: Long, afterLm: Long, afterLang: Long,
      afterExact: Long, afterNearDup: Long, afterClassifier: Long,
      afterDsir: Long, afterKAnon: Long, chunks: Long)

  /** Calibrate `Config.minQuality` to keep ~`targetKeepRate` of a
    * corpus: the quality threshold is the `(1 - rate)` quantile of the
    * corpus's quality-score distribution, computed with
    * `approx_percentile` (one pass, mergeable sketch — no sort, no
    * collect; at 100 TB an exact percentile would be a full global
    * sort for a number that only needs 3 digits). Calibrate on a
    * [[graft.ops.Sampling.hashSample]] of the corpus when even one
    * sketch pass is too much. */
  def calibrateQuality(
      docs: DataFrame,
      targetKeepRate: Double,
      sanitize: Boolean = true): Double = {
    require(targetKeepRate > 0.0 && targetKeepRate <= 1.0)
    // score the same text run() will score: with the default
    // sanitize=true, calibrating on raw text would shift the realized
    // keep rate (boilerplate/PII change quality scores)
    val scored =
      if (sanitize)
        docs.withColumn("text", graft.ops.TextSanitize.sanitize(col("text")))
      else docs
    val row = scored.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(expr(s"approx_percentile(q, ${1.0 - targetKeepRate}, 1000)"))
      .head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0) // empty corpus keeps all
  }

  /** Run the curation; returns the final index rows and the per-stage
    * attrition report. `docs` needs `(doc_id, text)`; a `lang` column is
    * used when present, else the heuristic language-ID decides.
    *
    * Single-scan-per-stage guarantee: every stage is persisted before
    * its attrition `.count()`, and the next stage reads the persisted
    * parent — so at 100 TB the six report counts cost one pass over
    * each stage's (shrinking) output, not six recomputations of the
    * full upstream lineage. A stage is unpersisted as soon as its child
    * is materialized; the returned index stays persisted (the caller
    * writes it out next and may unpersist after).
    */
  def run(docs: DataFrame, cfg: Config = Config()): (DataFrame, Report) = {
    import org.apache.spark.storage.StorageLevel
    val input = docs.count()

    val normalized =
      if (cfg.unicodeNfc)
        docs.withColumn("text", graft.expr.TextNormExpr.nfc(col("text")))
      else docs
    val cleaned =
      if (cfg.sanitize)
        normalized.withColumn("text", graft.ops.TextSanitize.sanitize(col("text")))
      else normalized

    // corpus-level passage dedup first: it rewrites text, so every
    // downstream score/filter/dedup sees the de-boilerplated corpus
    // (the C4 ordering). A doc whose every passage was boilerplate
    // leaves as an empty string and is dropped here.
    val passaged =
      if (!cfg.passageDedup) cleaned
      else cleaned.drop("text")
        .join(
          Dedup.stripDuplicatePassages(cleaned,
            segTokens = cfg.passageSegTokens, maxDocs = cfg.passageMaxDocs)
            .select(col("doc_id"), col("clean_text").as("text")),
          "doc_id")
        .filter(length(col("text")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPassage = if (cfg.passageDedup) passaged.count() else input

    val gated =
      if (cfg.gopherGate)
        passaged.filter(TextAnalysis.gopherRules(col("text")).getField("passes"))
      else passaged
    val quality = gated
      .withColumn("__q", TextAnalysis.qualityScore(col("text")))
      .filter(col("__q") >= cfg.minQuality)
      .drop("__q")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nQuality = quality.count()
    if (cfg.passageDedup) passaged.unpersist(blocking = false)

    // repetition screen after the cheap per-row filter (it explodes
    // trigrams); left_anti keeps short docs the profile yields no row
    // for. When the stage is disabled, `repetition` IS `quality` —
    // re-persisting and unpersisting the alias would evict the shared
    // cache and force the language stage to recompute the whole
    // upstream lineage (the single-scan guarantee would silently break)
    val repetitionActive = cfg.maxTopTrigramFrac < 1.0
    val repetition =
      if (!repetitionActive) quality
      else quality.join(
        TextAnalysis.repetitionProfile(quality)
          .filter(col("top_trigram_frac") > cfg.maxTopTrigramFrac)
          .select("doc_id"),
        Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nRepetition = if (repetitionActive) repetition.count() else nQuality
    if (repetitionActive) quality.unpersist(blocking = false)

    // entropy floor: like the repetition screen, a join against the
    // (doc, aggregate)-shaped failers; left_anti keeps empty-text docs
    // the entropy profile yields no row for (they die at quality/gopher
    // stages instead). Same placement rationale: cheap per-row stages
    // already shrank the corpus, and the (doc, char) aggregation reads
    // the persisted parent once.
    val entropyActive = cfg.minCharEntropy > 0.0
    val entropied =
      if (!entropyActive) repetition
      else repetition.join(
        TextAnalysis.charEntropy(repetition)
          .filter(col("char_entropy") < cfg.minCharEntropy)
          .select("doc_id"),
        Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nEntropy = if (entropyActive) entropied.count() else nRepetition
    // `repetition` may alias `quality` (stage disabled) — either way the
    // persisted parent is done once `entropied` is materialized
    if (entropyActive) repetition.unpersist(blocking = false)

    // trigram-LM floor before the language filter: the profile trains
    // per-language over everything still alive, and each doc is scored
    // under its own language — CCNet's ordering. left_anti on the
    // failers keeps docs too short to produce a trigram.
    val lmActive = cfg.minTrigramLogProb > Double.NegativeInfinity
    val lmed =
      if (!lmActive) entropied
      else {
        val lmInput =
          if (entropied.columns.contains("lang")) entropied
          else entropied.withColumn("lang",
            TextAnalysis.langId(col("text")).getField("lang"))
        entropied.join(
          TextAnalysis.charTrigramLm(lmInput)
            .filter(col("avg_logp") < cfg.minTrigramLogProb)
            .select("doc_id"),
          Seq("doc_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val nLm = if (lmActive) lmed.count() else nEntropy
    if (lmActive) entropied.unpersist(blocking = false)

    val langed = {
      if (docs.columns.contains("lang"))
        lmed.filter(col("lang").isin(cfg.languages: _*))
      else lmed.filter(
        TextAnalysis.langId(col("text")).getField("lang").isin(cfg.languages: _*))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val nLang = langed.count()
    lmed.unpersist(blocking = false)

    val exact = Dedup.dropExactDups(langed).persist(StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    langed.unpersist(blocking = false)

    val pairs = Dedup.minHashPairs(exact, threshold = cfg.jaccardThreshold)
      .select("id_a", "id_b")
    val deduped = Dedup.dropNearDups(exact, pairs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNear = deduped.count()
    exact.unpersist(blocking = false)

    // learned filter after dedup (the GPT-3 ordering: rules shrink,
    // dedup un-stuffs the class models, THEN the classifier
    // generalizes the weak label to the whole corpus). Train + score
    // read the persisted parent; the semi-join keeps survivor columns.
    val clfActive = cfg.classifierLabel.isDefined
    val classified =
      if (!clfActive) deduped
      else {
        val model = graft.ops.QualityClassifier.train(deduped, cfg.classifierLabel.get)
        graft.ops.QualityClassifier.filter(deduped, model, cfg.classifierThresholdFp)
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    val nClf = if (clfActive) classified.count() else nNear
    if (clfActive) deduped.unpersist(blocking = false)

    // DSIR selection last: weights should reflect the cleaned,
    // deduplicated corpus (a near-dup cluster would otherwise vote for
    // itself in the raw-corpus model). left_semi on the winners keeps
    // all survivor columns; the two DSIR aggregations read the
    // persisted parent, preserving the single-scan guarantee.
    val dsirActive = cfg.dsirK > 0
    val selected =
      if (!dsirActive) classified
      else classified.join(
        graft.ops.ImportanceSampling.sample(
          classified, cfg.dsirTarget.getOrElse(lit(true)), cfg.dsirK)
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nDsir = if (dsirActive) selected.count() else nClf
    if (dsirActive && clfActive) classified.unpersist(blocking = false)
    if (dsirActive && !clfActive) deduped.unpersist(blocking = false)

    // k-anonymity release gate LAST: the suppression decision must see
    // the final survivor set (selection can thin a combination below k)
    val kActive = cfg.kAnonQuasi.nonEmpty
    val released =
      if (!kActive) selected
      else graft.ops.Privacy.kAnonymize(selected, cfg.kAnonQuasi, cfg.kAnonK)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nKAnon = if (kActive) released.count() else nDsir
    if (kActive) selected.unpersist(blocking = false)

    val index = StreamingIngest.ingestBatch(
      released.select(col("doc_id").cast("string").as("doc_id"), col("text")),
      cfg.embedder, cfg.chunkSize, cfg.chunkOverlap)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nChunks = index.count()
    released.unpersist(blocking = false)

    (index, Report(input, nPassage, nQuality, nRepetition, nEntropy, nLm, nLang,
      nExact, nNear, nClf, nDsir, nKAnon, nChunks))
  }
}
