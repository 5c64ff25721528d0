package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastText-shaped document quality classifier: multinomial Naive
  * Bayes over hashed unigram+bigram bags — the discriminative filter
  * every published web pipeline runs after the rule stage (CCNet's
  * fastText quality/lang models, Wenzek et al. 2020; the GPT-3
  * Wikipedia-vs-CommonCrawl quality classifier, Brown et al. 2020
  * App. A; LLaMA's "classify as reference-like" filter). Weak labels
  * come from any Column predicate — a curated source list, a heuristic
  * gate, an LM-perplexity floor — and the learned model generalizes
  * the label to every document by vocabulary.
  *
  * Distinct from [[ImportanceSampling]] (DSIR): DSIR weighs documents
  * by target-vs-RAW-corpus likelihood for *resampling*; this trains
  * class-conditional models positive-vs-NEGATIVE plus a document
  * prior and *classifies* by log-odds sign — the filter, not the
  * sampler. The two share the hashed-n-gram feature space (and its
  * audited fixed-point arithmetic) by design.
  *
  * Model math (add-one smoothing over `buckets` = B, all weights
  * fixed-pointed at 10^-6 in log10 units BEFORE any per-document sum,
  * so scores are exact BIGINTs — partition- and engine-invariant):
  *
  *   log_odds(d) = prior + Σ_b c_b·w(b) + n_feat·kk
  *   w(b)  = round(fp·(log10(cnt_pos(b)+1) − log10(cnt_neg(b)+1)))
  *   kk    = round(fp·(log10(tot_neg+B) − log10(tot_pos+B)))
  *   prior = round(fp·(log10(n_pos_docs) − log10(n_neg_docs)))
  *
  * 100 TB shape: training aggregates occurrences STRAIGHT to bucket
  * grain (≤ B map-side-combined keys on the shuffle) and folds the
  * ≤ B-row profile on the driver — the same bounded-sidecar class as
  * the DSIR profile and the IVF centers. Scoring is one broadcast
  * left-join of the ≤ B-row weight table against the per-doc feature
  * aggregation: no wide shuffle, no driver state beyond the model.
  */
object QualityClassifier {

  val defaultBuckets: Int = ImportanceSampling.defaultBuckets
  private val fp = 1e6

  /** Driver-side trained model: the bounded per-bucket weight table
    * plus the two folded constants. Serializable — broadcastable and
    * persistable as a tiny table. */
  case class NbModel(
      buckets: Int,
      priorFp: Long,
      kkFp: Long,
      bucketWeights: Map[Long, Long]) {
    require(bucketWeights.size <= buckets, "weight table exceeds the bucket space")
  }

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Train the class-conditional bucket models and the prior. One
    * occurrence pass aggregated to bucket grain + one tiny label
    * count; both sides of every log are exact longs before the single
    * driver-side rounding. */
  def train(
      df: DataFrame,
      posPred: Column,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = defaultBuckets): NbModel = {
    // a null predicate row (e.g. a null label column) is a negative —
    // never a silent third class
    val posPredSafe = coalesce(posPred, lit(false))
    val prof = ImportanceSampling.occurrences(df, posPredSafe, textCol, idCol, buckets)
      .groupBy("bucket").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("cnt_pos"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("cnt_neg"))
      .collect()
    val counts = df.select(posPredSafe.as("p")).groupBy("p").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val (nPos, nNeg) = (counts.getOrElse(true, 0L), counts.getOrElse(false, 0L))
    require(nPos > 0 && nNeg > 0,
      s"both classes need training documents (pos=$nPos, neg=$nNeg)")
    fromCounts(prof.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
      nPos, nNeg, buckets)
  }

  /** Fold a bucket count profile + class doc counts into the model —
    * THE single arithmetic path: [[train]]'s full-scan profile and
    * [[graft.pipeline.ClassifierRefresh]]'s incrementally maintained
    * cells both end here, so the incremental model is definitionally
    * the same math over the same exact counts. */
  def fromCounts(
      profile: Seq[(Long, Long, Long)], // (bucket, cnt_pos, cnt_neg)
      nPos: Long, nNeg: Long, buckets: Int): NbModel = {
    require(nPos > 0 && nNeg > 0,
      s"both classes need training documents (pos=$nPos, neg=$nNeg)")
    val (totPos, totNeg) = profile.foldLeft((0L, 0L)) { case ((p, n), c) =>
      (p + c._2, n + c._3) }
    val w = profile.collect { case (b, cp, cn) if cp != 0L || cn != 0L =>
      b -> halfUp((math.log10(cp + 1.0) - math.log10(cn + 1.0)) * fp)
    }.toMap
    NbModel(
      buckets,
      priorFp = halfUp((math.log10(nPos.toDouble) - math.log10(nNeg.toDouble)) * fp),
      kkFp = halfUp(
        (math.log10(totNeg.toDouble + buckets) - math.log10(totPos.toDouble + buckets)) * fp),
      bucketWeights = w)
  }

  /** Score every document: `(idCol, n_feat, log_odds, pred)`.
    * Buckets unseen in training contribute weight 0 but still count
    * toward the `n_feat·kk` length term (left join + coalesce), so a
    * model scores corpora with novel vocabulary instead of silently
    * dropping their features. Documents with no extractable n-grams
    * score the prior alone. */
  def score(
      df: DataFrame,
      model: NbModel,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wTab = model.bucketWeights.toSeq.toDF("bucket", "wgt")
    val perDoc = ImportanceSampling
      .features(df, lit(true), textCol, idCol, model.buckets)
      .join(broadcast(wTab), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("c")).cast("long").as("n_feat"),
        sum(col("c") * coalesce(col("wgt"), lit(0L))).as("__sumw"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("id", "__sid"),
        col(idCol) === col("__sid"), "left")
      .select(col(idCol),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        (lit(model.priorFp) +
          coalesce(col("__sumw") + col("n_feat") * lit(model.kkFp), lit(0L)))
          .as("log_odds"))
      .withColumn("pred", col("log_odds") > 0L)
  }

  /** Train-and-score in one call (label and corpus from the same
    * frame — the registered `doc_quality_classifier` query's shape). */
  def trainScore(
      df: DataFrame,
      posPred: Column,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = defaultBuckets): DataFrame =
    score(df, train(df, posPred, textCol, idCol, buckets), textCol, idCol)

  /** Keep documents the model scores above `thresholdFp` (fixed-point
    * log10 odds; 0 = the NB decision boundary). */
  def filter(
      df: DataFrame,
      model: NbModel,
      thresholdFp: Long = 0L,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val kept = score(df, model, textCol, idCol)
      .filter(col("log_odds") > thresholdFp)
      .select(col(idCol).as("__keep"))
    df.join(kept, col(idCol) === col("__keep"), "left_semi")
  }
}
