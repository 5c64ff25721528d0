package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ImportanceSampling, QualityClassifier}

/** Incremental maintenance of the NB quality-classifier model over a
  * [[MergeTable]] corpus — the IVM family applied to a MODEL: the
  * classifier's sufficient statistics are exact counts (per-feature
  * class occurrences + class document counts), counts are
  * distributive, so the model is maintainable through the same
  * [[BucketedView]] touched-bucket path as the count/sum/HLL/quantile
  * views. A standing production filter
  * ([[graft.pipeline.Curate]]'s classifier stage) keeps its model
  * fresh against a moving corpus for the cost of the changed buckets —
  * label flips (an update that moves a doc across the weak-label
  * predicate) and deletes need no special casing, because a changed
  * doc's bucket is rebuilt from its post-merge rows.
  *
  * Two views, both derived row-locally from corpus rows (the
  * [[BucketedView]] `derive` hook — identical code on full builds and
  * refreshed buckets, which is what makes refresh ≡ rebuild):
  *
  *  - feature cells: (bucket, fbucket, cnt_pos, cnt_neg) — hashed
  *    unigram+bigram occurrences by class ([[ImportanceSampling]]'s
  *    shared feature space);
  *  - prior cells: (bucket, is_pos, n_docs).
  *
  * [[model]] folds the finalized (≤ `buckets` + 2 row) state through
  * [[QualityClassifier.fromCounts]] — the SAME arithmetic as a
  * full-scan [[QualityClassifier.train]], so
  * `model(refreshed views) == train(corpus at v2)` is an exact
  * equality, not an approximation (`ClassifierRefreshSpec` pins it;
  * the `doc_classifier_incremental` oracle replays it in DuckDB).
  */
object ClassifierRefresh {

  private def featureDerive(
      posPred: Column, textCol: String, buckets: Int)(
      rows: DataFrame): DataFrame =
    // ride the corpus bucket through the explode as the "id": the
    // output is (id = corpus bucket, is_t, bucket = FEATURE bucket),
    // renamed positionally — cells need no per-doc identity, counts
    // are occurrence sums
    ImportanceSampling.occurrences(
        rows, coalesce(posPred, lit(false)), textCol, "bucket", buckets)
      .toDF("bucket", "is_t", "fbucket")

  private val featurePartials: Seq[Column] = Seq(
    sum(when(col("is_t"), 1L).otherwise(0L)).as("cnt_pos"),
    sum(when(col("is_t"), 0L).otherwise(1L)).as("cnt_neg"))

  private def priorDerive(posPred: Column)(rows: DataFrame): DataFrame =
    rows.withColumn("is_pos", coalesce(posPred, lit(false)))

  /** Feature-cell view at `version`:
    * (bucket, fbucket, cnt_pos, cnt_neg). */
  def featureView(
      spark: SparkSession, dir: String, posPred: Column,
      textCol: String = "text",
      buckets: Int = QualityClassifier.defaultBuckets,
      version: Int = -1): DataFrame =
    BucketedView.compute(spark, dir, "fbucket", featurePartials, version,
      featureDerive(posPred, textCol, buckets))

  /** Maintain a [[featureView]] across a merge: changed buckets'
    * cells recomputed, others carried by reference. */
  def refreshFeatureView(
      spark: SparkSession, dir: String, oldView: DataFrame, posPred: Column,
      fromVersion: Int, toVersion: Int,
      textCol: String = "text",
      buckets: Int = QualityClassifier.defaultBuckets): DataFrame =
    BucketedView.refresh(spark, dir, oldView, "fbucket", featurePartials,
      fromVersion, toVersion, featureDerive(posPred, textCol, buckets))

  /** Class-prior view at `version`: (bucket, is_pos, n_docs). */
  def priorView(
      spark: SparkSession, dir: String, posPred: Column,
      version: Int = -1): DataFrame =
    BucketedView.compute(spark, dir, "is_pos",
      Seq(count(lit(1)).as("n_docs")), version, priorDerive(posPred))

  def refreshPriorView(
      spark: SparkSession, dir: String, oldView: DataFrame, posPred: Column,
      fromVersion: Int, toVersion: Int): DataFrame =
    BucketedView.refresh(spark, dir, oldView, "is_pos",
      Seq(count(lit(1)).as("n_docs")), fromVersion, toVersion,
      priorDerive(posPred))

  /** Fold the two views into the model — finalize to the bounded
    * profile (≤ buckets + 2 rows) and run the SAME driver-side
    * arithmetic as a full [[QualityClassifier.train]]. */
  def model(
      features: DataFrame, priors: DataFrame,
      buckets: Int = QualityClassifier.defaultBuckets): QualityClassifier.NbModel = {
    // ONE collect job for both bounded finalizes (round-16 ask #6 —
    // this used to be two sequential jobs whose plans each re-derived
    // their view): tag-union the feature profile with the two prior
    // cells and split driver-side. Both sides are cell-state aggs
    // (≤ buckets + 2 rows), so the union costs nothing and the two
    // subplans execute concurrently inside the single job.
    val prof = BucketedView.finalizeView(features, "fbucket",
        Seq(sum("cnt_pos").as("cnt_pos"), sum("cnt_neg").as("cnt_neg")))
      .select(lit(true).as("is_feat"), col("fbucket").cast("long").as("k"),
        col("cnt_pos").cast("long").as("a"), col("cnt_neg").cast("long").as("b"))
    val pri = BucketedView.finalizeView(priors, "is_pos",
        Seq(sum("n_docs").as("n")))
      .select(lit(false).as("is_feat"),
        when(col("is_pos"), 1L).otherwise(0L).as("k"),
        col("n").cast("long").as("a"), lit(0L).as("b"))
    val all = prof.unionByName(pri).collect()
    val profile = all.toSeq.filter(_.getBoolean(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val priorN = all.filterNot(_.getBoolean(0))
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    QualityClassifier.fromCounts(profile,
      priorN.getOrElse(1L, 0L), priorN.getOrElse(0L, 0L), buckets)
  }
}
