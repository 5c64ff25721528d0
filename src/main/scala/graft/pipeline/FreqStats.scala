package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.CmsExpr

/** Incremental per-group FREQUENCY monitoring over a [[MergeTable]] —
  * the [[BucketedView]] instance for the count-min sketch
  * ([[graft.expr.CmsAgg]]), completing the maintained-sketch family
  * (count/sum cells, HLL distinct, min/max, quantile sketch, KMV
  * overlap — and now point-queryable key frequencies): one d×w CMS
  * per (bucket, group) cell, refreshed by re-sketching ONLY
  * [[MergeTable.changedBucketIds]] buckets; every other cell carries
  * forward BYTE-identically (a CMS is a sum of per-row increment
  * matrices — canonical under any partitioning and merge tree).
  * Finalize merges a group's cells with `cms_merge` (elementwise add)
  * and any key's frequency estimate is one `cms_query` scalar.
  *
  * The standing "how often does value X appear per source, right
  * now" monitor of a training pipeline: after every ingest batch the
  * answer costs the changed buckets' re-sketch plus one bounded
  * merge — never a key-grouped scan of the corpus.
  *
  * 100 TB cost: refresh ∝ touched buckets; view state is
  * #buckets × #groups sketches of (8 + 8·d·w) bytes each.
  */
object FreqStats {

  /** Row-local derive: project (bucket, group, key) — key cast LONG. */
  def keyDerive(groupCol: String, keyCol: String): DataFrame => DataFrame =
    df => df.select(col("bucket"), col(groupCol),
      col(keyCol).cast("long").as("h"))

  def partials(w: Int, d: Int): Seq[Column] =
    Seq(CmsExpr.cmsAgg(col("h"), w, d).as("sk"))

  /** Full build at `version`: (bucket, groupCol, sk BINARY). */
  def compute(
      spark: SparkSession, dir: String, groupCol: String, keyCol: String,
      version: Int = -1, w: Int = 256, d: Int = 4): DataFrame =
    BucketedView.compute(spark, dir, groupCol, partials(w, d), version,
      keyDerive(groupCol, keyCol))

  /** Maintain a [[compute]] view across a version transition —
    * changed buckets re-sketch, unchanged cells carry forward
    * byte-identically. */
  def refresh(
      spark: SparkSession, dir: String, oldView: DataFrame,
      groupCol: String, keyCol: String, fromVersion: Int, toVersion: Int,
      w: Int = 256, d: Int = 4): DataFrame =
    BucketedView.refresh(spark, dir, oldView, groupCol, partials(w, d),
      fromVersion, toVersion, keyDerive(groupCol, keyCol))

  /** Per-group merged sketch off the cell view: (groupCol, sk). */
  def merged(view: DataFrame, groupCol: String): DataFrame =
    BucketedView.finalizeView(view, groupCol,
      Seq(CmsExpr.cmsMerge(col("sk")).as("sk")))
}
