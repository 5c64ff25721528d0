package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-count maintenance over a [[MergeTable]] via
  * bucket-level sketch materialization.
  *
  * [[IncrementalStats]] maintains count/sum by ADDING signed deltas —
  * impossible for distinct counts (a delete can't "subtract" a value
  * that other rows may still carry). The standard warehouse answer is
  * materialized PARTIAL sketches: keep one HLL sketch per (bucket,
  * group) cell; on refresh, re-sketch ONLY the buckets the merge
  * touched ([[MergeTable.changedBucketIds]] pruning) and carry every
  * other cell forward by reference. The estimate is the union of a
  * group's bucket sketches — unions are associative/commutative and
  * deletes are handled exactly, because a deleted row's bucket is by
  * definition a touched bucket that gets re-sketched from its
  * post-merge rows.
  *
  * 100 TB shape: refresh cost tracks touched buckets (like the merge
  * that caused it); the sketch table is #buckets × #groups rows of
  * ≤ 2^lgK-byte binaries — broadcastable state, never row data. Spark's
  * built-in DataSketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`) do the sketching, so
  * partials merge map-side and the binary columns are stable across
  * partitionings. Estimates are EXACT while a cell's cardinality stays
  * in the sketch's coupon (LIST/SET) regime — the registered query
  * bounds its counted domain to 64 values precisely so its DuckDB
  * `COUNT(DISTINCT …)` oracle is valid at every scale factor; at
  * genuinely high cardinality the estimate carries the usual ~1.6%/√2^lgK
  * HLL error and no exact oracle is claimed.
  */
object SketchedStats {

  /** Full build: one sketch per (bucket, group) over `distinctCol` at
    * `version`. Schema: (bucket INT, groupCol, sketch BINARY). */
  def compute(
      spark: SparkSession, dir: String, groupCol: String, distinctCol: String,
      version: Int = -1, lgK: Int = 12): DataFrame = {
    val v = if (version > 0) version else MergeTable.latestVersion(spark, dir)
    val n = MergeTable.bucketCount(spark, dir, v)
    MergeTable.readBuckets(spark, dir, 0 until n, v)
      .groupBy(col("bucket"), col(groupCol))
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("sketch"))
  }

  /** Maintain `oldSketches` (a [[compute]] at `fromVersion`) to
    * `toVersion`: changed buckets are re-sketched from their post-merge
    * rows, unchanged cells carry forward untouched. Equals a fresh
    * [[compute]] at `toVersion` (spec-pinned). */
  def refresh(
      spark: SparkSession, dir: String, oldSketches: DataFrame,
      groupCol: String, distinctCol: String,
      fromVersion: Int, toVersion: Int, lgK: Int = 12): DataFrame = {
    val changed = MergeTable.changedBucketIds(spark, dir, fromVersion, toVersion)
    if (changed.isEmpty) oldSketches
    else {
      val fresh = MergeTable.readBuckets(spark, dir, changed, toVersion)
        .groupBy(col("bucket"), col(groupCol))
        .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("sketch"))
      oldSketches.filter(!col("bucket").isin(changed: _*)).unionByName(fresh)
    }
  }

  /** Per-group distinct estimate: union each group's bucket sketches.
    * Schema: (groupCol, n_distinct BIGINT). */
  def estimate(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_distinct"))
}
