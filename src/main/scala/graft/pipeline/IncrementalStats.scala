package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of per-group corpus statistics over a
  * [[MergeTable]] — classic incremental view maintenance (Blakeley et
  * al. 1986; the mechanism behind Delta/materialized-view refresh)
  * specialized to the distributive aggregates a corpus dashboard needs:
  * row count and BIGINT sum (means and ratios derive from them).
  *
  * The maintenance core is the generic [[BucketedView]] partial/merge
  * decomposition — count and sum are its simplest algebraic instance
  * (partial = per-(bucket, group) count/sum cell, merge = sum of
  * cells), the same skeleton [[SketchedStats]] instantiates with HLL
  * cells. One pruning path to audit: refresh recomputes cells for
  * [[MergeTable.changedBucketIds]] buckets only and carries every
  * other cell forward by reference. Deletes need no special casing —
  * a deleted row's bucket is by definition changed, and its cell is
  * rebuilt from the post-merge rows. (The signed-delta alternative
  * over [[MergeTable.rowDeltas]] remains the right shape for consumers
  * that cannot keep bucket-level state, e.g. [[PostingsRefresh]]'s
  * pre-image keyed deletes.)
  *
  * At 100 TB the point is cost: re-computing `GROUP BY source` counts
  * after a merge touching 0.1% of documents costs a full corpus scan;
  * [[refreshView]] costs one scan of the CHANGED buckets plus a
  * shuffle of (changed buckets × groups) cells — table-size-
  * independent. View state is #buckets × #groups tiny cell rows;
  * [[finalizeStats]] aggregates that bounded state, not data.
  *
  * All arithmetic is exact BIGINT adds — associative and commutative,
  * so map-side combine, partitioning, and refresh order cannot change
  * the result, and a chain of refreshes is bit-identical to a fresh
  * [[compute]] (the invariant `IncrementalStatsSpec` pins, and the
  * registered query's DuckDB oracle checks cross-engine).
  */
object IncrementalStats {

  /** The partial (per-cell) side of the decomposition. */
  private def partials(valueCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n"),
    coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("total"))

  /** The merge (cells → group) side: count and sum both merge by sum. */
  private val finals: Seq[Column] =
    Seq(sum(col("n")).as("n"), sum(col("total")).as("total"))

  /** Full-scan baseline: per-`groupCol` row count and sum of
    * `valueCol` (BIGINT-cast; nulls count 0). Schema:
    * (groupCol, n BIGINT, total BIGINT). The equality target every
    * incremental path must match exactly. */
  def compute(table: DataFrame, groupCol: String, valueCol: String): DataFrame =
    table.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("total"))

  /** Build the maintainable view at `version`: one (bucket, group,
    * n, total) cell per group per bucket, via [[BucketedView.compute]]. */
  def view(
      spark: SparkSession, dir: String, groupCol: String,
      valueCol: String, version: Int = -1): DataFrame =
    BucketedView.compute(spark, dir, groupCol, partials(valueCol), version)

  /** Maintain a [[view]] from `fromVersion` to `toVersion` without
    * rescanning the table: changed buckets' cells are recomputed,
    * unchanged cells carry forward. `finalizeStats` of the result
    * equals `compute(MergeTable.read(toVersion))` exactly — groups
    * whose rows all disappear lose all their cells (every such bucket
    * changed) and drop out; new groups appear with their buckets. */
  def refreshView(
      spark: SparkSession, dir: String, oldView: DataFrame, groupCol: String,
      valueCol: String, fromVersion: Int, toVersion: Int): DataFrame =
    BucketedView.refresh(spark, dir, oldView, groupCol, partials(valueCol),
      fromVersion, toVersion)

  /** Merge a view's cells into the final per-group stats frame
    * (groupCol, n, total). */
  def finalizeStats(view: DataFrame, groupCol: String): DataFrame =
    BucketedView.finalizeView(view, groupCol, finals)
}
