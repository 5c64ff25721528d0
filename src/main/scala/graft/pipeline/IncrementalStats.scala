package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of per-group corpus statistics over a
  * [[MergeTable]] — classic incremental view maintenance (Blakeley et
  * al. 1986; the mechanism behind Delta/materialized-view refresh)
  * specialized to the distributive aggregates a corpus dashboard needs:
  * row count and BIGINT sum (means and ratios derive from them).
  *
  * At 100 TB the point is cost: re-computing `GROUP BY source` counts
  * after a merge touching 0.1% of documents costs a full corpus scan;
  * [[refresh]] costs one scan of the CHANGED buckets ([[MergeTable
  * .rowDeltas]]'s pruning) + a shuffle of at most one delta row per
  * (group) — table-size-independent. The stats table itself is tiny
  * (one row per group), so the merge-in join broadcasts.
  *
  * All arithmetic is exact BIGINT adds of `_sign`-weighted
  * contributions — associative and commutative, so map-side combine,
  * partitioning, and refresh order cannot change the result, and a
  * chain of refreshes is bit-identical to a fresh [[compute]] (the
  * invariant `IncrementalStatsSpec` pins, and the registered query's
  * DuckDB oracle checks cross-engine).
  */
object IncrementalStats {

  /** Full-scan baseline: per-`groupCol` row count and sum of
    * `valueCol` (BIGINT-cast; nulls count 0). Schema:
    * (groupCol, n BIGINT, total BIGINT). */
  def compute(table: DataFrame, groupCol: String, valueCol: String): DataFrame =
    table.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("total"))

  /** Maintain `oldStats` (a [[compute]] result at `fromVersion`) to
    * `toVersion` without rescanning the table: aggregate the signed
    * row-delta feed per group and merge with a full-outer join.
    * Groups whose count reaches zero drop out; groups first seen in
    * the delta appear. The result equals
    * `compute(MergeTable.read(toVersion))` exactly. */
  def refresh(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      oldStats: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, fromVersion: Int, toVersion: Int): DataFrame = {
    val deltas = MergeTable.rowDeltas(spark, dir, fromVersion, toVersion, keyCol)
    val d = deltas.groupBy(col(groupCol))
      .agg(sum(col("_sign").cast("long")).as("_dn"),
        coalesce(sum(col("_sign") * col(valueCol).cast("long")), lit(0L)).as("_dt"))
    // null-safe (<=>) so a null group key merges instead of producing
    // two disjoint null-group rows (a USING join matches nulls with =)
    val o = oldStats.alias("o")
    val dd = d.alias("d")
    o.join(dd, o(groupCol) <=> dd(groupCol), "full_outer")
      .select(coalesce(o(groupCol), dd(groupCol)).as(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("_dt"), lit(0L))).as("total"))
      .filter(col("n") > 0)
  }
}
