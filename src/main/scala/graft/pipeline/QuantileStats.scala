package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.QuantileSketchExpr._

/** Incremental QUANTILE maintenance over a [[MergeTable]] — the
  * [[BucketedView]] instance for order statistics, which signed-delta
  * IVM cannot maintain (a delete can't "subtract" a rank) and which
  * even min/max-style partials can't answer (a quantile needs the
  * whole distribution, not one extreme).
  *
  * One serialized [[graft.expr.QSketchState]] per (bucket, group)
  * cell; refresh re-sketches ONLY [[MergeTable.changedBucketIds]]
  * buckets and carries every other cell forward byte-identically (the
  * sketch's serialized form is canonical in the exact regime, so
  * carry-forward is literal). Finalize unions a group's cells with
  * `qsketch_merge` and reads quantiles off the merged sketch.
  *
  * Exactness contract (mirrors [[SketchedStats]]'s coupon-regime
  * rule): while each merged group sketch has seen ≤ k DISTINCT values,
  * quantiles are EXACT discrete quantiles — so a bounded-domain value
  * column makes a DuckDB rank-select oracle valid at ANY scale factor.
  * Past k distinct values the sketch degrades gracefully (observed-value
  * bins collapse; mass stays exact, ranks blur by the collapsed bin
  * weight — property-pinned in `QSketchSpec`).
  *
  * 100 TB cost model: refresh ∝ touched buckets; view state is
  * #buckets × #groups sketches of ≤ 8+16k bytes; finalize aggregates
  * that bounded state, never row data.
  */
object QuantileStats {

  /** The partial (per-cell) side: one quantile sketch per cell. */
  def partials(valueCol: String, k: Int = 256): Seq[Column] =
    Seq(qsketch(col(valueCol), k).as("qs"))

  /** Full build at `version`: (bucket, groupCol, qs BINARY). */
  def compute(
      spark: SparkSession, dir: String, groupCol: String, valueCol: String,
      version: Int = -1, k: Int = 256): DataFrame =
    BucketedView.compute(spark, dir, groupCol, partials(valueCol, k), version)

  /** Maintain a [[compute]] view from `fromVersion` to `toVersion`:
    * changed buckets re-sketch, unchanged cells carry forward. Equals
    * a fresh [[compute]] at `toVersion` (spec-pinned). */
  def refresh(
      spark: SparkSession, dir: String, oldView: DataFrame, groupCol: String,
      valueCol: String, fromVersion: Int, toVersion: Int, k: Int = 256): DataFrame =
    BucketedView.refresh(
      spark, dir, oldView, groupCol, partials(valueCol, k), fromVersion, toVersion)

  /** Per-group quantiles off the merged sketch. Output schema:
    * (groupCol, n BIGINT, p{q*100} DOUBLE …) — e.g. `quantiles(v,
    * "src", Seq(0.25, 0.5))` yields columns `n`, `p25`, `p50`. */
  def quantiles(view: DataFrame, groupCol: String, qs: Seq[Double]): DataFrame = {
    val merged = BucketedView.finalizeView(
      view, groupCol, Seq(qsketchMerge(col("qs")).as("m")))
    val outCols = col(groupCol) +: qsketchN(col("m")).as("n") +:
      qs.map(q => qsketchQuantile(col("m"), q).as(s"p${math.round(q * 100)}"))
    merged.select(outCols: _*)
  }
}
