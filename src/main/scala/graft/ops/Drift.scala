package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * monitoring reduction every continuously-fed training pipeline runs
  * before promoting a new crawl: has a numeric column's distribution
  * moved enough to re-calibrate quality floors / re-train?
  *
  * Metric: PSI (population stability index, the standard industry
  * measure; PSI = Σ (pA−pB)·ln(pA/pB) over histogram buckets —
  * conventional reading: <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).
  * Buckets are FIXED-WIDTH over a caller-supplied [lo, hi) range —
  * deterministic and engine-replayable, unlike quantile buckets whose
  * sketch-derived edges differ per run; out-of-range values clamp into
  * the edge buckets so mass is never dropped. Add-one smoothing keeps
  * empty buckets finite.
  *
  * Cost: one map-side-combined (bucket)-count aggregation per side —
  * the 100 TB shape is two scans producing 2·`buckets` rows, joined on
  * the bucket id. Counts are exact integers, so each engine's PSI is a
  * deterministic function of them; the oracle compares at 1e-6
  * (`round(psi, 6)`) because ln() may differ in the last ulp across
  * libm implementations.
  */
object Drift {

  /** Per-bucket histogram shares of `valueCol` over fixed-width
    * buckets; returns (bucket, share) with ALL `buckets` rows present
    * (empty ones carry the smoothing floor only at PSI time). */
  private def histogram(
      df: DataFrame, valueCol: String, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    val w = (hi - lo) / buckets
    val b = least(greatest(
      floor((col(valueCol).cast("double") - lo) / w).cast("int"), lit(0)),
      lit(buckets - 1))
    df.filter(col(valueCol).isNotNull)
      .select(b.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** PSI of `valueCol` between snapshots `dfA` (reference) and `dfB`
    * (candidate). Returns a 1-row DataFrame
    * `(psi DOUBLE, n_a BIGINT, n_b BIGINT)`. */
  def psi(
      dfA: DataFrame, dfB: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int = 10): DataFrame = {
    require(buckets > 0 && hi > lo, "need hi > lo and positive buckets")
    val ha = histogram(dfA, valueCol, lo, hi, buckets).withColumnRenamed("n", "na")
    val hb = histogram(dfB, valueCol, lo, hi, buckets).withColumnRenamed("n", "nb")
    // seed the FULL bucket axis so empty-on-both buckets still carry
    // their smoothing mass — PSI over B buckets, not observed ones
    val axis = dfA.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    val all = axis
      .join(ha, Seq("bucket"), "left")
      .join(hb, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    // add-one smoothing on counts (not shares): pa = (na+1)/(NA+buckets)
    val totals = all.agg(sum("na").as("ta"), sum("nb").as("tb"))
    all.crossJoin(broadcast(totals)) // 1-row totals — a constant, not a shuffle
      .select(
        (((col("na") + 1) / (col("ta") + buckets)).as("pa")),
        (((col("nb") + 1) / (col("tb") + buckets)).as("pb")),
        col("ta"), col("tb"))
      .agg(
        round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))), 6).as("psi"),
        first(col("ta")).as("n_a"),
        first(col("tb")).as("n_b"))
  }
}
