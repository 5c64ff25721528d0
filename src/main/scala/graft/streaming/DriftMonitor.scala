package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous distribution-drift monitoring over a value column of an
  * event stream — [[graft.ops.Drift]]'s PSI composed with event-time
  * windows, the standing form of the "has the new crawl moved?" check
  * a continuously-fed training pipeline runs before promoting data.
  *
  * Spark-first shape: the STREAM only ever computes the bounded
  * histogram — `groupBy(window(ts), bucket) → count` behind a
  * watermark, appended per closed window to a parquet metrics sink
  * (windows × `buckets` rows — metrics, not data). PSI between
  * consecutive windows is then a batch query over that tiny sink
  * ([[psiSeries]]), using the exact smoothing formula of
  * [[graft.ops.Drift.psi]] so a windowed monitor and an ad-hoc batch
  * comparison can never disagree (spec-pinned).
  *
  * 100 TB shape: streaming state is `windows-in-watermark × buckets`
  * counts; the sink grows by `buckets` rows per window regardless of
  * event volume; `psiSeries` runs over metrics rows only.
  */
object DriftMonitor {

  /** Fixed-width bucket id of `valueCol` over [lo, hi) with edge
    * clamping — identical bucketing to [[graft.ops.Drift]]. */
  private def bucketOf(valueCol: String, lo: Double, hi: Double, buckets: Int) = {
    val w = (hi - lo) / buckets
    least(greatest(
      floor((col(valueCol).cast("double") - lo) / w).cast("int"), lit(0)),
      lit(buckets - 1))
  }

  /** The streaming histogram: (wstart, bucket, n) per CLOSED tumbling
    * window of `windowDur`, finalized by the `watermarkDelay` horizon. */
  def bucketCounts(
      stream: DataFrame, tsCol: String, valueCol: String,
      lo: Double, hi: Double, buckets: Int,
      windowDur: String, watermarkDelay: String): DataFrame =
    stream
      .filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur),
        bucketOf(valueCol, lo, hi, buckets).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("bucket"), col("n"))

  /** Start the monitor: append finalized histogram rows to the parquet
    * sink at `outDir`. Append mode + watermark means a window's rows
    * are emitted exactly once, when it can no longer change. */
  def start(
      spark: SparkSession, stream: DataFrame, tsCol: String, valueCol: String,
      outDir: String, checkpointDir: String,
      lo: Double, hi: Double, buckets: Int = 10,
      windowDur: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): StreamingQuery =
    bucketCounts(stream, tsCol, valueCol, lo, hi, buckets, windowDur, watermarkDelay)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** PSI of each window against its predecessor, over the histogram
    * sink: (wstart, psi, n_prev, n_cur) rows for every window whose
    * immediate predecessor (wstart − windowDur) exists. Same add-one
    * smoothing over the full bucket axis as [[graft.ops.Drift.psi]];
    * conventional reading applies (> 0.2 ⇒ shifted — gate the
    * promotion, retrain the calibration). */
  def psiSeries(hist: DataFrame, buckets: Int, windowDur: String): DataFrame = {
    val prev = hist.select(
      (col("wstart") + expr(s"INTERVAL $windowDur")).as("wstart"),
      col("bucket"), col("n").as("n_prev"))
    val cur = hist.select(col("wstart"), col("bucket"), col("n").as("n_cur"))
    // windows with a predecessor × the FULL bucket axis (empty buckets
    // still carry smoothing mass, exactly like Drift.psi's axis seed);
    // the bucket axis comes from exploding a literal array rather than
    // a crossJoin against range(buckets) — the remaining joins (wstart
    // pairing + the two histogram lookups) are equi-joins over
    // windows×buckets metrics rows
    val axis = cur.select(col("wstart")).distinct()
      .join(prev.select(col("wstart")).distinct(), Seq("wstart"))
      .select(col("wstart"),
        explode(lit((0 until buckets).toArray)).as("bucket"))
    val joined = axis
      .join(cur, Seq("wstart", "bucket"), "left")
      .join(prev, Seq("wstart", "bucket"), "left")
      .select(col("wstart"), col("bucket"),
        coalesce(col("n_prev"), lit(0L)).as("na"),
        coalesce(col("n_cur"), lit(0L)).as("nb"))
    val totals = joined.groupBy("wstart")
      .agg(sum("na").as("ta"), sum("nb").as("tb"))
    joined.join(totals, Seq("wstart"))
      .select(col("wstart"),
        (((col("na") + 1) / (col("ta") + buckets))).as("pa"),
        (((col("nb") + 1) / (col("tb") + buckets))).as("pb"),
        col("ta"), col("tb"))
      .groupBy("wstart")
      .agg(
        round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))), 6).as("psi"),
        first(col("ta")).as("n_prev"),
        first(col("tb")).as("n_cur"))
      .orderBy("wstart")
  }
}
