package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.DriftMonitor

/** [[DriftMonitor]] — the streaming histogram must equal the batch
  * histogram, the windowed PSI series must agree with an ad-hoc batch
  * [[graft.ops.Drift.psi]] of the same window pair (formula parity),
  * and a shifted window must trip the conventional threshold while a
  * stable one does not.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000L // 2024-01-01T00:00Z
  private val win = 5 * 60 * 1000L

  /** Three 5-minute windows: w0 and w1 draw values from the same
    * deterministic spread; w2 is shifted to the top of the range; a w3
    * sentinel pushes the watermark past w2 so every monitored window
    * closes under AvailableNow. */
  private def mkEvents(): String = {
    def rows(w: Int, shift: Double) = (0 until 200).map { i =>
      (w * 1000L + i, new Timestamp(t0 + w * win + (i % 290) * 1000L),
        shift + (i % 100) * 0.1)
    }
    val all = rows(0, 0.0) ++ rows(1, 0.0) ++ rows(2, 90.0) ++
      Seq((9999L, new Timestamp(t0 + 3 * win + 60000L), 5.0))
    val dir = Files.createTempDirectory("graft-driftmon").toString + "/e"
    all.toDF("event_id", "ts", "v").repartition(4).write.parquet(dir)
    dir
  }

  test("streaming histogram equals batch; PSI series matches Drift.psi and flags the shift") {
    val dir = mkEvents()
    val root = Files.createTempDirectory("graft-driftmon-out")
    val (out, ckpt) = (s"$root/hist", s"$root/ckpt")
    val schema = spark.read.parquet(dir).schema
    val (lo, hi, buckets) = (0.0, 100.0, 10)

    DriftMonitor.start(spark,
      spark.readStream.schema(schema).parquet(dir), "ts", "v",
      out, ckpt, lo, hi, buckets,
      windowDur = "5 minutes", watermarkDelay = "1 minute")
      .awaitTermination(120000)

    val hist = spark.read.parquet(out)
    // closed windows only: w0..w2 (the w3 sentinel is still open)
    val streamed = hist.select(unix_millis(col("wstart")), col("bucket"), col("n"))
      .as[(Long, Int, Long)].collect().toSet
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "5 minutes"),
        least(greatest(floor((col("v") - lo) / 10.0).cast("int"), lit(0)),
          lit(buckets - 1)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws"), col("bucket"), col("n"))
      .filter(col("ws") < t0 + 3 * win)
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed == batch, "closed-window streaming histogram must equal batch")

    val series = DriftMonitor.psiSeries(hist, buckets, "5 minutes")
      .select(unix_millis(col("wstart")), col("psi"))
      .as[(Long, Double)].collect().toMap
    assert(series.keySet == Set(t0 + win, t0 + 2 * win),
      s"one PSI row per window with a predecessor: ${series.keySet}")

    // formula parity with the ad-hoc batch comparison
    val raw = spark.read.parquet(dir)
    def windowRows(w: Int) = raw.filter(
      col("ts") >= new Timestamp(t0 + w * win) &&
        col("ts") < new Timestamp(t0 + (w + 1) * win))
    val adhoc01 = graft.ops.Drift.psi(windowRows(0), windowRows(1), "v", lo, hi, buckets)
      .head.getDouble(0)
    val adhoc12 = graft.ops.Drift.psi(windowRows(1), windowRows(2), "v", lo, hi, buckets)
      .head.getDouble(0)
    assert(math.abs(series(t0 + win) - adhoc01) < 1e-9,
      "windowed PSI must be the same number as the batch Drift.psi")
    assert(math.abs(series(t0 + 2 * win) - adhoc12) < 1e-9)

    // behavior: same-distribution pair stable, shifted pair flagged
    assert(series(t0 + win) < 0.1, s"stable pair drifted: ${series(t0 + win)}")
    assert(series(t0 + 2 * win) > 0.2, s"shift not flagged: ${series(t0 + 2 * win)}")
  }
}
