package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamAsOf

/** Streaming as-of enrichment vs the native batch as-of join
  * ([[graft.plans.AsOfJoin]]) — the streaming runtime must not change
  * as-of semantics, only incrementalize them (the same twin discipline
  * as StreamJoinSpec / StatefulSessionsSpec). */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200000L // 2024-01-01T00:00Z
  private def ts(sec: Long) = new Timestamp(base + sec * 1000L)

  /** Probes every 25 s across 6 keys; updates every 90 s per key with
    * a value encoding (key, seq) so a wrong match is visible. Some
    * probes precede any update (None matches). A far-future update on
    * an unused key pushes the final watermark past every real probe,
    * so the no-data microbatch flushes ALL of them through the
    * event-time timeout path. */
  private def writeSides(): (String, String) = {
    val probes = (0 until 360).map { i =>
      ((i % 6).toLong, ts(i * 25L), 1000L + i)
    }
    val updates = (0 until 40).flatMap { j =>
      (0 until 6).map(k => (k.toLong, ts(j * 90L + k * 7L + 5L), j * 100.0 + k))
    } :+ ((999L, ts(100000L), -1.0))
    val pDir = Files.createTempDirectory("graft-asof-p").toString + "/p"
    val uDir = Files.createTempDirectory("graft-asof-u").toString + "/u"
    probes.toDF("key", "ts", "probe_id").repartition(4).write.parquet(pDir)
    updates.toDF("key", "ts", "value").repartition(4).write.parquet(uDir)
    (pDir, uDir)
  }

  test("streamed as-of enrichment equals the native batch as-of join") {
    val (pDir, uDir) = writeSides()
    val pSchema = spark.read.parquet(pDir).schema
    val uSchema = spark.read.parquet(uDir).schema

    val enriched = StreamAsOf.enrich(
      spark.readStream.schema(pSchema).parquet(pDir).as[StreamAsOf.Probe],
      spark.readStream.schema(uSchema).parquet(uDir).as[StreamAsOf.Update],
      watermark = "2 minutes")

    val q = enriched.writeStream
      .outputMode("append")
      .format("memory").queryName("asof_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("asof_stream")
      .select("key", "probe_id", "probe_us", "match_us", "value")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect().toSet

    // batch twin: the engine's native backward as-of, left-outer
    val batch = graft.plans.AsOfJoin.join(
        spark.read.parquet(pDir),
        spark.read.parquet(uDir).filter(col("key") =!= 999L)
          .withColumnRenamed("ts", "uts"),
        on = Seq("key"), leftTsCol = "ts", rightTsCol = "uts",
        joinType = "left_outer")
      .select(col("key"), col("probe_id"), unix_micros(col("ts")).as("probe_us"),
        unix_micros(col("uts")).as("match_us"), col("value"))
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect().toSet

    assert(batch.exists(_._4.isEmpty), "fixture must include pre-update probes")
    assert(batch.count(_._4.isDefined) > 300, "fixture must mostly match")
    assert(streamed == batch,
      s"stream=${streamed.size} rows, batch=${batch.size} rows; " +
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("out-of-order arrival within the watermark matches in-order results") {
    // same data, probes and updates interleaved across two files with
    // timestamps shuffled within the watermark horizon — the state
    // function must reorder internally
    val probes = (0 until 120).map(i => ((i % 3).toLong, ts(i * 20L), 2000L + i))
    val updates = (0 until 30).map(j => ((j % 3).toLong, ts(j * 77L), j * 1.5)) :+
      ((999L, ts(50000L), -1.0))
    val pDir = Files.createTempDirectory("graft-asof-p2").toString + "/p"
    val uDir = Files.createTempDirectory("graft-asof-u2").toString + "/u"
    // reversed order within files — event-time disorder at the source
    probes.reverse.toDF("key", "ts", "probe_id").coalesce(1).write.parquet(pDir)
    updates.reverse.toDF("key", "ts", "value").coalesce(1).write.parquet(uDir)

    val enriched = StreamAsOf.enrich(
      spark.readStream.schema(spark.read.parquet(pDir).schema).parquet(pDir)
        .as[StreamAsOf.Probe],
      spark.readStream.schema(spark.read.parquet(uDir).schema).parquet(uDir)
        .as[StreamAsOf.Update],
      watermark = "30 minutes")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asof_ooo")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("asof_ooo")
      .select("key", "probe_id", "match_us", "value")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    val batch = graft.plans.AsOfJoin.join(
        spark.read.parquet(pDir),
        spark.read.parquet(uDir).filter(col("key") =!= 999L)
          .withColumnRenamed("ts", "uts"),
        on = Seq("key"), leftTsCol = "ts", rightTsCol = "uts",
        joinType = "left_outer")
      .select(col("key"), col("probe_id"),
        unix_micros(col("uts")).as("match_us"), col("value"))
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(streamed == batch, s"ooo stream must equal batch: " +
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("restart off the checkpoint: pending probes and update state survive") {
    // wave 1 lands probes whose matches are not yet final (watermark
    // has not passed them); the query stops; wave 2 lands later
    // updates + the watermark push; the SECOND start must emit wave-1
    // probes with matches drawn from state recovered off the
    // checkpoint — pending-probe loss or update-buffer loss would both
    // show as wrong/missing rows.
    val pDir = Files.createTempDirectory("graft-asof-p3").toString + "/p"
    val uDir = Files.createTempDirectory("graft-asof-u3").toString + "/u"
    val ckpt = Files.createTempDirectory("graft-asof-ck").toString
    new java.io.File(pDir).mkdirs(); new java.io.File(uDir).mkdirs()

    val w1p = (0 until 40).map(i => ((i % 2).toLong, ts(i * 10L), 3000L + i))
    val w1u = (0 until 8).map(j => ((j % 2).toLong, ts(j * 45L + 3L), j * 2.0))
    w1p.toDF("key", "ts", "probe_id").coalesce(1).write.parquet(s"$pDir/w1")
    w1u.toDF("key", "ts", "value").coalesce(1).write.parquet(s"$uDir/w1")

    val pSchema = spark.read.parquet(s"$pDir/w1").schema
    val uSchema = spark.read.parquet(s"$uDir/w1").schema
    def start() = StreamAsOf.enrich(
        spark.readStream.schema(pSchema).parquet(s"$pDir/*").as[StreamAsOf.Probe],
        spark.readStream.schema(uSchema).parquet(s"$uDir/*").as[StreamAsOf.Update],
        watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$ckpt/out")
      .option("checkpointLocation", s"$ckpt/ck")
      .trigger(Trigger.AvailableNow()).start()

    start().awaitTermination(120000)
    val afterW1 = spark.read.parquet(s"$ckpt/out").count()

    // wave 2: later updates for both keys + the watermark sentinel
    val w2u = (8 until 12).map(j => ((j % 2).toLong, ts(j * 45L + 3L), j * 2.0)) :+
      ((999L, ts(90000L), -1.0))
    w2u.toDF("key", "ts", "value").coalesce(1).write.parquet(s"$uDir/w2")
    start().awaitTermination(120000)

    val streamed = spark.read.parquet(s"$ckpt/out")
      .select("key", "probe_id", "match_us", "value")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    val batch = graft.plans.AsOfJoin.join(
        spark.read.parquet(s"$pDir/w1"),
        spark.read.parquet(s"$uDir/*").filter(col("key") =!= 999L)
          .withColumnRenamed("ts", "uts"),
        on = Seq("key"), leftTsCol = "ts", rightTsCol = "uts",
        joinType = "left_outer")
      .select(col("key"), col("probe_id"),
        unix_micros(col("uts")).as("match_us"), col("value"))
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(afterW1 < batch.size,
      "wave 1 must leave pending probes or the restart proves nothing")
    assert(streamed == batch, s"post-restart stream must equal batch: " +
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }
}
