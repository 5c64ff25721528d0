package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST2 — event-time windows executed by the *streaming* engine
  * (watermark + tumbling window + dropDuplicates), checked against the
  * identical batch computation. The oracle-checked q17/q18 cover the
  * window semantics at sf scale; this suite proves the streaming
  * runtime path. */
class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(): String = {
    // 7s cadence with a ~12min silence every 50 events, so session
    // windows actually split (per-user gap is 35s inside a burst)
    def ts(i: Int) = new Timestamp(1704067200000L + (i + (i / 50) * 100) * 7000L)
    val rows = (0 until 600).map { i =>
      (i.toLong, ts(i), (i % 5).toLong,
        if (i % 3 == 0) "click" else "view", i * 1.5)
    }
    // duplicate a slice to exercise dropDuplicates
    val dups = (0 until 50).map { i =>
      (i.toLong, ts(i), (i % 5).toLong,
        if (i % 3 == 0) "click" else "view", i * 1.5)
    }
    val dir = Files.createTempDirectory("graft-events").toString + "/e"
    (rows ++ dups).toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4).write.parquet(dir)
    dir
  }

  test("streaming tumbling window + watermark + dropDuplicates matches batch") {
    val dir = mkEvents()
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win"), col("event_type"), col("n"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_agg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_agg")
      .as[(Long, String, Long)].collect().toSet

    val batch = spark.read.parquet(dir)
      .dropDuplicates("event_id")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // duplicates were actually dropped: total events = 600 distinct ids
    assert(streamed.toSeq.map(_._3).sum == 600)
  }

  test("streaming session windows (stateful merge) match batch session_window") {
    val dir = mkEvents()
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .groupBy(session_window(col("ts"), "60 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"), col("n"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("sess_agg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_agg").as[(Long, Long, Long)].collect().toSet
    val batch = spark.read.parquet(dir)
      .dropDuplicates("event_id")
      .groupBy(session_window(col("ts"), "60 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    // the gap injections must actually split sessions per user
    assert(streamed.size > 5, s"expected multiple sessions per user: ${streamed.size}")
  }
}
