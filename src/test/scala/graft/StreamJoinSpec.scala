package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamJoins

/** ST3 — stream-stream interval join run by the streaming engine,
  * checked against the identical batch join (the streaming runtime must
  * not change join semantics, only incrementalize them). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200000L // 2024-01-01T00:00Z
  private def ts(sec: Long) = new Timestamp(base + sec * 1000L)

  private def writeSides(): (String, String) = {
    // views every 30s per user; clicks trail views by 0-15 min, so some
    // attribute (≤10 min) and some fall outside the interval
    val views = (0 until 400).map { i =>
      (i.toLong, (i % 8).toLong, ts(i * 30L))
    }
    val clicks = (0 until 400 by 3).map { i =>
      (10000L + i, (i % 8).toLong, ts(i * 30L + (i % 30) * 30L))
    }
    val vDir = Files.createTempDirectory("graft-views").toString + "/v"
    val cDir = Files.createTempDirectory("graft-clicks").toString + "/c"
    views.toDF("view_id", "user_id", "vts").repartition(4).write.parquet(vDir)
    clicks.toDF("click_id", "user_id", "cts").repartition(4).write.parquet(cDir)
    (vDir, cDir)
  }

  test("streaming interval join emits exactly the batch join, append mode") {
    val (vDir, cDir) = writeSides()
    val vSchema = spark.read.parquet(vDir).schema
    val cSchema = spark.read.parquet(cDir).schema

    val joined = StreamJoins.intervalJoin(
      spark.readStream.schema(vSchema).parquet(vDir),
      spark.readStream.schema(cSchema).parquet(cDir),
      key = "user_id", leftTs = "vts", rightTs = "cts",
      within = "10 minutes")
      .select("view_id", "click_id")

    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("attrib")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("attrib")
      .as[(Long, Long)].collect().toSet

    val batch = spark.read.parquet(vDir).alias("l")
      .join(spark.read.parquet(cDir).alias("r"),
        expr("l.user_id = r.user_id AND r.cts >= l.vts " +
          "AND r.cts <= l.vts + interval 10 minutes"))
      .select("view_id", "click_id")
      .as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture must produce attributed pairs")
    // and the interval must exclude something, or the test is vacuous
    val unbounded = spark.read.parquet(vDir).join(
      spark.read.parquet(cDir), "user_id").count()
    assert(unbounded > batch.size, "interval bound must be selective")
    assert(streamed == batch,
      s"stream=${streamed.size} rows, batch=${batch.size} rows")
  }
}
