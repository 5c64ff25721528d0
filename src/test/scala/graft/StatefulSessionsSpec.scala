package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, Session}

/** flatMapGroupsWithState sessionization: the custom-state streaming
  * operator against its window-function batch twin. */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(): String = {
    // 7s cadence, ~12min silence every 50 events → sessions split
    def ts(i: Int) = new Timestamp(1704067200000L + (i + (i / 50) * 100) * 7000L)
    val rows = (0 until 600).map { i =>
      (ts(i), (i % 5).toLong, if (i % 3 == 0) "click" else "view", i * 1.5)
    }
    val dir = Files.createTempDirectory("graft-sess").toString + "/e"
    rows.toDF("ts", "user_id", "event_type", "value")
      .repartition(4).write.parquet(dir)
    dir
  }

  private def canon(s: Session): (Long, Long, Long, Long, Double, String, String) =
    (s.user_id, s.start_us, s.end_us, s.n,
      math.rint(s.value_sum * 10000) / 10000, s.first_type, s.last_type)

  test("batch flatMapGroupsWithState equals the window twin (minus open sessions)") {
    val dir = mkEvents()
    val events = spark.read.parquet(dir)
      .withWatermark("ts", "0 seconds").as[Event]

    val custom = StatefulSessions.sessionize(events, gapSeconds = 60)
      .collect().map(canon).toSet
    val twin = StatefulSessions.sessionizeBatch(
      spark.read.parquet(dir), gapSeconds = 60)
      .as[Session].collect().map(canon).toSet

    // batch mode never fires timeouts → exactly the per-user final
    // (still-open) session is missing, everything else matches
    assert(custom.subsetOf(twin))
    val missing = twin -- custom
    assert(missing.size == 5, s"one open session per user, got ${missing.size}")
    // the missing ones are precisely each user's last session
    val lastPerUser = twin.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    assert(missing == lastPerUser)
    assert(twin.size > 10)
  }

  test("streaming sessionize emits closed sessions matching the batch twin") {
    val dir = mkEvents()
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "30 seconds").as[Event]
    val q = StatefulSessions.sessionize(stream, gapSeconds = 60)
      .writeStream
      .outputMode("append")
      .format("memory").queryName("sess_custom")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_custom").as[Session]
      .collect().map(canon).toSet
    val twin = StatefulSessions.sessionizeBatch(
      spark.read.parquet(dir), gapSeconds = 60)
      .as[Session].collect().map(canon).toSet

    // every emitted session is bit-identical to the batch twin's; only
    // sessions still open at the final watermark may be withheld
    assert(streamed.subsetOf(twin))
    assert(streamed.nonEmpty)
    assert((twin -- streamed).size <= 5, // ≤ one open session per user
      s"withheld ${(twin -- streamed).size} of ${twin.size}")
  }
}
