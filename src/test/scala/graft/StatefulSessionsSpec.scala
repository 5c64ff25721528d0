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

  test("cross-batch late events extend the open session backward (batch-twin parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new Timestamp(sec * 1000)
    val mem = MemoryStream[Event]
    val q = StatefulSessions.sessionize(
        mem.toDS().withWatermark("ts", "2 hours"), gapSeconds = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_late").start()
    try {
      // batch 1 opens session [1000s..1010s] for user 1
      mem.addData(Event(1, t(1000), "a", 1.0), Event(1, t(1010), "b", 2.0))
      q.processAllAvailable()
      // batch 2 arrives OUT OF ORDER across the trigger boundary:
      //  - t=960s is 40s before the open session's start → merges
      //    backward (startUs and firstType must adjust)
      //  - t=800s is gap-separated from everything → its own session
      mem.addData(Event(1, t(960), "z", 4.0), Event(1, t(800), "y", 5.0))
      q.processAllAvailable()
      val early = spark.table("sess_late").as[Session].collect().map(canon).toSet
      assert(early == Set((1L, 800000000L, 800000000L, 1L, 5.0, "y", "y")), early)
      // two more triggers: advance the watermark past 1010s+gap so the
      // open session times out (timeouts fire the trigger AFTER the
      // watermark moves)
      mem.addData(Event(2, t(20000), "x", 0.0))
      q.processAllAvailable()
      mem.addData(Event(2, t(20010), "x", 0.0))
      q.processAllAvailable()
      val user1 = spark.table("sess_late").as[Session]
        .filter(_.user_id == 1).collect().map(canon).toSet
      val twin = StatefulSessions.sessionizeBatch(
        Seq((1L, t(1000), "a", 1.0), (1L, t(1010), "b", 2.0),
          (1L, t(960), "z", 4.0), (1L, t(800), "y", 5.0))
          .toDF("user_id", "ts", "event_type", "value"), gapSeconds = 60)
        .as[Session].collect().map(canon).toSet
      assert(user1 == twin, s"streamed=$user1 twin=$twin")
      // the backward-extended session really carries the late boundary
      assert(user1.contains((1L, 960000000L, 1010000000L, 3L, 7.0, "z", "b")))
    } finally q.stop()
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
