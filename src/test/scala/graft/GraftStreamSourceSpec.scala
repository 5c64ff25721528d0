package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.MergeTable

/** `readStream.format("graft")` — the streaming SOURCE over a
  * MergeTable version chain ([[graft.streaming.GraftStreamSource]],
  * round-15 verdict ask #5): a downstream consumer FOLLOWS a table an
  * independent writer commits to — initial snapshot, then per-version
  * change feed, offsets = versions — and a restart from the same
  * checkpoint resumes exactly where the offset log stopped, across
  * commits that happened while the stream was down. */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-streamsrc").toString

  /** Drain the feed via foreachBatch into `sink`, AvailableNow (runs
    * to the current head, then stops — the restart-friendly trigger). */
  private def drain(
      dir: String, checkpoint: String,
      sink: ConcurrentLinkedQueue[(String, Long, String)],
      snapshot: Boolean = true): Unit = {
    val reader = spark.readStream.format("graft").option("path", dir)
    val q = (if (snapshot) reader else reader.option("snapshot", "false"))
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r: Row =>
          sink.add((r.getString(r.fieldIndex("_change")),
            r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("name"))))
        }
        ()
      }
      .start()
    q.awaitTermination(120000L)
    ()
  }

  /** Replay a change feed into the final keyed state. */
  private def replay(
      feed: Seq[(String, Long, String)]): Map[Long, String] =
    feed.foldLeft(Map.empty[Long, String]) {
      case (st, ("delete", id, _)) => st - id
      case (st, (_, id, name)) => st.updated(id, name)
    }

  test("snapshot + change feed follow an independent writer; restart resumes from the offset log") {
    val dir = tmpDir() + "/t"
    val ckpt = tmpDir()
    val sink = new ConcurrentLinkedQueue[(String, Long, String)]()

    // independent writer: v1
    MergeTable.create(spark, dir,
      (0L until 50L).map(i => (i, s"n$i")).toDF("id", "name"), "id",
      nBuckets = 4)
    drain(dir, ckpt, sink)
    val afterSnap = sink.asScala.toSeq
    assert(afterSnap.size == 50 && afterSnap.forall(_._1 == "insert"),
      s"first batch must be the full snapshot: ${afterSnap.take(5)}")

    // v2: update / delete / insert — the stream picks up ONLY the delta
    MergeTable.merge(spark, dir,
      Seq((3L, "updated", false), (7L, "x", true), (100L, "new", false))
        .toDF("id", "name", "_del"),
      "id", deleteCol = Some("_del"), validate = false)
    drain(dir, ckpt, sink)
    val afterV2 = sink.asScala.toSeq
    val delta2 = afterV2.drop(afterSnap.size)
    assert(delta2.toSet == Set(("update", 3L, "updated"),
      ("delete", 7L, "n7"), ("insert", 100L, "new")),
      s"second batch must be exactly the v1->v2 change feed: $delta2")

    // two commits while the stream is DOWN; the restart replays both
    MergeTable.merge(spark, dir,
      Seq((1L, "one-b")).toDF("id", "name"), "id")
    MergeTable.deleteKeys(spark, dir, Seq(2L).toDF("id"), "id")
    drain(dir, ckpt, sink)
    val all = sink.asScala.toSeq
    assert(all.size > afterV2.size, "the restart must deliver the missed delta")

    // batch/stream parity: the replayed feed state IS the table head
    val got = replay(all)
    val want = MergeTable.read(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got == want,
      s"replayed stream state must equal the table: ${got.size} vs ${want.size}")

    // idempotence: another drain with nothing new delivers nothing
    val before = sink.size()
    drain(dir, ckpt, sink)
    assert(sink.size() == before, "an unchanged table must feed no rows")
  }

  test("snapshot=false starts from the stream-start version: changes only") {
    val dir = tmpDir() + "/t"
    val ckpt = tmpDir()
    val sink = new ConcurrentLinkedQueue[(String, Long, String)]()
    MergeTable.create(spark, dir,
      (0L until 30L).map(i => (i, s"n$i")).toDF("id", "name"), "id",
      nBuckets = 2)
    MergeTable.merge(spark, dir, Seq((5L, "pre")).toDF("id", "name"), "id")

    // stream starts at v2 with snapshot disabled: nothing yet
    drain(dir, ckpt, sink, snapshot = false)
    assert(sink.isEmpty, s"no snapshot may arrive: ${sink.asScala.take(5)}")

    MergeTable.merge(spark, dir, Seq((6L, "post")).toDF("id", "name"), "id")
    drain(dir, ckpt, sink, snapshot = false)
    assert(sink.asScala.toSet == Set(("update", 6L, "post")),
      s"only the post-start delta may arrive: ${sink.asScala.toSeq}")
  }

  test("FollowTable replicates an independently-written source, restart-safe, deletes included") {
    val root = tmpDir()
    val src = s"$root/src"; val dst = s"$root/dst"; val ckpt = s"$root/ckpt"
    MergeTable.create(spark, src,
      (0L until 200L).map(i => (i, s"n$i")).toDF("id", "name"), "id",
      nBuckets = 4)
    def follow(): Unit = {
      val q = graft.streaming.FollowTable.start(spark, src, dst, ckpt)
      q.awaitTermination(120000L); ()
    }
    follow()
    def asMap(dir: String): Map[Long, String] =
      MergeTable.read(spark, dir).as[(Long, String)].collect().toMap
    assert(asMap(dst) == asMap(src), "the follower must equal the source")

    // two independent commits while the follower is DOWN — one drain
    // catches up, delete included
    MergeTable.merge(spark, src,
      Seq((3L, "updated", false), (7L, "x", true), (900L, "new", false))
        .toDF("id", "name", "_del"),
      "id", deleteCol = Some("_del"), validate = false)
    MergeTable.deleteKeys(spark, src, Seq(5L).toDF("id"), "id")
    follow()
    assert(asMap(dst) == asMap(src),
      "the follower must track updates, inserts and both delete forms")

    // idempotence: following an unchanged source commits nothing
    val v = MergeTable.latestVersion(spark, dst)
    follow()
    assert(MergeTable.latestVersion(spark, dst) == v,
      "an unchanged source must not advance the follower")
  }

  test("maxVersionsPerBatch bounds catch-up batches by version count") {
    val root = tmpDir()
    val src = s"$root/src"; val ckpt = s"$root/ckpt"
    MergeTable.create(spark, src,
      (0L until 20L).map(i => (i, s"n$i")).toDF("id", "name"), "id",
      nBuckets = 2)
    (1 to 4).foreach { i =>
      MergeTable.merge(spark, src,
        Seq((i.toLong, s"v$i")).toDF("id", "name"), "id")
    }
    // 5 versions behind; cap at 2 versions per batch → ≥3 batches
    var batches = 0
    val sink = new ConcurrentLinkedQueue[(String, Long, String)]()
    val q = spark.readStream.format("graft").option("path", src)
      .option("maxVersionsPerBatch", "2").load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches += 1
        b.collect().foreach { r: Row =>
          sink.add((r.getString(0), r.getLong(1), r.getString(2))) }
        ()
      }.start()
    q.awaitTermination(120000L)
    assert(batches >= 3, s"5 versions at cap 2 must take >=3 batches: $batches")
    // replayed state still exact
    val got = replay(sink.asScala.toSeq)
    val want = MergeTable.read(spark, src).as[(Long, String)].collect().toMap
    assert(got == want, "bounded catch-up must deliver the same state")
  }

  test("the declared source schema is _change + the table's columns") {
    val dir = tmpDir() + "/t"
    MergeTable.create(spark, dir,
      Seq((1L, "a")).toDF("id", "name"), "id", nBuckets = 2)
    val df = spark.readStream.format("graft").option("path", dir).load()
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq == Seq("_change", "id", "name"))
  }
}
