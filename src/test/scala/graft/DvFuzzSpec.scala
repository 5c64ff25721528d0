package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** Seeded model-based fuzz of the merge-on-read delete ledger against
  * an in-memory reference: a random interleaving of CoW merges
  * (upserts + flagged deletes), ledger deletes (present, absent and
  * re-deleted keys), targeted purges, full compactions, layout
  * rewrites and shallow clones must keep every read — latest,
  * time-travel, and the clone — exactly equal to the model, and the
  * final change feed equal to the model's net diff. Every operator
  * interaction the unit pins cover individually gets composed here in
  * orders nobody hand-wrote.
  */
class DvFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-dvfuzz").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("id", "v").as[(Long, Long)].collect().toMap

  test("seeded op-sequence fuzz: ledger deletes compose with every rewrite, reads match the model") {
    val rnd = new Random(42)
    val dir = tmpDir()
    val domain = 300L

    var model: Map[Long, Long] =
      (0L until 100L).map(i => i -> (i * 10)).toMap
    MergeTable.create(spark, dir,
      model.toSeq.toDF("id", "v"), "id", nBuckets = 4)
    var snapshots: Map[Int, Map[Long, Long]] =
      Map(MergeTable.latestVersion(spark, dir) -> model)
    val initial = model

    def randomKeys(n: Int): Seq[Long] =
      Seq.fill(n)(rnd.nextLong(domain)).distinct

    for (step <- 1 to 36) {
      rnd.nextInt(6) match {
        case 0 | 1 => // CoW merge: upserts + flagged deletes
          val ups = randomKeys(1 + rnd.nextInt(8))
            .map(k => (k, rnd.nextLong(1000L), false))
          val dels = randomKeys(rnd.nextInt(4)).map(k => (k, 0L, true))
          val batch = (ups ++ dels).distinctBy(_._1)
          MergeTable.merge(spark, dir, batch.toDF("id", "v", "_del"),
            "id", deleteCol = Some("_del"))
          batch.foreach { case (k, v, del) =>
            model = if (del) model - k else model + (k -> v) }
        case 2 => // ledger delete: mixes present, absent, re-deleted keys
          val keys = randomKeys(1 + rnd.nextInt(10))
          MergeTable.deleteKeys(spark, dir, keys.toDF("id"), "id")
          model = model -- keys
        case 3 => // materialize: targeted purge or full compact
          if (rnd.nextBoolean()) MergeTable.purgeDeletes(spark, dir)
          else MergeTable.compact(spark, dir)
        case 4 => // layout rewrite of a random bucket subset
          val bs = MergeTable.fileIndex(spark, dir).keys.toSeq.sorted
            .filter(_ => rnd.nextBoolean())
          if (bs.nonEmpty)
            MergeTable.reclusterBuckets(spark, dir, Seq("v"), bs,
              filesPerBucket = 2, curve = "range")
        case 5 => // optimize (may no-op)
          MergeTable.optimize(spark, dir, targetFilesPerBucket = 2)
      }
      val v = MergeTable.latestVersion(spark, dir)
      snapshots += v -> model
      assert(rows(MergeTable.read(spark, dir)) == model, s"step $step diverged")
    }

    // time travel: a handful of random retained versions read as their
    // snapshot-time model, pending ledgers of that era included
    val retained = snapshots.keys.toSeq.sorted
    rnd.shuffle(retained).take(5).foreach { v =>
      assert(rows(MergeTable.read(spark, dir, v)) == snapshots(v),
        s"time travel to v$v diverged")
    }

    // the net change feed across the whole run equals the model diff
    val feed = MergeTable.changes(spark, dir, retained.head, retained.last, "id")
      .select("_change", "id", "v").as[(String, Long, Long)].collect()
    val inserted = feed.filter(_._1 == "insert").map(c => c._2 -> c._3).toMap
    val updated = feed.filter(_._1 == "update").map(c => c._2 -> c._3).toMap
    val deleted = feed.filter(_._1 == "delete").map(_._2).toSet
    assert(inserted == (model -- initial.keys),
      "insert feed must be the net-new keys at their final values")
    assert(updated == model.filter { case (k, v) =>
      initial.contains(k) && initial(k) != v },
      "update feed must be the changed survivors at their final values")
    assert(deleted == initial.keySet -- model.keys,
      "delete feed must be the initial keys that did not survive")

    // a clone taken NOW reads the same model and diverges alone
    val c = tmpDir()
    MergeTable.cloneTable(spark, dir, c)
    assert(rows(MergeTable.read(spark, c)) == model)
    MergeTable.deleteKeys(spark, c,
      model.keys.take(3).toSeq.toDF("id"), "id")
    assert(rows(MergeTable.read(spark, dir)) == model,
      "a clone's ledger must never leak into the source")
  }
}
