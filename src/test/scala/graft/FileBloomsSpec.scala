package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{FileBlooms, MergeTable}

/** [[graft.pipeline.FileBlooms]] — per-file Bloom sidecars, the
  * equality-lookup complement of ZoneMaps: point/`IN` predicates on
  * high-cardinality columns skip files whose sketch rejects every
  * probe; exact result under any layout; refresh carries unchanged
  * files' sketch lines byte-for-byte. */
class FileBloomsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String, n: Long = 4000L): Unit =
    MergeTable.create(spark,
      dir,
      (1L to n).map(i => (i, s"tag-$i", i % 97)).toDF("id", "tag", "score"),
      "id", nBuckets = 8)

  test("point lookup skips most files on a hash layout; result is exact") {
    val dir = s"${Files.createTempDirectory("graft-blooms")}/t"
    mkTable(dir)

    // zone maps are useless here: `tag` is a string, and hash layout
    // scatters ids — this is exactly the gap the bloom sidecar fills
    FileBlooms.build(spark, dir, "tag")
    val probes = Seq("tag-42", "tag-1234", "tag-3999")
    val (kept, total) = FileBlooms.prunedFilesEq(spark, dir, "tag", probes)
    assert(total >= 8, s"expected a multi-file table, got $total")
    // three values live in ≤3 files; every other sketch rejects w.h.p.
    assert(kept.size <= math.min(total, 3 + total / 4),
      s"3-value lookup must skip most of a $total-file table: kept ${kept.size}")

    val got = FileBlooms.readWhereEq(spark, dir, "tag", probes)
      .select("id").as[Long].collect().toSet
    assert(got == Set(42L, 1234L, 3999L))
  }

  test("an unindexed column never skips (absence of evidence keeps every file)") {
    val dir = s"${Files.createTempDirectory("graft-blooms2")}/t"
    mkTable(dir, n = 500L)
    val (kept, total) = FileBlooms.prunedFilesEq(spark, dir, "tag", Seq("tag-7"))
    assert(kept.size == total, "no sidecar → every file kept")
    val got = FileBlooms.readWhereEq(spark, dir, "tag", Seq("tag-7"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(7L))
  }

  test("refresh carries unchanged files' sketches byte-for-byte, scans only new ones") {
    val dir = s"${Files.createTempDirectory("graft-blooms3")}/t"
    mkTable(dir)
    FileBlooms.build(spark, dir, "tag")
    val s1 = FileBlooms.read(spark, dir, "tag", 1).get

    // one-key merge rewrites one bucket; 7 of 8 carry forward
    val v2 = MergeTable.merge(spark, dir,
      Seq((42L, "tag-rewritten", 0L)).toDF("id", "tag", "score"), "id")
    FileBlooms.refresh(spark, dir, "tag", 1, v2)
    val s2 = FileBlooms.read(spark, dir, "tag", v2).get

    val idx1 = MergeTable.fileIndex(spark, dir, 1).values.flatten.toSet
    val idx2 = MergeTable.fileIndex(spark, dir, v2).values.flatten.toSet
    val carried = idx2.intersect(idx1)
    assert(carried.nonEmpty, "a one-key merge must carry most buckets forward")
    carried.foreach { rel =>
      assert(java.util.Arrays.equals(s2(rel), s1(rel)),
        s"carried file $rel must keep its sketch bytes")
    }
    assert((idx2 -- idx1).forall(s2.contains), "new files must be sketched")

    // the new value is findable through the refreshed index; the old
    // value of the rewritten key is gone
    val hit = FileBlooms.readWhereEq(spark, dir, "tag", Seq("tag-rewritten"), v2)
      .select("id").as[Long].collect().toSet
    assert(hit == Set(42L))
    val stale = FileBlooms.readWhereEq(spark, dir, "tag", Seq("tag-42"), v2)
      .select("id").as[Long].collect().toSet
    assert(stale.isEmpty, "rewritten key's old value must not match")
  }

  test("pruning equals the full-scan filter on every probe shape (superset pass is exact)") {
    val dir = s"${Files.createTempDirectory("graft-blooms4")}/t"
    mkTable(dir, n = 1000L)
    FileBlooms.build(spark, dir, "score") // LONG column — low cardinality
    // every file holds most score values → blooms keep ~all files, and
    // the answer must STILL be exact (pruning never promises skipping)
    val probes: Seq[Any] = Seq(10L, 42L)
    val got = FileBlooms.readWhereEq(spark, dir, "score", probes)
      .select("id").as[Long].collect().toSet
    val want = (1L to 1000L).filter(i => i % 97 == 10 || i % 97 == 42).toSet
    assert(got == want && want.nonEmpty)
  }

  test("absent probe values return empty, not an error") {
    val dir = s"${Files.createTempDirectory("graft-blooms5")}/t"
    mkTable(dir, n = 300L)
    FileBlooms.build(spark, dir, "tag")
    val (kept, total) = FileBlooms.prunedFilesEq(
      spark, dir, "tag", Seq("no-such-tag", "also-missing"))
    assert(kept.size < total, "absent values should skip essentially everything")
    assert(FileBlooms.readWhereEq(spark, dir, "tag", Seq("no-such-tag")).count() == 0)
  }
}
