package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{IncrementalStats, MergeTable}

/** [[IncrementalStats]] (a [[graft.pipeline.BucketedView]] instance)
  * + [[MergeTable.rowDeltas]] — the incremental view refresh must equal
  * a full recompute of the new version EXACTLY, across inserts, value
  * updates, group moves, deletes that empty a group, chained refreshes,
  * and compaction (layout-only rewrite).
  */
class IncrementalStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivm")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def mkDocs(rows: Seq[(Long, String, Long)]) =
    rows.toDF("id", "grp", "v")

  private def statsOf(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.select("grp", "n", "total").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("rowDeltas: updates emit signed pre+post pairs; signs cancel per unchanged key") {
    val dir = freshDir()
    MergeTable.create(spark, dir,
      mkDocs(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))), "id", nBuckets = 4)
    val batch = Seq(
      (2L, "b", 25L, false), // update: value + group move
      (3L, "b", 30L, true),  // delete
      (4L, "c", 40L, false)  // insert
    ).toDF("id", "grp", "v", "_del")
    MergeTable.merge(spark, dir, batch, "id", deleteCol = Some("_del"))
    val d = MergeTable.rowDeltas(spark, dir, 1, 2, "id")
      .select("_sign", "id", "grp", "v").as[(Int, Long, String, Long)]
      .collect().toSet
    assert(d == Set(
      (-1, 2L, "a", 20L), (1, 2L, "b", 25L), // update pair
      (-1, 3L, "b", 30L),                    // delete pre-image
      (1, 4L, "c", 40L)))                    // insert post-image
  }

  test("view refresh equals full recompute through merges, group-emptying and chains") {
    val dir = freshDir()
    MergeTable.create(spark, dir, mkDocs(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L),
      (5L, "c", 50L))), "id", nBuckets = 4)
    val v1 = IncrementalStats.view(spark, dir, "grp", "v", version = 1)
    assert(statsOf(IncrementalStats.finalizeStats(v1, "grp")) ==
      statsOf(IncrementalStats.compute(MergeTable.read(spark, dir, 1), "grp", "v")))

    // batch 1: move 2 a→b, bump 3, delete 5 (empties group c), insert d
    MergeTable.merge(spark, dir, Seq(
      (2L, "b", 20L, false), (3L, "b", 35L, false),
      (5L, "c", 50L, true), (6L, "d", 60L, false)
    ).toDF("id", "grp", "v", "_del"), "id", deleteCol = Some("_del"))
    val v2 = IncrementalStats.refreshView(spark, dir, v1, "grp", "v", 1, 2)
    val s2 = statsOf(IncrementalStats.finalizeStats(v2, "grp"))
    val full2 = IncrementalStats.compute(MergeTable.read(spark, dir, 2), "grp", "v")
    assert(s2 == statsOf(full2))
    assert(!s2.contains("c"), "emptied group must drop out")

    // batch 2 chained off the INCREMENTAL v2, not a recompute
    MergeTable.merge(spark, dir, Seq(
      (1L, "d", 11L, false), (6L, "d", 60L, true)
    ).toDF("id", "grp", "v", "_del"), "id", deleteCol = Some("_del"))
    val v3 = IncrementalStats.refreshView(spark, dir, v2, "grp", "v", 2, 3)
    val full3 = IncrementalStats.compute(MergeTable.read(spark, dir, 3), "grp", "v")
    assert(statsOf(IncrementalStats.finalizeStats(v3, "grp")) == statsOf(full3))

    // compaction rewrites layout, not rows: every bucket is "changed",
    // cells are rebuilt, and the finalized stats must not move
    MergeTable.compact(spark, dir)
    val latest = MergeTable.versions(spark, dir).max
    val v4 = IncrementalStats.refreshView(spark, dir, v3, "grp", "v", 3, latest)
    assert(statsOf(IncrementalStats.finalizeStats(v4, "grp")) == statsOf(full3))
  }

  test("null group key merges as ONE group through a view refresh") {
    val dir = freshDir()
    MergeTable.create(spark, dir, Seq(
      (1L, Option.empty[String], 10L), (2L, Some("a"), 20L),
      (3L, Option.empty[String], 30L)).toDF("id", "grp", "v"),
      "id", nBuckets = 4)
    val v1 = IncrementalStats.view(spark, dir, "grp", "v", version = 1)
    MergeTable.merge(spark, dir,
      Seq((4L, Option.empty[String], 40L, false)).toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val fin = IncrementalStats.finalizeStats(
      IncrementalStats.refreshView(spark, dir, v1, "grp", "v", 1, 2), "grp")
    val nullRows = fin.filter(col("grp").isNull)
      .select("n", "total").as[(Long, Long)].collect()
    assert(nullRows.toSeq == Seq((3L, 80L)),
      s"null group must be one merged row, got ${nullRows.toSeq}")
  }

  test("value-identical re-merge produces an empty delta and unchanged stats") {
    val dir = freshDir()
    val rows = Seq((1L, "a", 10L), (2L, "b", 20L))
    MergeTable.create(spark, dir, mkDocs(rows), "id", nBuckets = 2)
    val v1 = IncrementalStats.view(spark, dir, "grp", "v", version = 1)
    val s1 = statsOf(IncrementalStats.finalizeStats(v1, "grp"))
    MergeTable.merge(spark, dir,
      rows.map { case (i, g, v) => (i, g, v, false) }.toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    assert(MergeTable.rowDeltas(spark, dir, 1, 2, "id").count() == 0)
    val v2 = IncrementalStats.refreshView(spark, dir, v1, "grp", "v", 1, 2)
    assert(statsOf(IncrementalStats.finalizeStats(v2, "grp")) == s1)
  }
}
