package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{MergeTable, SketchedStats}

/** [[SketchedStats]] — bucket-level sketch materialization must equal a
  * fresh full build after any merge (incl. deletes, which plain sketch
  * algebra cannot subtract), estimates must be exact in the coupon
  * regime, and a refresh must carry untouched buckets' cells forward
  * byte-identically (the cost model's witness).
  */
class SketchedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-sketch")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def est(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    SketchedStats.estimate(df, "grp")
      .as[(String, Long)].collect().toMap

  private def exact(spark: org.apache.spark.sql.SparkSession, dir: String): Map[String, Long] =
    MergeTable.read(spark, dir).groupBy("grp")
      .agg(countDistinct(col("v")).as("nd"))
      .as[(String, Long)].collect().toMap

  test("estimate is exact in the coupon regime and survives deletes via re-sketch") {
    val dir = freshDir()
    val rows = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b", i % 40))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 8)
    val s1 = SketchedStats.compute(spark, dir, "grp", "v")
    assert(est(s1) == exact(spark, dir))

    // delete every v==0 carrier in group b, move some a→b, insert new values
    val batch =
      rows.filter { case (i, g, v) => g == "b" && v == 0 }
        .map { case (i, g, v) => (i, g, v, true) } ++
      Seq((3L, "b", 39L, false), (6L, "b", 38L, false), // group move
          (500L, "c", 7L, false), (501L, "c", 7L, false)) // new group, dup value
    MergeTable.merge(spark, dir, batch.toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val s2 = SketchedStats.refresh(spark, dir, s1, "grp", "v", 1, 2)
    assert(est(s2) == exact(spark, dir), "refresh must track deletes exactly")
    // refresh == full rebuild, cell for cell
    val full2 = SketchedStats.compute(spark, dir, "grp", "v")
    assert(est(s2) == est(full2))
  }

  test("refresh carries untouched buckets' sketch cells forward byte-identically") {
    val dir = freshDir()
    val rows = (1L to 300L).map(i => (i, "g" + (i % 5), i % 50))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 16)
    val s1 = SketchedStats.compute(spark, dir, "grp", "v")
      .persist()
    // touch exactly one key → one bucket
    MergeTable.merge(spark, dir,
      Seq((7L, "g2", 49L, false)).toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val changed = MergeTable.changedBucketIds(spark, dir, 1, 2)
    assert(changed.size == 1, s"one key must touch one bucket: $changed")
    val s2 = SketchedStats.refresh(spark, dir, s1, "grp", "v", 1, 2)
    val before = s1.filter(!col("bucket").isin(changed: _*))
      .select("bucket", "grp", "sketch")
      .as[(Int, String, Array[Byte])].collect()
      .map { case (b, g, s) => (b, g, s.toSeq) }.toSet
    val after = s2.filter(!col("bucket").isin(changed: _*))
      .select("bucket", "grp", "sketch")
      .as[(Int, String, Array[Byte])].collect()
      .map { case (b, g, s) => (b, g, s.toSeq) }.toSet
    assert(after == before, "untouched cells must carry forward unchanged")
    assert(est(s2) == exact(spark, dir))
    s1.unpersist()
  }

  test("no-change transition (value-identical re-merge) is a full no-op") {
    val dir = freshDir()
    val rows = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 4)
    val s1 = SketchedStats.compute(spark, dir, "grp", "v")
    MergeTable.merge(spark, dir,
      rows.map { case (i, g, v) => (i, g, v, false) }.toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    // value-identical merge still rewrites the keys' buckets (CoW), so
    // cells refresh — but estimates cannot move
    val s2 = SketchedStats.refresh(spark, dir, s1, "grp", "v", 1, 2)
    assert(est(s2) == est(s1))
  }
}
