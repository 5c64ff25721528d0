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

  test("past the coupon boundary the estimate degrades within the HLL error bound") {
    // r7 verdict ask #6: the registered query's exact oracle is valid
    // only in the coupon regime; this pins what happens OUTSIDE it —
    // the estimate must degrade per the documented ~1.04/sqrt(2^lgK)
    // RSE contract, not silently diverge, and refresh must still equal
    // a fresh rebuild bit-for-bit even when neither is exact.
    val dir = freshDir()
    val lgK = 8 // k=256: RSE ≈ 6.5%; far cheaper to saturate than 2^12
    val n = 50000L
    val rows = (1L to n).map(i => (i, "g", i)) // all values distinct
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 8)
    val s1 = SketchedStats.compute(spark, dir, "grp", "v", lgK = lgK)
    val e1 = est(s1)("g")
    val rse = 1.04 / math.sqrt((1 << lgK).toDouble)
    val relErr = math.abs(e1 - n).toDouble / n
    assert(relErr <= 4 * rse,
      f"estimate $e1 off by ${relErr * 100}%.1f%% — outside 4×RSE (${4 * rse * 100}%.1f%%)")

    // the same data in the 2^12 default regime is ALSO past the coupon
    // boundary; its tighter k must bound the error tighter
    val sDefault = SketchedStats.compute(spark, dir, "grp", "v")
    val eD = est(sDefault)("g")
    assert(math.abs(eD - n).toDouble / n <= 4 * 1.04 / math.sqrt(4096.0))

    // refresh in the estimate regime: delete a slab, insert new values;
    // refresh estimate must equal the fresh rebuild's estimate exactly
    // (same cells ⇒ same union), even though neither equals the truth
    val batch =
      (1L to 1000L).map(i => (i, "g", i, true)) ++
        (60001L to 61000L).map(i => (i, "g", i, false))
    MergeTable.merge(spark, dir, batch.toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val s2 = SketchedStats.refresh(spark, dir, s1, "grp", "v", 1, 2, lgK = lgK)
    val full2 = SketchedStats.compute(spark, dir, "grp", "v", lgK = lgK)
    assert(est(s2) == est(full2),
      "refresh and rebuild must agree cell-for-cell outside the exact regime")
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
