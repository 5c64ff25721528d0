package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{MergeTable, QuantileStats}

/** [[QuantileStats]] — bucket-level quantile-sketch cells must equal a
  * fresh full build after any merge (deletes included: a deleted rank
  * cannot be "subtracted", only re-sketched), quantiles must be exact
  * in the bounded-domain regime, and untouched cells must carry
  * forward byte-identically.
  */
class QuantileStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-qstats")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private val qs = Seq(0.25, 0.5, 0.75)

  private def quantiles(view: org.apache.spark.sql.DataFrame): Map[String, (Long, Double, Double, Double)] =
    QuantileStats.quantiles(view, "grp", qs)
      .as[(String, Long, Double, Double, Double)].collect()
      .map { case (g, n, a, b, c) => (g, (n, a, b, c)) }.toMap

  /** Exact rank-rule reference over the live table. */
  private def exact(dir: String): Map[String, (Long, Double, Double, Double)] =
    MergeTable.read(spark, dir)
      .select(col("grp"), col("v").cast("double").as("v"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        def q(p: Double): Double =
          sorted((math.max(1L, math.ceil(p * sorted.length).toLong) - 1).toInt)
        (g, (sorted.length.toLong, q(0.25), q(0.5), q(0.75)))
      }

  test("quantiles are exact over the bounded domain and survive deletes via re-sketch") {
    val dir = freshDir()
    val rows = (1L to 400L).map(i => (i, if (i % 4 == 0) "a" else "b", i % 40))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 8)
    val v1 = QuantileStats.compute(spark, dir, "grp", "v")
    assert(quantiles(v1) == exact(dir))

    // delete a slab carrying low ranks, move keys across groups,
    // insert a new group with duplicated values
    val batch =
      rows.filter { case (_, g, v) => g == "b" && v < 10 }
        .map { case (i, g, v) => (i, g, v, true) } ++
        Seq((4L, "b", 39L, false), (8L, "b", 38L, false),
          (900L, "c", 7L, false), (901L, "c", 7L, false), (902L, "c", 11L, false))
    MergeTable.merge(spark, dir, batch.toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val v2 = QuantileStats.refresh(spark, dir, v1, "grp", "v", 1, 2)
    assert(quantiles(v2) == exact(dir), "refresh must track deletes/moves exactly")
    val full2 = QuantileStats.compute(spark, dir, "grp", "v")
    assert(quantiles(v2) == quantiles(full2), "refresh == full rebuild")
  }

  test("refresh carries untouched buckets' sketch cells forward byte-identically") {
    val dir = freshDir()
    val rows = (1L to 300L).map(i => (i, "g" + (i % 5), i % 50))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 16)
    val v1 = QuantileStats.compute(spark, dir, "grp", "v").persist()
    MergeTable.merge(spark, dir,
      Seq((7L, "g2", 49L, false)).toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val changed = MergeTable.changedBucketIds(spark, dir, 1, 2)
    assert(changed.size == 1, s"one key must touch one bucket: $changed")
    val v2 = QuantileStats.refresh(spark, dir, v1, "grp", "v", 1, 2)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.filter(!col("bucket").isin(changed: _*))
        .select("bucket", "grp", "qs")
        .as[(Int, String, Array[Byte])].collect()
        .map { case (b, g, s) => (b, g, s.toSeq) }.toSet
    assert(cells(v2) == cells(v1), "untouched cells must carry forward unchanged")
    assert(quantiles(v2) == exact(dir))
    v1.unpersist()
  }

  test("chained refreshes stay exact and a group emptied by deletes drops out") {
    val dir = freshDir()
    val rows = (1L to 120L).map(i => (i, if (i <= 20) "tiny" else "big", i % 30))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 8)
    val v1 = QuantileStats.compute(spark, dir, "grp", "v")

    // v2: shift some values
    MergeTable.merge(spark, dir,
      (21L to 40L).map(i => (i, "big", (i % 30) + 3, false))
        .toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val v2 = QuantileStats.refresh(spark, dir, v1, "grp", "v", 1, 2)
    assert(quantiles(v2) == exact(dir))

    // v3: delete the whole tiny group
    MergeTable.merge(spark, dir,
      (1L to 20L).map(i => (i, "tiny", 0L, true)).toDF("id", "grp", "v", "_del"),
      "id", deleteCol = Some("_del"))
    val v3 = QuantileStats.refresh(spark, dir, v2, "grp", "v", 2, 3)
    val got = quantiles(v3)
    assert(!got.contains("tiny"), "an emptied group must drop out of the view")
    assert(got == exact(dir))
  }
}
