package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{BucketedView, MergeTable}

/** [[BucketedView]] — the generic bucket-partial pattern must maintain
  * non-delta-able aggregates (min/max) exactly through deletes of the
  * extreme value, and refresh must equal a full rebuild.
  */
class BucketedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-bview")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private val partials = Seq(
    count(lit(1)).as("c"), sum(col("v")).as("s"),
    min(col("v")).as("mn"), max(col("v")).as("mx"))
  private val finals = Seq(
    sum(col("c")).as("n"), sum(col("s")).as("total"),
    min(col("mn")).as("v_min"), max(col("mx")).as("v_max"))

  private def fin(view: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long, Long)] =
    BucketedView.finalizeView(view, "grp", finals)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  private def direct(dir: String): Map[String, (Long, Long, Long, Long)] =
    MergeTable.read(spark, dir).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("v").as("total"),
        min("v").as("v_min"), max("v").as("v_max"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("min/max survive deletion of the extreme value via touched-bucket rebuild") {
    val dir = freshDir()
    val rows = (1L to 100L).map(i => (i, "g" + (i % 3), i * 10))
    MergeTable.create(spark, dir, rows.toDF("id", "grp", "v"), "id", nBuckets = 8)
    val v1 = BucketedView.compute(spark, dir, "grp", partials)
    assert(fin(v1) == direct(dir))

    // delete the global max (id=100, grp=g1, v=1000) and g0's min;
    // update one row's value past the old max; insert a new low
    MergeTable.merge(spark, dir, Seq(
      (100L, "g1", 1000L, true),
      (3L, "g0", 30L, true),
      (50L, "g2", 5000L, false),
      (200L, "g1", 1L, false)
    ).toDF("id", "grp", "v", "_del"), "id", deleteCol = Some("_del"))
    val v2 = BucketedView.refresh(spark, dir, v1, "grp", partials, 1, 2)
    assert(fin(v2) == direct(dir), "deleted extremes must disappear from min/max")
    // refresh == full rebuild, cell values included
    val full = BucketedView.compute(spark, dir, "grp", partials)
    assert(fin(v2) == fin(full))
  }
}
