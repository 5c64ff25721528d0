package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.index.VectorIndex

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  test("write partitions by document_version; load prunes to one version") {
    val dir = Files.createTempDirectory("graft-idx").toString + "/idx"
    val rows = Seq(
      ("a", Array(1.0f, 0.0f), "14.0"),
      ("b", Array(0.0f, 1.0f), "14.0"),
      ("c", Array(1.0f, 1.0f), "15.0"))
      .toDF("id", "embedding", "document_version")
    VectorIndex.write(VectorIndex.withNormalized(rows), dir)

    // partition directories exist → version reads prune at the source
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("document_version="))
    assert(dirs.toSet == Set("document_version=14.0", "document_version=15.0"))

    val v14 = VectorIndex.load(spark, dir, Some("14.0"))
    assert(v14.select("id").as[String].collect().toSet == Set("a", "b"))
    // partition filter reaches the scan
    val plan = v14.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("document_version"), s"no partition pruning:\n$plan")

    // idempotent re-ingest of one version: overwrite that partition only
    val again = Seq(("a2", Array(1.0f, 0.0f), "14.0"))
      .toDF("id", "embedding", "document_version")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    VectorIndex.write(VectorIndex.withNormalized(again), dir, mode = "overwrite")
    val all = VectorIndex.load(spark, dir)
    assert(all.select("id").as[String].collect().toSet == Set("a2", "c"),
      "dynamic overwrite must replace only the touched partition")
  }

  test("search on loaded index uses dot product on pre-normalized vectors") {
    val dir = Files.createTempDirectory("graft-idx2").toString + "/idx"
    val rows = (1 to 20).map(i => (s"d$i", Array(i.toFloat, (21 - i).toFloat), "1"))
      .toDF("id", "embedding", "document_version")
    VectorIndex.write(VectorIndex.withNormalized(rows), dir)
    val idx = VectorIndex.load(spark, dir)
    val hit = VectorIndex.search(idx.select("id", "embedding"),
      Array(20.0, 1.0), k = 1, threshold = 0.5, normalizedInput = true)
      .select("id").as[String].head()
    assert(hit == "d20")
  }
}
