package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.Layout

class LayoutSpec extends SparkSpec {

  private def writeDocs(dir: String, filesPerPartition: Int,
      maxRecordsPerFile: Long = 0L): Unit =
    Layout.write(
      Tables.documents(spark, sf0001),
      dir, partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
      filesPerPartition = filesPerPartition,
      maxRecordsPerFile = maxRecordsPerFile)

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet")).toSeq

  private def langDirs(root: String): Seq[java.io.File] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("lang=")).toSeq

  test("write partitions by dir, bounds files per dir, sorts within files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    writeDocs(dir, filesPerPartition = 2)
    val dirs = langDirs(dir)
    assert(dirs.nonEmpty, "expected lang=* partition directories")
    dirs.foreach { d =>
      val files = parquetFiles(d)
      assert(files.nonEmpty && files.size <= 2,
        s"${d.getName}: ${files.size} files, bound is 2")
      // rows inside each file are sorted by the sort key
      files.foreach { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids == ids.sorted, s"${f.getName} not sorted by doc_id")
      }
    }
    // nothing lost or duplicated across the layout
    val back = spark.read.parquet(dir)
    assert(back.count() == Tables.documents(spark, sf0001).count())
    assert(back.select("doc_id").distinct().count() == back.count())
  }

  test("partition filter prunes to the matching directory's files only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-p").toString
    writeDocs(dir, filesPerPartition = 2)
    val totalFiles = langDirs(dir).map(d => parquetFiles(d).size).sum
    val enFiles = langDirs(dir).filter(_.getName == "lang=en")
      .map(d => parquetFiles(d).size).sum
    assert(totalFiles > enFiles, "need >1 partition for pruning to matter")

    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("lang"),
      s"partition filter must reach the scan: ${scan.metadata}")
    assert(scan.metrics("numFiles").value == enFiles,
      s"scan read ${scan.metrics("numFiles").value} files; " +
        s"only the $enFiles files under lang=en should be touched")
  }

  test("maxRecordsPerFile caps file length") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-m").toString
    writeDocs(dir, filesPerPartition = 1, maxRecordsPerFile = 5)
    langDirs(dir).foreach { d =>
      parquetFiles(d).foreach { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        assert(n <= 5, s"${f.getName} holds $n rows, cap is 5")
      }
    }
  }
}
