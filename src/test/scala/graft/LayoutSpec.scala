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

  test("zValue interleaves bits round-robin") {
    import spark.implicits._
    // x=0b101, y=0b011 → bit i of col j at position i*2+j:
    // x0→0, y0→1, x1→2(0), y1→3, x2→4, y2→5(0) = 1+2+8+16 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 3))
      .head().getLong(0)
    assert(z == 27L)
    // z-order curve property: quadrant dominates — all (x,y) in [0,4)²
    // sort before any point with x≥4 or y≥4 at 3 bits... (not true in
    // general for mixed quadrants, but the max of the low quadrant is
    // below the min of the high quadrant corner)
    val lowMax = Seq((3L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3)).head().getLong(0)
    val highMin = Seq((4L, 4L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3)).head().getLong(0)
    assert(lowMax < highMin)
  }

  test("z-order clustering shrinks per-file bounding boxes vs x-sort") {
    import spark.implicits._
    val pts = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")

    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft-x").toString
    Layout.writeClustered(pts, zDir, Seq("x", "y"), numFiles = 16, bits = 6)
    Layout.writeClustered(pts, xDir, Seq("x"), numFiles = 16, bits = 6)

    def bboxes(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("x"), max("x"), min("y"), max("y")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }

    // both layouts tile the square into equal-area boxes; the z-order
    // win is that BOTH dimensions are localized — the x-sorted layout
    // leaves every file spanning the full y range
    def yExtent(bs: Seq[(Long, Long, Long, Long)]): Long =
      bs.map { case (_, _, y0, y1) => y1 - y0 + 1 }.sum
    val (zBoxes, xBoxes) = (bboxes(zDir), bboxes(xDir))
    assert(zBoxes.size == 16 && xBoxes.size == 16)
    assert(yExtent(zBoxes) <= yExtent(xBoxes) / 2,
      s"z-order y-extents ${yExtent(zBoxes)} vs x-sort ${yExtent(xBoxes)}")

    // a 2-D range predicate (one quadrant corner) touches strictly
    // fewer files under z-order: x-sort must open every file whose x
    // range intersects, and each of those spans all y
    def filesTouching(bs: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long): Int =
      bs.count { case (x0, x1, y0, y1) =>
        x0 <= hi && x1 >= lo && y0 <= hi && y1 >= lo
      }
    assert(filesTouching(zBoxes, 0, 15) < filesTouching(xBoxes, 0, 15),
      s"z ${filesTouching(zBoxes, 0, 15)} vs x ${filesTouching(xBoxes, 0, 15)}")
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
