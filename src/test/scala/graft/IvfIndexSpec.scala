package graft

import org.apache.spark.sql.functions._

import graft.index.VectorIndex

/** IVF ANN: build/probe/search semantics and the recall-vs-cost trade on
  * deterministically separable clusters. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated clusters on orthogonal axes, deterministic noise
    * from the row id (no RNG — resumable builds must reproduce). */
  private def clustered() = {
    val rows = (0 until 90).map { i =>
      val axis = i % 3
      val noise = Array.tabulate(6)(j => ((i * 31 + j * 7) % 13).toDouble / 130.0)
      val v = Array.tabulate(6)(j => noise(j) + (if (j == axis * 2) 1.0 else 0.0))
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("nprobe == nlist is exhaustive: identical to brute-force search") {
    val df = clustered()
    val ivf = VectorIndex.buildIvf(df, nlist = 5)
    val q = Array(1.0, 0.1, 0.0, 0.05, 0.0, 0.1)
    val exact = VectorIndex.search(df, q, k = 7, threshold = 0.0)
      .select("vec_id").as[Long].collect().toSeq
    val ann = VectorIndex.searchIvf(ivf, q, k = 7, threshold = 0.0, nprobe = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann == exact)
  }

  test("nprobe = 1 on separable clusters still finds the exact top-k") {
    val df = clustered()
    // nlist = number of true clusters → each cell is one cluster; a
    // query on a cluster axis needs only its own cell
    val ivf = VectorIndex.buildIvf(df, nlist = 3)
    assert(ivf.nlist == 3)
    val q = Array(1.0, 0.05, 0.0, 0.0, 0.0, 0.05) // near cluster axis 0
    val exact = VectorIndex.search(df, q, k = 5, threshold = 0.0)
      .select("vec_id").as[Long].collect().toSeq
    val ann = VectorIndex.searchIvf(ivf, q, k = 5, threshold = 0.0, nprobe = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann == exact)
    // and it really scanned one cell, not the corpus
    val probedRows = VectorIndex.probeCells(ivf, q, nprobe = 1).count()
    assert(probedRows < df.count())
  }

  test("cells partition the corpus and partitionBy(cell) prunes on probe") {
    val df = clustered()
    val ivf = VectorIndex.buildIvf(df, nlist = 3)
    assert(ivf.cells.count() == 90)
    assert(ivf.cells.select("cell").distinct().count() == 3)

    // the 100 TB layout: cell is the partition directory; a probe scan
    // of the persisted index reads only the probed directories
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    ivf.cells.write.partitionBy("cell").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val q = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val probed = VectorIndex.probeCells(ivf.copy(cells = onDisk), q, nprobe = 1)
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || probed.count() < 90)
  }
}
