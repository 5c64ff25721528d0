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

  test("IVF over quantized cells + exact re-rank: exhaustive probe equals exact search") {
    val df = clustered()
    // the composed production tier: cells carry int8 columns; the probe
    // prunes, the int8 tier selects candidates, the float tier re-scores
    val qdf = VectorIndex.withQuantized(VectorIndex.withNormalized(df))
      .select("vec_id", "embedding", "qembedding", "qscale")
    val ivf = VectorIndex.buildIvf(qdf, nlist = 5)
    val q = Array(1.0, 0.1, 0.0, 0.05, 0.0, 0.1)
    // the exact baseline under the same rounded-score convention the
    // re-rank tier uses
    val exact = VectorIndex.searchReranked(qdf, q, k = 7, threshold = 0.0)
      .select("vec_id").as[Long].collect().toSeq
    val composed = VectorIndex.searchIvfReranked(
        ivf, q, k = 7, threshold = 0.0, nprobe = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(composed == exact,
      "exhaustive IVF + int8 + re-rank must equal the plain two-tier search")
    // nprobe=1 on cluster-aligned cells still finds the cluster's top-k
    val ivf3 = VectorIndex.buildIvf(qdf, nlist = 3)
    val composed1 = VectorIndex.searchIvfReranked(
        ivf3, Array(1.0, 0.05, 0.0, 0.0, 0.0, 0.05), k = 5, threshold = 0.0, nprobe = 1)
      .select("vec_id").as[Long].collect().toSeq
    val exact1 = VectorIndex.searchReranked(
        qdf, Array(1.0, 0.05, 0.0, 0.0, 0.0, 0.05), k = 5, threshold = 0.0)
      .select("vec_id").as[Long].collect().toSeq
    assert(composed1 == exact1)
  }

  test("persisted IVF round-trips and a probe prunes partition directories") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = clustered()
    val built = VectorIndex.buildIvf(df, nlist = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-rt").toString + "/idx"
    VectorIndex.writeIvf(built, dir)

    val ivf = VectorIndex.loadIvf(spark, dir)
    assert(ivf.nlist == 3)
    assert(ivf.centers.map(_.toSeq).toSeq == built.centers.map(_.toSeq).toSeq,
      "sidecar centers survive the round trip in cell order")

    // reloaded search ≡ in-memory search ≡ brute force (exhaustive probe)
    val q = Array(1.0, 0.1, 0.0, 0.05, 0.0, 0.1)
    val exact = VectorIndex.search(df, q, k = 7, threshold = 0.0)
      .select("vec_id").as[Long].collect().toSeq
    val ann = VectorIndex.searchIvf(ivf, q, k = 7, threshold = 0.0, nprobe = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann == exact)

    // nprobe=1 on the reloaded index touches ONLY the probed cell's
    // files — directory pruning via the numFiles scan metric, the
    // LayoutSpec standard of proof
    def parquetFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val cellDirs = new java.io.File(dir + "/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val totalFiles = cellDirs.map(d => parquetFiles(d).size).sum
    assert(cellDirs.length == 3 && totalFiles > cellDirs.length / 2,
      "need >1 cell directory for pruning to matter")

    val probed = VectorIndex.probeCells(ivf, q, nprobe = 1)
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("cell"),
      s"cell filter must reach the scan as a partition filter: ${scan.metadata}")
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles < totalFiles,
      s"probe read $readFiles of $totalFiles files; must prune directories")
    val maxCellFiles = cellDirs.map(d => parquetFiles(d).size).max
    assert(readFiles <= maxCellFiles,
      s"probe read $readFiles files; one cell has at most $maxCellFiles")
  }

  test("loadIvf rejects a corrupt sidecar: duplicate or missing cell ids") {
    // The signature of an append or a crash mid-rebuild (VERDICT r5 ask
    // #4): a sidecar whose cell ids are not exactly 0..nlist-1 would
    // misdirect every probe, so loadIvf must refuse it loudly.
    val built = VectorIndex.buildIvf(clustered(), nlist = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-corrupt")
      .toString + "/idx"
    VectorIndex.writeIvf(built, dir)
    val good = spark.read.parquet(dir + "/centers")
      .select("cell", "center").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    def writeCenters(rows: Seq[(Int, Seq[Double])]): Unit =
      rows.toDF("cell", "center").coalesce(1)
        .write.mode("overwrite").parquet(dir + "/centers")

    // duplicated cell id — what a second (appending) sidecar write leaves
    writeCenters(good :+ good.head)
    val dup = intercept[IllegalArgumentException](VectorIndex.loadIvf(spark, dir))
    assert(dup.getMessage.contains("overwrite, never append"),
      s"guard message names the contract: ${dup.getMessage}")

    // missing cell id — a half-written rebuild
    writeCenters(good.filterNot(_._1 == 1))
    val miss = intercept[IllegalArgumentException](VectorIndex.loadIvf(spark, dir))
    assert(miss.getMessage.contains("not exactly 0..nlist-1"))

    // restoring the sidecar makes the index loadable again
    writeCenters(good)
    assert(VectorIndex.loadIvf(spark, dir).nlist == 3)
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
