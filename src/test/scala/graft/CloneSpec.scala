package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** [[MergeTable.cloneTable]] — shallow clone: zero-copy fork, borrowed
  * refs readable and prunable, writes land locally and never touch the
  * source, clone vacuum cannot reclaim borrowed files, pending ledgers
  * and layout intent carry.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-clone").toString

  private def rows(df: DataFrame): Map[Long, (String, Double)] =
    df.select("id", "name", "score").as[(Long, String, Double)]
      .collect().map { case (i, n, s) => i -> (n, s) }.toMap

  private def df(m: Map[Long, (String, Double)]): DataFrame =
    m.toSeq.map { case (i, (n, s)) => (i, n, s) }.toDF("id", "name", "score")

  private val base: Map[Long, (String, Double)] =
    (0L until 200L).map(i => i -> (s"name$i", i * 1.5)).toMap

  private def dataFilesUnder(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).map(_.getName).filter(_.endsWith(".parquet"))
  }

  test("clone is zero-copy, reads identically, diverges without touching the source") {
    val src = tmpDir(); val dst = tmpDir()
    MergeTable.create(spark, src, df(base), "id", nBuckets = 4)
    MergeTable.cloneTable(spark, src, dst)

    // zero-copy: no data file lands under the clone
    assert(dataFilesUnder(dst).isEmpty, "clone must not copy data")
    assert(rows(MergeTable.read(spark, dst)) == base)

    // a merge into the CLONE diverges it; the source is untouched
    val srcFiles = dataFilesUnder(src).sorted
    MergeTable.merge(spark, dst,
      Seq((1L, "forked", 0.0, false), (2L, "", 0.0, true))
        .toDF("id", "name", "score", "_del"),
      "id", deleteCol = Some("_del"))
    assert(rows(MergeTable.read(spark, dst)) ==
      base - 2L + (1L -> ("forked", 0.0)))
    assert(rows(MergeTable.read(spark, src)) == base, "source diverged!")
    assert(dataFilesUnder(src).sorted == srcFiles, "source files changed!")
    // untouched buckets still read from BORROWED refs after the merge
    val borrowed = MergeTable.fileIndex(spark, dst).values.flatten
      .filter(_.startsWith("file:/"))
    assert(borrowed.nonEmpty, "divergence must keep borrowing untouched buckets")

    // clone vacuum reclaims ITS old versions, never borrowed files
    MergeTable.vacuum(spark, dst, keepVersions = 1)
    assert(rows(MergeTable.read(spark, src)) == base)
    assert(rows(MergeTable.read(spark, dst)) ==
      base - 2L + (1L -> ("forked", 0.0)))
  }

  test("zone pruning, layout intent and pending ledgers carry into the clone") {
    val src = tmpDir(); val dst = tmpDir()
    MergeTable.create(spark, src, df(base), "id", nBuckets = 4)
    MergeTable.clusterBy(spark, src, "score", filesPerBucket = 4)
    MergeTable.deleteKeys(spark, src, Seq(10L, 20L).toDF("id"), "id")
    MergeTable.cloneTable(spark, src, dst)

    // the carried zone lines prune on the clone without any harvest
    val (kept, total) = MergeTable.prunedFiles(spark, dst, "score",
      BigDecimal(30), BigDecimal(60))
    assert(total >= 16 && kept.size < total / 2,
      s"carried zones must prune: ${kept.size}/$total")
    val got = MergeTable.readWhere(spark, dst, "score",
        BigDecimal(30), BigDecimal(60))
      .select("id").as[Long].collect().toSet
    assert(got == (20L to 40L).toSet -- Set(10L, 20L),
      "pruned scan on the clone must apply the borrowed ledger")

    // layout intent carried: the clone advises quiet, decays like the
    // source would, and the advisor treats clone-v1 as the baseline
    assert(MergeTable.layout(spark, dst).isDefined)
    assert(MergeTable.advise(spark, dst).isEmpty)
    MergeTable.merge(spark, dst,
      Seq((0L, "x", 0.0)).toDF("id", "name", "score"), "id")
    val advice = MergeTable.advise(spark, dst)
    assert(advice.map(_.action) == Seq("recluster"),
      s"post-clone churn must flag recluster: $advice")

    // pending ledger carried: purge on the CLONE materializes locally
    val v = MergeTable.purgeDeletes(spark, dst)
    assert(MergeTable.pendingDeletes(spark, dst).isEmpty)
    assert(MergeTable.pendingDeletes(spark, src).nonEmpty,
      "the source's ledger is its own")
    assert(rows(MergeTable.read(spark, dst, v)) ==
      base - 10L - 20L + (0L -> ("x", 0.0)))

    // a clone of a clone still resolves (refs pass through)
    val dst2 = tmpDir()
    MergeTable.cloneTable(spark, dst, dst2)
    assert(rows(MergeTable.read(spark, dst2)) ==
      rows(MergeTable.read(spark, dst)))
  }

  test("bloom sidecars carry across the clone: point lookups prune with zero rebuild") {
    import graft.pipeline.FileBlooms
    val src = tmpDir()
    val dst = tmpDir() + "/fork"
    MergeTable.create(spark, src, df(base), "id", nBuckets = 8)
    FileBlooms.build(spark, src, "name")
    val (srcKept, srcTotal) =
      FileBlooms.prunedFilesEq(spark, src, "name", Seq("name7"), 1)
    assert(srcKept.size < srcTotal, "source index must prune")

    MergeTable.cloneTable(spark, src, dst)
    assert(FileBlooms.indexedColumns(spark, dst, 1) == Seq("name"),
      "the clone must inherit the source's bloom sidecars")
    // identical skip ratio through borrowed refs, no column pass run
    val (kept, total) = FileBlooms.prunedFilesEq(spark, dst, "name", Seq("name7"), 1)
    assert(kept.size == srcKept.size && total == srcTotal,
      s"carried sketches must prune like the source: ${kept.size}/$total")
    val got = FileBlooms.readWhereEq(spark, dst, "name", Seq("name7"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(7L))

    // the index keeps advancing on the DIVERGED clone: refresh after a
    // merge carries borrowed lines and sketches only the new files
    MergeTable.merge(spark, dst,
      Seq((7L, "renamed", 0.0)).toDF("id", "name", "score"), "id")
    FileBlooms.refresh(spark, dst, "name", 1, MergeTable.latestVersion(spark, dst))
    val after = FileBlooms.readWhereEq(spark, dst, "name", Seq("name7"))
      .select("id").as[Long].collect().toSet
    assert(after.isEmpty, "the rewritten key's old value must be gone")
    assert(FileBlooms.readWhereEq(spark, dst, "name", Seq("renamed"))
      .select("id").as[Long].collect().toSet == Set(7L))
  }
}
