package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout for the 100 TB corpus: partitioned, sorted,
  * file-count-bounded parquet.
  *
  * The three knobs that decide whether a 100 TB dataset is readable:
  *
  *  - **Directory partitioning** on low-cardinality columns (`lang`,
  *    ingest date): queries filtering on them skip whole directories
  *    (partition pruning — asserted in `LayoutSpec` via the scan's
  *    `numFiles` metric, not just the plan string).
  *  - **Sorting within files** on a high-cardinality key (`doc_id`):
  *    parquet row-group min/max statistics become selective, so point
  *    and range reads skip row groups inside the surviving files.
  *  - **Bounded file counts**: naive `df.write.partitionBy(...)` emits
  *    up to `#tasks × #partition-values` files — the small-files
  *    problem that kills list/open-heavy readers at scale. The writer
  *    first shuffles on `(partitionCols, spread)` where `spread` is a
  *    hash of the sort key into `filesPerPartition` buckets, so each
  *    output directory gets at most `filesPerPartition` files, written
  *    by `filesPerPartition` parallel tasks — a hot partition value
  *    (one dominant language) fans out instead of pinning one writer
  *    task, the same salting idea as `graft.ops.SkewJoin`.
  *    `maxRecordsPerFile` additionally caps file length (splits count
  *    above the bound).
  */
object Layout {

  /** Write `df` to `dir` as partitioned + sorted + bounded parquet.
    *
    * @param partitionCols low-cardinality directory-partition columns
    * @param sortCols      within-file sort (row-group stats) — also the
    *                      spread key; pass the primary read key first
    * @param filesPerPartition max files (and writer tasks) per
    *                      partition directory
    * @param maxRecordsPerFile 0 = unbounded (Spark semantics)
    */
  def write(
      df: DataFrame,
      dir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 4,
      maxRecordsPerFile: Long = 0L,
      mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition > 0)
    // the spread key must be deterministic per ROW CONTENT: a
    // nondeterministic key (monotonically_increasing_id, rand) changes
    // on stage retry, and a repartition on a changed key can duplicate
    // or drop rows when only some map tasks recompute
    val spreadCols =
      if (sortCols.nonEmpty) sortCols
      else df.columns.filterNot(partitionCols.contains).toSeq
    val spread =
      if (spreadCols.isEmpty) lit(0)
      else pmod(hash(spreadCols.map(col): _*), lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ spread: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(mode)
      .parquet(dir)
  }

  /** Bucketed table write: hash-bucket (and sort) rows by the join key
    * at write time, so every subsequent equi-join or aggregation on
    * that key between same-bucketed tables is co-partitioned — ZERO
    * shuffle of either side at read time (asserted on the physical
    * plan in `TypedApiSpec`). This is the write-side answer to the
    * most expensive recurring shuffle in a pipeline: at 100 TB,
    * bucketing fact tables on their join key once replaces a
    * full-table exchange in every downstream join. Bucket metadata
    * lives in the catalog, hence `saveAsTable`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKey: String,
      buckets: Int,
      sortCols: Seq[String] = Seq.empty,
      mode: String = "overwrite"): Unit = {
    require(buckets > 0)
    val sorted = sortCols match {
      case head +: tail => df.write.bucketBy(buckets, bucketKey).sortBy(head, tail: _*)
      case _ => df.write.bucketBy(buckets, bucketKey).sortBy(bucketKey)
    }
    sorted.mode(mode).saveAsTable(table)
  }

  /** Z-order (Morton) value: interleave the low `bits` bits of each
    * column round-robin — bit `i` of column `j` lands at position
    * `i * n + j`. Rows close in z-value are close in EVERY clustered
    * dimension, so sorting by it gives multi-dimensional locality where
    * a single-column sort only localizes its first column.
    *
    * Pure shift/and/or `Column` expression — codegen'd, and safe under
    * Spark 4 ANSI mode (no arithmetic that can overflow). Inputs must
    * be non-negative integers that fit `bits` bits (pre-bucket
    * continuous values, e.g. `width_bucket` or a fixed quantization);
    * out-of-range values are CLAMPED into `[0, 2^bits - 1]` (an
    * unclamped low-bit extraction would wrap 2^bits back onto 0 and
    * scatter overflow rows across the bottom of the curve).
    * `bits * n` must stay ≤ 63. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n > 0 && bits > 0 && bits * n <= 63,
      s"bits*cols must fit a positive long, got $bits*$n")
    val top = (1L << bits) - 1L
    var acc: Column = lit(0L)
    for (i <- 0 until bits; (c, j) <- cols.zipWithIndex) {
      val clamped = greatest(lit(0L), least(c.cast("long"), lit(top)))
      acc = acc.bitwiseOR(shiftleft(
        shiftrightunsigned(clamped, i).bitwiseAND(lit(1L)), i * n + j))
    }
    acc
  }

  /** Hilbert-curve value of a 2-D point — the locality-better sibling
    * of [[zValue]]: consecutive curve positions are ALWAYS
    * grid-adjacent (|Δx|+|Δy| = 1, the curve's defining property —
    * Morton order jumps at power-of-two boundaries), so range-split
    * files cover tighter bounding boxes and 2-D range predicates
    * prune harder (the Iceberg/Databricks OPTIMIZE curve choice;
    * Hilbert 1891, the standard xy2d bit transform).
    *
    * Implemented as the native codegen'd
    * [[graft.expr.HilbertValue]] expression — the sequential
    * rotate-and-accumulate loop stays an actual loop inside generated
    * code. (An unrolled `when`-chain formulation grows the expression
    * tree ~5× per level with no subtree sharing and OOMs the driver
    * past ~8 levels — pinned in the expression's scaladoc.) Inputs
    * clamp into `[0, 2^bits - 1]` like [[zValue]]; `2*bits ≤ 62`. */
  def hilbertValue(xCol: Column, yCol: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.toColumn(graft.expr.HilbertValue(
      Bridge.toExpr(xCol.cast("long")), Bridge.toExpr(yCol.cast("long")), bits))
  }

  /** Write `df` globally clustered by the z-order of `clusterCols` into
    * `numFiles` range-partitioned files: `repartitionByRange` on the
    * z-value splits the curve into contiguous segments (one per file),
    * and the within-file sort orders each segment. Every file then
    * covers a small bounding box in all clustered dimensions — a
    * multi-dimensional range predicate prunes to the few files whose
    * box intersects it (row-group stats do the same within files).
    * The locality win over a single-column sort is asserted
    * quantitatively in `LayoutSpec`. */
  def writeClustered(
      df: DataFrame,
      dir: String,
      clusterCols: Seq[String],
      numFiles: Int,
      bits: Int = 16,
      mode: String = "overwrite"): Unit = {
    require(numFiles > 0)
    df.withColumn("__graft_z", zValue(clusterCols.map(col), bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode(mode).parquet(dir)
  }
}
