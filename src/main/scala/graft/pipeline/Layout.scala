package graft.pipeline

import org.apache.spark.sql.DataFrame
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
    val spread = pmod(
      if (sortCols.nonEmpty) hash(sortCols.map(col): _*)
      else hash(monotonically_increasing_id()),
      lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ spread: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(mode)
      .parquet(dir)
  }
}
