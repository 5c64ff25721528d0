package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism repair for CPU-heavy derives over NARROW
  * scans.
  *
  * A CPU-dense per-row derive (hashed n-gram explosion, winnowing,
  * all-pairs scoring) runs at the SCAN's parallelism when nothing
  * shuffles below it — and scan parallelism tracks input BYTES, not
  * compute: a 0.6 MB parquet file is one split, so a derive burning 10
  * CPU-seconds serializes on one core of 32 (measured: `doc_langid`'s
  * whole body as a single 11 s task at sf0.1). At 100 TB the same scan
  * has thousands of splits and needs no help — so the repair must be
  * CONDITIONAL on the actual layout, never an unconditional
  * `repartition(n)` (which at scale would insert a pointless full
  * shuffle of the corpus).
  *
  * [[widen]] reads the plan's partition count off the driver (no job),
  * and only when it is below half the scheduler's slots inserts one
  * hash repartition on the caller's row key (deterministic placement —
  * retry-safe without the round-robin sort, guide §2.5). The shuffled
  * bytes are the NARROW pre-explosion rows, strictly less than what
  * the derive itself is about to shuffle.
  */
object ScanWidth {

  /** `df` repartitioned to the scheduler's width on `key` iff its
    * current plan would run on fewer than half the available slots. */
  def widen(df: DataFrame, key: Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val slots = sc.defaultParallelism
    val parts = df.rdd.getNumPartitions // planned driver-side, no job
    if (parts * 2 >= slots) df else df.repartition(slots, key)
  }
}
