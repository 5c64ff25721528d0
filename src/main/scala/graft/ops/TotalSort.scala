package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Total ordering for REPORT-SIZED results without the hidden double
  * computation of a bare `orderBy`.
  *
  * `orderBy` plans a range-partitioned global sort, and a
  * RangePartitioner needs bounds: Spark first runs a SAMPLING job over
  * the sort's child, then the sort's shuffle map job runs the child
  * AGAIN — nothing caches between the two. When the child is an
  * expensive subtree with no exchange of its own directly below the
  * sort (a broadcast-joined all-pairs scorer, a winnowing scan, a UDF
  * derive), the whole computation runs twice per execution. Measured at
  * sf0.1: `emb_neardup_exact` ran its 3 s all-pairs join in two
  * back-to-back jobs; `doc_dup_passages` its winnow+group subtree as a
  * 5.8 s sample job then a 10.1 s sort job.
  *
  * For a result a human (or the DuckDB oracle) reads — tens to a few
  * thousand rows — range-partitioning the OUTPUT is pointless: this
  * helper computes the child ONCE at its natural parallelism, gathers
  * the small result through one round-robin exchange into a single
  * partition, and sorts locally. Row set and total order are identical
  * to `orderBy` (every caller's sort key is total — oracle hash
  * comparison already requires that).
  *
  * NOT for large results: a single-partition sort of a big frame
  * serializes. The rule of thumb is the same as `collect()`'s — if the
  * result couldn't be a report, keep the distributed sort. */
object TotalSort {

  def small(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  def small(df: DataFrame, col1: String, colRest: String*): DataFrame =
    small(df, (col1 +: colRest).map(df.col): _*)
}
