package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass table profiling — the "what is in this table" report every
  * 100 TB ingest starts with: per-column null counts, exact distincts,
  * numeric min/max/mean, string length stats.
  *
  * All metrics for all columns ride ONE aggregation over ONE scan (a
  * single global agg row, map-side combined), then unpivot to the long
  * `(col_name, metric, value)` shape with `stack` — profiling a
  * petabyte table costs one pass, not one pass per column. Means are
  * computed as a single IEEE division of a decimal-exact sum by the
  * count, so the report is identical on every engine and partitioning
  * (a plain double `avg` is neither: partial-sum order changes the
  * last bits, and decimal `avg` rounding rules differ across engines).
  *
  * Exact `count(DISTINCT)` for several columns in one agg expands to
  * `expand`-based multi-aggregation (one shuffle per distinct column)
  * — acceptable for a report; swap in `approx_count_distinct` via
  * `exact = false` for the sketch-only single-shuffle variant at
  * extreme widths (loses the cross-engine oracle).
  */
object Profile {

  /** Long-format profile of `df`: numeric columns report
    * `count/nulls/n_distinct/min/max/mean`, string columns
    * `count/nulls/n_distinct/min_len/max_len/avg_len`. Other types
    * report `count/nulls/n_distinct`. Output: `(col_name, metric,
    * value)` with `value` DOUBLE (means rounded to 6). */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.schema.fields
    def nd(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    def meanOf(c: Column): Column =
      round(sum(c.cast("decimal(38,6)")).cast("double") / count(c), 6)
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).cast("double").as(s"${f.name}||count"),
        sum(when(c.isNull, 1L).otherwise(0L)).cast("double").as(s"${f.name}||nulls"),
        nd(c).cast("double").as(s"${f.name}||n_distinct"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          min(c).cast("double").as(s"${f.name}||min"),
          max(c).cast("double").as(s"${f.name}||max"),
          meanOf(c).as(s"${f.name}||mean"))
        case StringType => base ++ Seq(
          min(length(c)).cast("double").as(s"${f.name}||min_len"),
          max(length(c)).cast("double").as(s"${f.name}||max_len"),
          meanOf(length(c)).as(s"${f.name}||avg_len"))
        case _ => base
      }
    }.toSeq
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row: stack(n, 'col', 'metric', value, ...)
    val pieces = wide.columns.map { name =>
      val Array(c, m) = name.split("\\|\\|", 2)
      s"'${c.replace("'", "''")}', '${m.replace("'", "''")}', `$name`"
    }
    wide.select(expr(
      s"stack(${wide.columns.length}, ${pieces.mkString(", ")}) AS (col_name, metric, value)"))
  }
}
