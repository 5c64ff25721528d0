package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, StructField}

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
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    def nd(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    // Sum over decimal(38,6) INPUTS stays decimal(38,6) — zero headroom,
    // so a petabyte-scale profile's mean could overflow (null non-ANSI,
    // throw ANSI). decimal(28,6) inputs widen to a decimal(38,6) sum:
    // 10 decimal digits of headroom, i.e. exact for ≥ 10^10 rows even at
    // max-magnitude BIGINT values (9.2e18 < 10^22 fits decimal(28,6)).
    // Doubles beyond 1e22 would overflow the input cast — out of scope
    // for a corpus profile and loud under ANSI rather than silent.
    def meanOf(c: Column): Column =
      round(sum(c.cast("decimal(28,6)")).cast("double") / count(c), 6)
    // (col, metric, agg) triples; aliases below are synthetic (m0, m1,
    // …) so column names containing quotes/backticks/separators can't
    // corrupt the unpivot mapping
    val metrics: Seq[(String, String, Column)] = cols.toSeq.flatMap { f =>
      // backtick-quote the reference (doubling literal backticks), so
      // names containing dots/backticks resolve as one attribute
      val c = col("`" + f.name.replace("`", "``") + "`")
      val base = Seq(
        (f.name, "count", count(c).cast("double")),
        (f.name, "nulls", sum(when(c.isNull, 1L).otherwise(0L)).cast("double"))) ++
        // map columns are not comparable: no distinct-count for them
        (f.dataType match {
          case _: org.apache.spark.sql.types.MapType => Nil
          case _ => Seq((f.name, "n_distinct", nd(c).cast("double")))
        })
      f.dataType match {
        case _: NumericType => base ++ Seq(
          (f.name, "min", min(c).cast("double")),
          (f.name, "max", max(c).cast("double")),
          (f.name, "mean", meanOf(c)))
        case StringType => base ++ Seq(
          (f.name, "min_len", min(length(c)).cast("double")),
          (f.name, "max_len", max(length(c)).cast("double")),
          (f.name, "avg_len", meanOf(length(c))))
        case _ => base
      }
    }
    val aggs = metrics.zipWithIndex.map { case ((_, _, a), i) => a.as(s"m$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row: stack(n, 'col', 'metric', value, ...)
    def q(s: String): String = s"'${s.replace("'", "''")}'"
    val pieces = metrics.zipWithIndex.map { case ((c, m, _), i) =>
      s"${q(c)}, ${q(m)}, m$i"
    }
    wide.select(expr(
      s"stack(${metrics.length}, ${pieces.mkString(", ")}) AS (col_name, metric, value)"))
  }

  // ----- incremental decomposition ([[graft.pipeline.BucketedView]]) -----
  //
  // Every profile metric EXCEPT exact n_distinct is algebraic over
  // bucket cells: counts/nulls/decimal sums re-SUM, min/max re-fold,
  // and the mean stays bit-equal because the global decimal sum is the
  // exact sum of exact per-bucket decimal sums divided by the summed
  // count — the same one IEEE division. Exact distincts are the one
  // non-decomposable metric (the card's dup-ledger approach would cost
  // a cell row per distinct value PER COLUMN); the maintained profile
  // simply omits them, which is also Delta's choice for its column
  // stats. Cell aliases encode (metric kind)__(column), so the cell
  // frame is self-describing and a reader needs no schema side-channel.

  private def quoted(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Per-bucket partials for every [[profile]] metric except
    * n_distinct. Profiled column names must not contain `__` (the
    * alias separator). */
  def cellPartials(fields: Seq[StructField]): Seq[Column] =
    fields.flatMap { f =>
      require(!f.name.contains("__"),
        s"profiled column name may not contain '__': ${f.name}")
      val c = quoted(f.name)
      val base = Seq(
        count(c).as(s"cnt__${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nul__${f.name}"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          min(c).as(s"mn__${f.name}"),
          max(c).as(s"mx__${f.name}"),
          sum(c.cast("decimal(28,6)")).as(s"sm__${f.name}"))
        case StringType => base ++ Seq(
          min(length(c)).as(s"lmn__${f.name}"),
          max(length(c)).as(s"lmx__${f.name}"),
          sum(length(c).cast("decimal(28,6)")).as(s"lsm__${f.name}"))
        case _ => base
      }
    }

  /** The profile (minus n_distinct) from maintained cells — same long
    * `(col_name, metric, value)` shape and arithmetic as [[profile]],
    * so maintained ≡ from-scratch holds bit-for-bit on the shared
    * metrics. One aggregation over cell state, never over data. */
  def profileFromCells(cells: DataFrame): DataFrame = {
    val colNames = cells.columns.toSeq
      .filter(_.startsWith("cnt__")).map(_.stripPrefix("cnt__"))
    require(colNames.nonEmpty, "no profile cells found")
    val has = cells.columns.toSet
    def a(prefix: String, c: String): Column = col(s"${prefix}__$c")
    val metrics: Seq[(String, String, Column)] = colNames.flatMap { c =>
      // coalesce: an empty cell frame (empty table) must read 0, not NULL
      val base = Seq(
        (c, "count", coalesce(sum(a("cnt", c)), lit(0L)).cast("double")),
        (c, "nulls", coalesce(sum(a("nul", c)), lit(0L)).cast("double")))
      val num =
        if (!has(s"mn__$c")) Nil
        else Seq(
          (c, "min", min(a("mn", c)).cast("double")),
          (c, "max", max(a("mx", c)).cast("double")),
          (c, "mean",
            round(sum(a("sm", c)).cast("double") / sum(a("cnt", c)), 6)))
      val str =
        if (!has(s"lmn__$c")) Nil
        else Seq(
          (c, "min_len", min(a("lmn", c)).cast("double")),
          (c, "max_len", max(a("lmx", c)).cast("double")),
          (c, "avg_len",
            round(sum(a("lsm", c)).cast("double") / sum(a("cnt", c)), 6)))
      base ++ num ++ str
    }
    val aggs = metrics.zipWithIndex.map { case ((_, _, e), i) => e.as(s"m$i") }
    val wide = cells.agg(aggs.head, aggs.tail: _*)
    def q(s: String): String = s"'${s.replace("'", "''")}'"
    val pieces = metrics.zipWithIndex.map { case ((c, m, _), i) =>
      s"${q(c)}, ${q(m)}, m$i"
    }
    wide.select(expr(
      s"stack(${metrics.length}, ${pieces.mkString(", ")}) AS (col_name, metric, value)"))
  }

  /** Keyed TABLE DIFF — the audit between two states of a table (a
    * corpus before/after a pipeline run, yesterday's feed vs today's):
    * per-key row status plus per-column change attribution, reduced to
    * one long summary frame `(metric, n)` with metric ∈ `added` (key
    * only in `b`) | `removed` (only in `a`) | `changed` (present in
    * both, some compared column differs) | `unchanged` |
    * `changed:<col>` (rows where that column differs — a row changed
    * in two columns counts once per column).
    *
    * ONE full-outer join on the key + ONE map-side-combined
    * aggregation; only (key, compared columns) ride the shuffle, and
    * the result is a constant ~(4 + #cols) rows regardless of table
    * size. Column comparison is null-safe (`NULL → NULL` is
    * unchanged, `NULL → value` is a change); keys compare null-safely
    * too, so a NULL-keyed row diffs against the other side's
    * NULL-keyed row instead of vanishing. `keyCol` must be unique per
    * side (the MergeTable contract) — duplicate keys would cross-match
    * in the full-outer join and overcount. `compareCols` defaults to
    * the shared non-key columns. */
  def diff(
      a: DataFrame, b: DataFrame, keyCol: String,
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else a.columns.toSeq.intersect(b.columns.toSeq).filterNot(_ == keyCol)
    require(cols.nonEmpty, "no shared columns to compare")
    // explicit presence flags: a NULL key joins null-safely, so key
    // nullness cannot stand in for side presence
    val l = a.select(lit(true).as("__l_present") +:
      (keyCol +: cols).map(c => col(c).as(s"__l_$c")): _*)
    val r = b.select(lit(true).as("__r_present") +:
      (keyCol +: cols).map(c => col(c).as(s"__r_$c")): _*)
    val j = l.join(r, col(s"__l_$keyCol") <=> col(s"__r_$keyCol"), "full_outer")
    val inL = col("__l_present").isNotNull
    val inR = col("__r_present").isNotNull
    val colChanged: Seq[Column] =
      cols.map(c => !(col(s"__l_$c") <=> col(s"__r_$c")))
    val anyChanged = colChanged.reduce(_ || _)
    // coalesce: sum() is NULL over an empty (both-sides-empty) diff —
    // every status count must read 0, not NULL
    def n(pred: Column): Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
    val aggs: Seq[(String, Column)] =
      Seq(
        "added" -> n(!inL && inR),
        "removed" -> n(inL && !inR),
        "changed" -> n(inL && inR && anyChanged),
        "unchanged" -> n(inL && inR && !anyChanged)) ++
        cols.zip(colChanged).map { case (c, ch) =>
          s"changed:$c" -> n(inL && inR && ch)
        }
    val wide = j.agg(aggs.head._2.as("m0"),
      aggs.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"m${i + 1}") }: _*)
    def q(s: String): String = s"'${s.replace("'", "''")}'"
    val pieces = aggs.zipWithIndex.map { case ((m, _), i) => s"${q(m)}, m$i" }
    wide.select(expr(
      s"stack(${aggs.length}, ${pieces.mkString(", ")}) AS (metric, n)"))
  }
}
