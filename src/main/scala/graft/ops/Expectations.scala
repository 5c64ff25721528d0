package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS — the constraint layer every
  * lakehouse ingest runs before data is allowed downstream (Delta
  * CHECK constraints, DLT expectations, Great-Expectations suites):
  * not-null, range, regex, set-membership, uniqueness and referential
  * integrity declared as data, evaluated into one violations report,
  * enforced as a loud gate, or split into valid/quarantine streams.
  *
  * Shape at scale: every ROW rule and every UNIQUE rule folds into ONE
  * map-side-combined aggregation over ONE scan (the [[Profile]]
  * discipline — checking a petabyte table costs one pass, not one per
  * rule); each FOREIGN-KEY rule adds one anti-join against its
  * (distinct, usually broadcast) dimension keys. The report is a
  * constant #rules rows.
  *
  * NULL semantics: a NULL violates every row rule except an explicit
  * `Check` that says otherwise — a NULL in a range/regex/set column is
  * a data-quality defect, not a pass (SQL's CHECK-constraint
  * "unknown passes" rule is the one thing downstream consumers never
  * expect). FK keys with NULLs cannot match and count as violations. */
object Expectations {

  sealed trait Rule { def name: String }

  /** Row-local rule: `holds` per row; violations = rows where it does
    * not hold (NULL result counts as a violation). */
  sealed trait RowRule extends Rule { def holds: Column }

  final case class NotNull(column: String) extends RowRule {
    val name = s"not_null:$column"
    def holds: Column = col(column).isNotNull
  }

  final case class InRange(column: String, lo: Any, hi: Any) extends RowRule {
    val name = s"in_range:$column"
    def holds: Column = col(column) >= lit(lo) && col(column) <= lit(hi)
  }

  final case class Matches(column: String, regex: String) extends RowRule {
    val name = s"matches:$column"
    def holds: Column = col(column).rlike(regex)
  }

  final case class OneOf(column: String, values: Seq[Any]) extends RowRule {
    val name = s"one_of:$column"
    def holds: Column = col(column).isin(values: _*)
  }

  /** Escape hatch: any boolean Column. NULL still violates. */
  final case class Check(name: String, predicate: Column) extends RowRule {
    def holds: Column = predicate
  }

  /** Uniqueness over a column combination: violations = surplus rows
    * beyond one per distinct combination (`count(*) −
    * count_distinct(struct(cols))` — 0 iff the combination is a key). */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Referential integrity: every `columns` combination must exist in
    * `dimColumns` of `dim`. Violations = rows with no match (NULL keys
    * cannot match and count). The dim side reduces to its distinct
    * keys — broadcast-sized for real dimensions. */
  final case class ForeignKey(
      columns: Seq[String], dim: DataFrame, dimColumns: Seq[String]) extends Rule {
    require(columns.nonEmpty && columns.length == dimColumns.length)
    val name = s"fk:${columns.mkString(",")}"
  }

  private def violated(r: RowRule): Column =
    when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)

  /** The violations report: one `(rule, violations)` row per rule, in
    * declaration order. Row + unique rules share one aggregation over
    * one scan; each FK rule appends one anti-join count. Declaration
    * order rides a literal index through the stack — no rank join. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules declared")
    require(rules.map(_.name).distinct.length == rules.length,
      "duplicate rule names — name Check rules uniquely")
    val ord: Map[String, Int] = rules.map(_.name).zipWithIndex.toMap
    // coalesce: sum() is NULL (not 0) over an empty table — an empty
    // input has zero violations, and the report must say so
    val inline: Seq[(String, Column)] = rules.collect {
      case r: RowRule => r.name -> coalesce(sum(violated(r)), lit(0L))
      case u: Unique => u.name ->
        (count(lit(1L)) - count_distinct(struct(u.columns.map(col): _*)))
    }
    val inlineReport: Option[DataFrame] =
      if (inline.isEmpty) None
      else {
        val wide = df.agg(
          inline.head._2.as("m0"),
          inline.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"m${i + 1}") }: _*)
        def q(s: String): String = s"'${s.replace("'", "''")}'"
        val pieces = inline.zipWithIndex.map {
          case ((n, _), i) => s"${q(n)}, ${ord(n)}, m$i"
        }
        Some(wide.select(expr(
          s"stack(${inline.length}, ${pieces.mkString(", ")}) " +
            "AS (rule, __ord, violations)")))
      }
    val fkReports: Seq[DataFrame] = rules.collect { case fk: ForeignKey =>
      val dimKeys = fk.dim
        .select(fk.dimColumns.zip(fk.columns).map { case (d, c) => col(d).as(c) }: _*)
        .distinct()
      df.select(fk.columns.map(col): _*)
        .join(dimKeys, fk.columns, "left_anti")
        .agg(count(lit(1L)).as("violations"))
        .select(lit(fk.name).as("rule"), lit(ord(fk.name)).as("__ord"),
          col("violations"))
    }
    (inlineReport.toSeq ++ fkReports).reduce(_.unionAll(_))
      .orderBy("__ord").drop("__ord")
  }

  /** Enforce: returns `df` untouched when every rule holds; throws an
    * [[IllegalStateException]] naming every violated rule and its
    * count otherwise — the fail-the-pipeline gate. */
  def gate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val bad = report(df, rules)
      .filter(col("violations") > 0)
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
    if (bad.nonEmpty) throw new IllegalStateException(
      s"expectations violated: ${bad.mkString(", ")}")
    df
  }

  /** Split into (valid, quarantined) on the ROW rules: quarantined
    * rows carry a `violated` array naming each failed rule — the DLT
    * expect-or-quarantine pattern. Aggregate rules (Unique/FK) are
    * not row-attributable and belong in [[report]]/[[gate]]. */
  def quarantine(
      df: DataFrame, rules: Seq[RowRule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "no row rules declared")
    val names = array_compact(array(rules.map(r =>
      when(coalesce(r.holds, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name))): _*))
    val tagged = df.withColumn("violated", names)
    (tagged.filter(size(col("violated")) === 0).drop("violated"),
      tagged.filter(size(col("violated")) > 0))
  }
}
