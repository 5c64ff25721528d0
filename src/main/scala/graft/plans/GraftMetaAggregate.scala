package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

import graft.pipeline.MergeTable
import graft.sources.GraftRelation

/** Connector AGGREGATE PUSHDOWN for `graft` tables — the Delta/Iceberg
  * count-from-stats fast path surfaced to plain SQL: an ungrouped,
  * unfiltered `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` over
  * a [[GraftRelation]] collapses to a [[LocalRelation]] holding the
  * answer from [[MergeTable.metaAggregate]] — per-file row counts and
  * null counts sum exactly, per-file numeric min/max fold exactly, so
  * the rewritten plan scans ZERO data files (the zone sidecar is
  * O(files) driver metadata). At 100 TB this turns the most common
  * audit queries (`SELECT COUNT(*) FROM corpus`) from a full-corpus
  * pass into a manifest read.
  *
  * Strictly exactness-preserving, rewrite-or-leave: the rule fires only
  * when EVERY aggregate is one of the four shapes (no DISTINCT, no
  * FILTER clause, bare column children), the child is the relation
  * itself (possibly through a column-pruning Project — never a Filter),
  * and the metadata answer is computable. [[MergeTable.metaAggregate]]
  * refuses pending merge-on-read ledgers, non-numeric columns and
  * zone-less files — any refusal (or any unexpected failure) leaves the
  * original plan to run as a normal scan, so the rewrite can change
  * cost, never results. The answer comes from the relation's OWN
  * resolved version (pinned at relation construction), so a concurrent
  * commit cannot move the table under the query.
  */
object GraftMetaAggregate extends Rule[LogicalPlan] {

  /** The graft relation under `plan`, if `plan` is exactly the relation
    * or a pure column-pruning Project over it. */
  private def graftChild(plan: LogicalPlan): Option[GraftRelation] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case g: GraftRelation => Some(g)
      case _ => None
    }
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      graftChild(child)
    case _ => None
  }

  private sealed trait MetaAgg
  private case object RowCount extends MetaAgg
  private final case class NonNull(col: String) extends MetaAgg
  private final case class MinOf(col: String, dt: DataType) extends MetaAgg
  private final case class MaxOf(col: String, dt: DataType) extends MetaAgg

  /** The metadata shape of one aggregate expression, if it has one. */
  private def metaOf(e: Expression): Option[MetaAgg] = e match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        // COUNT(*) parses as Count(1): all-foldable non-null children
        case c: Count if c.children.forall(ch =>
            ch.foldable && ch.eval() != null) => Some(RowCount)
        case c: Count => c.children match {
          case Seq(a: AttributeReference) => Some(NonNull(a.name))
          case _ => None
        }
        case m: Min => m.child match {
          case a: AttributeReference => Some(MinOf(a.name, a.dataType))
          case _ => None
        }
        case m: Max => m.child match {
          case a: AttributeReference => Some(MaxOf(a.name, a.dataType))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  /** Zone min/max strings are exact plain-decimal renderings of the
    * column's values; converting back is exact for every type a zone
    * can carry (`toXExact` throws on any surprise — caught, no
    * rewrite). Float/Double round-trip exactly because their toString
    * is shortest-round-trip and BigDecimal parses it exactly. */
  private def internal(dt: DataType, s: String): Any =
    if (s == null) null
    else dt match {
      case LongType => BigDecimal(s).toLongExact
      case IntegerType => BigDecimal(s).toIntExact
      case ShortType => BigDecimal(s).toShortExact
      case ByteType => BigDecimal(s).toByteExact
      case DoubleType => BigDecimal(s).toDouble
      case FloatType => BigDecimal(s).toFloat
      case other => throw new IllegalArgumentException(
        s"no exact metadata rendering for $other")
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        graftChild(agg.child).isDefined =>
      val rel = graftChild(agg.child).get
      val metas = agg.aggregateExpressions.map {
        case Alias(e, _) => metaOf(e)
        case _ => None
      }
      if (metas.exists(_.isEmpty)) agg
      else Try {
        val spark = SparkSession.active
        val shapes = metas.flatten
        val cols = shapes.collect {
          case NonNull(c) => c
          case MinOf(c, _) => c
          case MaxOf(c, _) => c
        }.distinct
        // column → (n_rows, n_nonnull, min_v, max_v); one metadata pass
        val stats: Map[String, (Long, Long, String, String)] =
          if (cols.isEmpty) Map.empty
          else MergeTable.metaAggregate(spark, rel.dir, cols, rel.v)
            .collect().map(r => r.getString(0) ->
              (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
            .toMap
        lazy val nRows: Long = stats.headOption.map(_._2._1)
          .getOrElse(MergeTable.metaRowCount(spark, rel.dir, rel.v))
        val values = shapes.map {
          case RowCount => nRows
          case NonNull(c) => stats(c)._2
          case MinOf(c, dt) => internal(dt, stats(c)._3)
          case MaxOf(c, dt) => internal(dt, stats(c)._4)
        }
        LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))
          : LogicalPlan
      }.getOrElse(agg)
  }
}
