package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DateType, DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native as-of join (backward and forward) — the whole-operator Catalyst extension
  * tier: a custom [[AsOfJoinPlan logical node]], a
  * [[AsOfJoinStrategy planner strategy]] and a
  * [[AsOfJoinExec physical operator]], registered per-session via
  * `experimental.extraStrategies` (the [[AsOfJoin.join]] API installs
  * it) or cluster-wide via `graft.GraftExtensions`
  * (`injectPlannerStrategy`).
  *
  * Semantics (the pandas `merge_asof` / QuestDB/kdb `ASOF JOIN` /
  * DuckDB `ASOF JOIN` contract): for each left row, attach the single
  * right row with equal keys and the greatest right-ts <= left-ts
  * (backward, the default), the smallest right-ts >= left-ts
  * (forward), or whichever of the two has the smaller gap with ties
  * to backward (nearest — integer-backed ts types only); optionally
  * bounded by a `tolerance` on the ts gap. Rows
  * with a null key or null timestamp never match (SQL join-key
  * semantics). `leftOuter` keeps unmatched left rows null-extended;
  * inner drops them.
  *
  * Why an exec node instead of composition: the composable encodings —
  * union + `last(...) ignoreNulls over (partition by key order by ts)`
  * fill-down (q16's single-table shape), or an inequality join +
  * per-left-row max — either buffer whole key groups in a window
  * operator or materialize the full inequality pair space before
  * pruning it back down. The native operator is ONE streaming merge
  * pass over the two key-clustered, (key, ts)-sorted children: O(1)
  * state per partition (the single retained candidate row), no pair
  * blow-up, no window buffers, and the plan is exactly two exchanges +
  * two sorts — the same shape (and the same EnsureRequirements
  * machinery) as a sort-merge equi-join of the two sides, which is the
  * 100 TB floor for any keyed join of two large relations. Spark added
  * the same operator shape for pandas-on-Spark (`merge_asof`); this is
  * the engine-native equivalent with tolerance and both join types.
  *
  * Scale note: distribution is `ClusteredDistribution` on the keys for
  * both children, so AQE coalesces both sides into the same coalesce
  * group and the zip below always sees co-partitioned inputs. Column
  * pruning does not cross an unknown node — project each side down to
  * the needed columns BEFORE the join (the registered query does; the
  * spec pins the scan schemas).
  *
  * Reference behavior: `scripts/docx_etl.py:120-205` pairs captions to
  * the nearest preceding asset — the as-of shape this operator
  * generalizes to two relations.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    leftOuter: Boolean,
    tolerance: Option[Long],
    direction: String) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Stateless — one shared
  * instance serves every session. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.leftOuter,
        p.tolerance, p.direction, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Single-pass merging as-of join. Children are hash-clustered on the
  * join keys and sorted by (keys, ts) ascending — EnsureRequirements
  * inserts the exchanges/sorts exactly as it does for a sort-merge
  * join — then each co-partition pair is merged with one forward scan
  * of each side holding ONE candidate right row:
  *
  *  - advance the right side while (rKey, rTs) <=_lex (lKey, lTs),
  *    remembering the last same-key row passed (nulls sort first, so
  *    null-ts rows are passed before any real candidate and never
  *    retained);
  *  - the retained row IS the as-of match (greatest rTs <= lTs), by
  *    the sort order;
  *  - left rows sorted by ts within a key make the advance monotone —
  *    each right row is visited once per partition.
  *
  * Memory per partition: one buffered right row + one retained
  * candidate (copied — exchange rows are reused buffers). No spill
  * path is needed: state does not grow with key-group size, unlike the
  * window encoding.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    leftOuter: Boolean,
    tolerance: Option[Long],
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge emits left rows in their incoming order — downstream
  // sorts on (leftKeys, leftTs) are elided
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** ts as a Long for the tolerance bound — construction (the
    * [[AsOfJoin.join]] API) rejects tolerance on non-integer-backed
    * timestamp types. */
  private def tsLong(row: InternalRow, t: DataType): Long = t match {
    case TimestampType | TimestampNTZType | LongType => row.getLong(0)
    case DateType | IntegerType => row.getInt(0).toLong
    case other => throw new IllegalStateException(s"tolerance unsupported for ts type $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val numOutputRows = longMetric("numOutputRows")
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTsExpr = leftTs; val rTsExpr = rightTs
    val outAttrs = output
    val isOuter = leftOuter
    val tol = tolerance
    val isFwd = direction == "forward"
    val isNear = direction == "nearest"
    // nearest needs the numeric ts gap of BOTH candidates even without
    // a tolerance — the API restricts it to integer-backed ts types
    val needTsLong = tol.isDefined || isNear

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      // bind against the NULLABLE view of the right side on outer joins:
      // the null-extended row must be read through null-checking
      // references even when the child attrs are non-nullable
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOutput ++ (if (isOuter) rightOutput.map(_.withNullability(true)) else rightOutput))
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // the single retained candidate: last right row passed whose key
      // equals the current left key and whose ts was non-null (copies —
      // upstream rows are reused buffers)
      var m: InternalRow = null
      var mKey: InternalRow = null
      var mTsLong: Long = 0L

      // hand-rolled drive loop: one virtual call per OUTPUT row instead
      // of a flatMap closure + Iterator allocation per INPUT row — the
      // merge is the exec's entire interior, so constant factors here
      // are the operator's throughput
      def matchRow(lRow: InternalRow): InternalRow = {
        val lKey = lKeyProj(lRow)
        val lTsRow = lTsProj(lRow)
        if (lKey.anyNull || lTsRow.isNullAt(0)) {
          // null key/ts never matches; left rows sort nulls-first so no
          // right rows need consuming here
          if (isOuter) { numOutputRows += 1; resultProj(joined(lRow, nullRight)) }
          else null
        } else {
          val lTsVal = lTsRow.get(0, tsType)
          val lTsLong = if (needTsLong) tsLong(lTsRow, tsType) else 0L
          if (isFwd) {
            // FORWARD: drop right rows strictly behind (key, ts); the
            // head — if same-key with a real ts — IS the match (smallest
            // rTs >= lTs by the sort order). The head is NOT consumed:
            // later left rows of this key may match it again.
            var done = false
            while (!done && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val rTsRow = rTsProj(rRow)
              val kc = keyOrd.compare(rKey, lKey)
              val rTsNull = rTsRow.isNullAt(0)
              if (kc < 0 || (kc == 0 && (rTsNull || rKey.anyNull ||
                  tsOrd.lt(rTsRow.get(0, tsType), lTsVal)))) rBuf.next()
              else done = true
            }
            var emitMatch = false
            if (rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val rTsRow = rTsProj(rRow)
              emitMatch = keyOrd.compare(rKey, lKey) == 0 && !rKey.anyNull &&
                !rTsRow.isNullAt(0) &&
                (tol.isEmpty || tsLong(rTsRow, tsType) - lTsLong <= tol.get)
            }
            if (emitMatch) { numOutputRows += 1; resultProj(joined(lRow, rBuf.head)) }
            else if (isOuter) { numOutputRows += 1; resultProj(joined(lRow, nullRight)) }
            else null
          } else {
          if (m != null && keyOrd.compare(mKey, lKey) != 0) { m = null; mKey = null }
          var done = false
          while (!done && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val rTsRow = rTsProj(rRow)
            val kc = keyOrd.compare(rKey, lKey)
            val rTsNull = rTsRow.isNullAt(0)
            if (kc < 0 || (kc == 0 && (rTsNull || tsOrd.lteq(rTsRow.get(0, tsType), lTsVal)))) {
              rBuf.next()
              if (kc == 0 && !rKey.anyNull && !rTsNull) {
                m = rRow.copy(); mKey = rKey.copy()
                if (needTsLong) mTsLong = tsLong(rTsRow, tsType)
              } else if (kc != 0) {
                // passed into/through an earlier key group: stale candidate
                m = null; mKey = null
              } // kc == 0 with null key/ts: sorted before any real
                // candidate of this group — retain current m (null)
            } else done = true
          }
          val backOk = m != null && (tol.isEmpty || lTsLong - mTsLong <= tol.get)
          // NEAREST: the unconsumed head after the backward advance is
          // exactly the forward candidate (first same-key row with
          // rTs > lTs, or an rTs == lTs tie already retained as m);
          // pick the smaller gap, ties to backward (the earlier row)
          var fwdRow: InternalRow = null
          var fwdGap = 0L
          if (isNear && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val rTsRow = rTsProj(rRow)
            if (keyOrd.compare(rKey, lKey) == 0 && !rKey.anyNull && !rTsRow.isNullAt(0)) {
              val g = tsLong(rTsRow, tsType) - lTsLong
              if (tol.isEmpty || g <= tol.get) { fwdRow = rRow; fwdGap = g }
            }
          }
          val chosen: InternalRow =
            if (isNear && backOk && fwdRow != null) {
              if (lTsLong - mTsLong <= fwdGap) m else fwdRow
            } else if (backOk) m
            else if (isNear) fwdRow
            else null
          if (chosen != null) { numOutputRows += 1; resultProj(joined(lRow, chosen)) }
          else if (isOuter) { numOutputRows += 1; resultProj(joined(lRow, nullRight)) }
          else null
          }
        }
      }

      new Iterator[InternalRow] {
        private var out: InternalRow = null
        private def advance(): Unit = {
          while (out == null && lIter.hasNext) out = matchRow(lIter.next())
        }
        def hasNext: Boolean = { if (out == null) advance(); out != null }
        def next(): InternalRow = {
          if (out == null) advance()
          val r = out; out = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API. `join` installs [[AsOfJoinStrategy]] on the
  * session (idempotently) and builds the logical node from the two
  * analyzed child plans, so it works on any session; sessions built
  * with `spark.sql.extensions=graft.GraftExtensions` carry the
  * strategy from construction.
  */
object AsOfJoin {

  /** Idempotently add the planner strategy to the session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** Backward as-of join of `left` with `right` on equal `on` columns
    * and the greatest `rightTsCol` <= `leftTsCol`, optionally within
    * `tolerance` (in the timestamp type's native units — microseconds
    * for timestamps, days for dates).
    *
    * Output = all left columns ++ right columns minus the right key
    * columns (their values equal the left keys when matched and are
    * null otherwise — carrying them only creates duplicate names).
    * Right non-key columns that collide with left names should be
    * renamed before the call. `joinType`: `inner` or `left`/
    * `left_outer`.
    *
    * The two sides must be independent plans (e.g. two separate reads):
    * a self-reference carries duplicate attribute ids, which only the
    * analyzer's join-specific dedup rules can repair — rejected here
    * rather than silently mis-bound.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      joinType: String = "inner",
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    install(left.sparkSession)
    buildPlan(left, right, on, leftTsCol, rightTsCol, joinType, tolerance, direction)
  }

  /** Node construction without the strategy install — the path a
    * `spark.sql.extensions=graft.GraftExtensions` session uses, where
    * the strategy is already injected (GraftExtensionsSpec pins it). */
  private[graft] def buildPlan(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      joinType: String,
      tolerance: Option[Long],
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    val dir = direction.toLowerCase match {
      case d @ ("backward" | "forward" | "nearest") => d
      case other => throw new IllegalArgumentException(
        s"as-of direction must be backward, forward or nearest, got $other")
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join sides share attribute ids (self-join of one lineage); " +
        "re-read or re-derive one side so the plans are independent")
    require(on.nonEmpty, "as-of join needs at least one equality key")
    val leftOuter = joinType.toLowerCase match {
      case "inner" => false
      case "left" | "left_outer" | "leftouter" => true
      case other => throw new IllegalArgumentException(
        s"as-of join type must be inner or left_outer, got $other")
    }
    def attr(plan: LogicalPlan, name: String, side: String): Attribute = {
      val hits = plan.output.filter(_.name.equalsIgnoreCase(name))
      require(hits.size == 1,
        s"$side column $name resolves to ${hits.size} attributes of ${plan.output.map(_.name)}")
      hits.head
    }
    val lKeys = on.map(attr(lPlan, _, "left"))
    val rKeys = on.map(attr(rPlan, _, "right"))
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(DataTypeUtils.sameType(l.dataType, r.dataType),
        s"key type mismatch: ${l.name}: ${l.dataType} vs ${r.name}: ${r.dataType}") }
    require(RowOrdering.isOrderable(lKeys), s"key types not orderable: ${lKeys.map(_.dataType)}")
    val lTs = attr(lPlan, leftTsCol, "left")
    val rTs = attr(rPlan, rightTsCol, "right")
    require(DataTypeUtils.sameType(lTs.dataType, rTs.dataType),
      s"ts type mismatch: ${lTs.dataType} vs ${rTs.dataType}")
    require(RowOrdering.isOrderable(lTs.dataType), s"ts type not orderable: ${lTs.dataType}")
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be >= 0, got $t")
      require(Seq(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)
        .exists(t => DataTypeUtils.sameType(t, lTs.dataType)),
        s"tolerance needs an integer-backed ts type, got ${lTs.dataType}")
    }
    if (dir == "nearest")
      require(Seq(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)
        .exists(t => DataTypeUtils.sameType(t, lTs.dataType)),
        s"nearest direction needs an integer-backed ts type, got ${lTs.dataType}")
    val node = AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTs, rTs, leftOuter, tolerance, dir)
    val rKeyIds = rKeys.map(_.exprId).toSet
    val keep = node.output.filterNot(a => rKeyIds.contains(a.exprId))
    Bridge.ofRows(spark, Project(keep, node))
  }
}
