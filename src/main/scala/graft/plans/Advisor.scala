package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan ADVISOR — the 100 TB lint: walks a query's physical plan and
  * flags the shapes that are tolerable at test scale and fatal at
  * cluster scale, each with the concrete fix. The checks encode this
  * repo's own plan discipline (PLANS.md / SCALE.md) as executable
  * review:
  *
  *  - `cartesian`     — CartesianProduct / non-trivial
  *                      BroadcastNestedLoopJoin: O(n·m) pairs. Fix:
  *                      add an equi/range key, or broadcast a
  *                      provably tiny side deliberately.
  *  - `broadcastable` — a shuffle join (SMJ/SHJ) whose build side the
  *                      optimizer ESTIMATES under the broadcast
  *                      threshold: two exchanges + sorts where one
  *                      broadcast would do. Fix: `broadcast(dim)` or
  *                      fix the stats that blinded the optimizer.
  *  - `udf`           — a ScalaUDF in the plan: codegen fence and
  *                      per-row boxing on the hot path. Fix: native
  *                      `functions._` / a codegen Expression.
  *  - `global_window` — a Window with NO partition keys: every row
  *                      through ONE task, the canonical scale cliff.
  *                      Fix: partition the window, or re-express as
  *                      an aggregation.
  *  - `unpushed_scan` — a file scan carrying data filters of which
  *                      NONE reached the reader as pushed filters:
  *                      the scan decodes rows the filter then drops.
  *                      Fix: filter on plain columns (not wrapped in
  *                      expressions), or cast the literal, not the
  *                      column.
  *  - `meta_scan`     — a COUNT/MIN/MAX over a `graft` relation whose
  *                      shape [[GraftMetaAggregate]] answers from the
  *                      zone sidecar, still present (un-collapsed) in
  *                      the optimized plan: the session is missing the
  *                      extension injection, or the metadata pass
  *                      declined — either way a query that should cost
  *                      O(files) is paying a scan. Fix: register
  *                      [[graft.GraftExtensions]] / `Graft
  *                      .registerAll`; if injected, check the sidecar
  *                      (pending ledger on every bucket? zone-less
  *                      files?).
  *  - `topk_scan`     — a Limit(/Sort) over a WHOLE `graft` relation
  *                      [[GraftTopK]] would file-prune, still unpruned
  *                      in the optimized plan: missing injection, or
  *                      the zones had nothing to exclude. Same fix as
  *                      `meta_scan`.
  *  - `codegen_gap`   — (info) fraction of codegen-eligible operators
  *                      actually inside WholeStageCodegen spans.
  *  - `shuffles`      — (info) exchange count: each is a full
  *                      materialization boundary at scale.
  *
  * Heuristics over ESTIMATES, deliberately: the advisor reads the
  * same statistics the optimizer did, so its suggestions are exactly
  * the interventions (hints, stats fixes) available to the user. It
  * never rewrites anything — `AdvisorSpec` pins that every advisory
  * fires on a crafted offender and stays silent on the clean twin. */
object Advisor {

  final case class Advisory(level: String, rule: String, node: String, message: String)

  // ---- runtime advisories --------------------------------------------
  // Some smells are visible only WHILE library code runs, not in a
  // returned DataFrame's plan — the IVM refresh family executes its
  // exchanges as a side effect inside a refresh call, so a per-plan
  // advise() never sees them. Those checks record here (bounded ring,
  // newest last) and log, so a spec — or an operator's REPL — can ask
  // "what did the engine notice while that ran".
  private val runtime = new java.util.ArrayDeque[Advisory]()

  private[graft] def record(a: Advisory): Unit = synchronized {
    runtime.addLast(a)
    while (runtime.size > 64) { runtime.removeFirst(); () }
  }

  /** The most recent runtime advisories (newest last, ≤ 64 kept). */
  def recentRuntime: Seq[Advisory] = synchronized {
    import scala.jdk.CollectionConverters._
    runtime.iterator().asScala.toSeq
  }

  /** Clear the runtime ring (test isolation). */
  private[graft] def clearRuntime(): Unit = synchronized { runtime.clear() }

  /** `wide_refresh` (round-17 verdict ask #5): a maintained-view
    * refresh about to run its exchanges at a session width ≥ 10× what
    * the transition's metadata row bound deserves — the smell every
    * refresher that skips [[graft.ops.SizedSession]] exhibits (~1,000
    * near-empty tasks per micro-commit at session width; millions on a
    * 2,000-partition production session). Called from
    * [[graft.pipeline.MergeTable.rowDeltas]] — the refresh family's
    * standard delta feed — so a future refresher cannot silently plan
    * wide. Metadata-only (manifest + sidecar row bound); silent when
    * the bound is unknown. */
  private[graft] def lintRefreshWidth(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      fromVersion: Int, toVersion: Int): Unit =
    scala.util.Try {
      graft.pipeline.MergeTable
        .changedRowsBound(spark, dir, fromVersion, toVersion)
        .foreach { rows =>
          val sized = graft.ops.SizedSession.widthFor(
            spark, rows, graft.ops.SizedSession.RefreshRowsPerPartition)
          val session = spark.conf
            .getOption("spark.sql.shuffle.partitions").map(_.toInt)
            .getOrElse(spark.sparkContext.defaultParallelism)
          if (session >= 10 * math.max(sized, 1))
            record(Advisory("info", "wide_refresh", s"rowDeltas($dir)",
              s"refresh v$fromVersion->v$toVersion bounds at ~$rows rows " +
                s"(sized width $sized) but the executing session plans " +
                s"$session shuffle partitions — wrap the refresh in " +
                "SizedSession.forDelta so task counts scale with the " +
                "delta, not the session"))
        }
    }.getOrElse(())

  /** Advisories for `df`'s physical plan, severity-ordered
    * (warn before info). */
  def advise(df: Dataset[_]): Seq[Advisory] = {
    val plan = df.queryExecution.executedPlan
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val all = collect(plan)
    val warns = Seq.newBuilder[Advisory]
    val infos = Seq.newBuilder[Advisory]

    all.foreach {
      case p: CartesianProductExec =>
        warns += Advisory("warn", "cartesian", p.nodeName,
          "cartesian product: O(n*m) pairs — add an equi/range join key " +
            "or broadcast a provably tiny side")
      case p: BroadcastNestedLoopJoinExec
          // a deliberately broadcast-tiny cross join (the 1-row
          // constants pattern) is fine; flag once the build side's
          // ESTIMATE stops being trivial
          if buildEstimate(p).forall(_ > 1024) =>
        warns += Advisory("warn", "cartesian", p.nodeName,
          (if (p.condition.isEmpty) "broadcast cross join"
           else "nested-loop join with a non-equi condition") +
            ": every probe row scans the whole build side — add an " +
            "equi key or a banded range key, or keep the broadcast " +
            "side provably tiny")
      case p: SortMergeJoinExec =>
        smallSide(p, threshold).foreach { bytes =>
          warns += Advisory("warn", "broadcastable", p.nodeName,
            s"sort-merge join with a ~$bytes-byte side (under the " +
              s"$threshold-byte broadcast threshold): two shuffles + " +
              "sorts where one broadcast would do — hint broadcast() " +
              "or fix the blinding stats")
        }
      case p: ShuffledHashJoinExec =>
        smallSide(p, threshold).foreach { bytes =>
          warns += Advisory("warn", "broadcastable", p.nodeName,
            s"shuffled hash join with a ~$bytes-byte side: broadcast it " +
              "and skip both exchanges")
        }
      case p: WindowExec if p.partitionSpec.isEmpty =>
        warns += Advisory("warn", "global_window", p.nodeName,
          "window with no PARTITION BY: the whole input sorts through " +
            "ONE task — partition the window or re-express as an " +
            "aggregation")
      case s: FileSourceScanExec =>
        // IsNotNull pushes are derived constraints, not the user's
        // predicate — a scan whose ONLY pushes are IsNotNull while it
        // carries a real data filter decodes rows just to drop them
        val nontrivial = s.dataFilters.exists(f =>
          !f.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
        val pushedReal = s.metadata.getOrElse("PushedFilters", "")
          .replaceAll("IsNotNull\\([^)]*\\)", "").exists(_.isLetter)
        if (nontrivial && !pushedReal)
          warns += Advisory("warn", "unpushed_scan", s.nodeName,
            "the scan's real predicate did not push to the reader " +
              "(only derived IsNotNull did): every row decodes only to " +
              "be dropped — filter on bare columns (no wrapping " +
              "expression) so the source can push")
      case _ => ()
    }

    all.foreach { p =>
      if (p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])))
        warns += Advisory("warn", "udf", p.nodeName,
          "ScalaUDF on the hot path: codegen fence + per-row " +
            "(de)serialization — prefer functions._ or a codegen " +
            "Expression")
    }

    // meta_scan: a metadata-answerable graft aggregate that did NOT
    // collapse — the OPTIMIZED logical plan still carries the
    // Aggregate-over-GraftRelation shape GraftMetaAggregate rewrites
    // away (round-14 verdict ask #7: catch a future regression that
    // silently reverts the pushdown to a scan)
    df.queryExecution.optimizedPlan.foreach {
      case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if GraftMetaAggregate.answerableShape(agg) =>
        warns += Advisory("warn", "meta_scan", agg.nodeName,
          "metadata-answerable COUNT/MIN/MAX over a graft table still " +
            "scans: register graft.GraftExtensions (Graft.registerAll) " +
            "so GraftMetaAggregate folds it from the zone sidecar; if " +
            "already injected, the sidecar had nothing to decide " +
            "(ledger on every bucket? zone-less files?)")
      // topk_scan: a Limit(/Sort) over a WHOLE graft relation that
      // GraftTopK would prune, still unpruned in the optimized plan
      // (round 15 — teeth against a silent revert of the top-k/limit
      // file pruning, the meta_scan precedent)
      case lim: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit
          if GraftTopK.prunableShape(lim) =>
        warns += Advisory("warn", "topk_scan", lim.nodeName,
          "ORDER BY+LIMIT (or bare LIMIT) over a graft table scans " +
            "every file: register graft.GraftExtensions " +
            "(Graft.registerAll) so GraftTopK folds the zones against " +
            "the k-th bound; if already injected, the zones had " +
            "nothing to exclude (unclustered sort column? tiny table?)")
      case _ => ()
    }

    val exchanges = all.count(_.isInstanceOf[Exchange])
    if (exchanges > 0)
      infos += Advisory("info", "shuffles", "plan",
        s"$exchanges exchange(s): each is a full materialization " +
          "boundary — check keys line up so partitionings are reused")
    // a codegen SPAN ends at InputAdapter — nodes below it run
    // interpreted (or in their own span)
    def span(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: org.apache.spark.sql.execution.InputAdapter => Seq.empty
      case o => o +: o.children.flatMap(span)
    }
    val inCodegen = all.collect {
      case w: WholeStageCodegenExec => span(w.child).size }.sum
    val eligible = all.count(p =>
      !p.isInstanceOf[WholeStageCodegenExec] &&
        !p.isInstanceOf[org.apache.spark.sql.execution.InputAdapter])
    if (eligible > 0)
      infos += Advisory("info", "codegen_gap", "plan",
        s"$inCodegen of $eligible operators inside WholeStageCodegen " +
          "spans")

    warns.result().distinct ++ infos.result()
  }

  /** Render advisories as a DataFrame (for notebooks / SQL users). */
  def adviseDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = advise(df).map(a => Row(a.level, a.rule, a.node, a.message))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("level", StringType, nullable = false),
        StructField("rule", StringType, nullable = false),
        StructField("node", StringType, nullable = false),
        StructField("message", StringType, nullable = false))))
  }

  /** Every operator, descending through AQE wrappers and codegen
    * spans (subqueries excluded — they advise separately). */
  private def collect(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)
      case other => Seq(other) ++ other.children.flatMap(collect)
    }
    self
  }

  /** The smaller join side's estimated bytes when it is under
    * `threshold` (and the threshold is enabled) — read from the
    * LOGICAL join the physical node links back to, i.e. the
    * optimizer's own numbers. */
  private def smallSide(join: SparkPlan, threshold: Long): Option[BigInt] = {
    if (threshold <= 0) None
    else join.logicalLink.flatMap {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.left.stats.sizeInBytes, j.right.stats.sizeInBytes)
          .filter(_ <= threshold).minOption
      case _ => None
    }
  }

  /** The build side's estimated bytes for a nested-loop join. */
  private def buildEstimate(p: BroadcastNestedLoopJoinExec): Option[BigInt] =
    p.logicalLink.map {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.left.stats.sizeInBytes.min(j.right.stats.sizeInBytes)
      case other => other.stats.sizeInBytes
    }

}
