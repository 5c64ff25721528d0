package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel and cohort-retention analytics over event streams — the two
  * canonical product-analytics reductions, built as plain aggregation/
  * join chains so Catalyst sees ordinary shuffles it can plan, reuse
  * and AQE-coalesce.
  *
  * **Funnel** (`steps`): for each user, the greedy earliest completion
  * chain — `t1 = min ts of step 1`, `t_{i+1} = min ts of step i+1
  * strictly after t_i` — with an optional overall deadline
  * `t_k − t1 ≤ withinUs`. One aggregation per step, each a narrow
  * `(user, min)` shuffle on the SAME key, so the chain is k map-side-
  * combined aggs + (k−1) user-keyed joins of tiny per-user rows — not
  * a per-user sort or a collect of event arrays (a user's whole
  * history never materializes anywhere). k is the funnel length
  * (3–5), fixed at plan time.
  *
  * **Retention** (`retentionCohorts`): users grouped into cohorts by
  * the epoch-week of their first event; for each (cohort, week-offset)
  * the count of distinct users active then. Two aggregations and one
  * broadcast-size join on `user`.
  *
  * Both are exactly SQL-expressible, so both carry full DuckDB oracles
  * (q35/q36). Reference behavior: the reference's event reporting
  * surface; formulated Spark-first.
  */
object Funnel {

  /** Per-user greedy funnel completion times.
    *
    * Output: `(userCol, t1 … tk BIGINT NULLABLE, steps_completed INT)`
    * where `t_i` is the epoch-µs of the earliest valid completion of
    * step i (null once the chain breaks), and completion respects the
    * optional deadline: steps whose `t_i − t1 > withinUs` don't count.
    * Only users who completed step 1 appear.
    */
  def funnelSteps(
      events: DataFrame,
      userCol: String,
      usCol: String,
      typeCol: String,
      steps: Seq[String],
      withinUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val u = col(userCol)
    // t1: earliest occurrence of the first step
    var chain = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(usCol)).as("t1"))
    steps.zipWithIndex.tail.foreach { case (step, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      // earliest occurrence of this step strictly after the previous one
      // (and inside the deadline when one is set)
      val nexts = events.filter(col(typeCol) === step)
        .select(u, col(usCol).as(cur))
      val deadline = withinUs match {
        case Some(w) => chain("t1") + w >= nexts(cur)
        case None => lit(true)
      }
      chain = chain.join(nexts,
          chain(userCol) === nexts(userCol) &&
            nexts(cur) > chain(prev) && deadline,
          "left")
        .select((chain(userCol) +: (1 to i).map(j => chain(s"t$j"))) :+ nexts(cur): _*)
        .groupBy(userCol, (1 to i).map(j => s"t$j"): _*)
        .agg(min(col(cur)).as(cur))
    }
    val ts = (1 to steps.size).map(j => col(s"t$j"))
    chain.withColumn("steps_completed",
      ts.map(t => when(t.isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** Weekly cohort retention: `(cohort_week, week_offset, n_users)` —
    * cohort = epoch-week of the user's first event; a user counts at
    * every offset they were active. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      usCol: String): DataFrame = {
    val WeekUs = 7L * 86400L * 1000000L
    // integer division (not FP /) — exact at any epoch magnitude
    val week = expr(s"$usCol div $WeekUs")
    val firsts = events.groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    val active = events.select(col(userCol), week.as("week")).distinct()
    active.join(firsts, userCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
