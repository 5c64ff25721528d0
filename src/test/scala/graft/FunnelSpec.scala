package graft

import org.apache.spark.sql.functions._

import graft.ops.Funnel

/** [[Funnel]] — greedy earliest-chain semantics, deadline handling,
  * broken chains, and cohort retention, pinned on hand-computed
  * fixtures (the DuckDB oracles q35/q36 re-prove both on real data).
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000L // 1s in µs

  test("greedy chain: earliest step-1, then earliest strictly-after occurrences") {
    val ev = Seq(
      // user 1 completes all three, with decoys: a click BEFORE the first
      // view must not count; the SECOND click is the valid one
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 20L, "click"),
      (1L, 15L, "purchase"), (1L, 30L, "purchase"),
      // user 2: view only
      (2L, 10L, "view"),
      // user 3: never views — excluded entirely
      (3L, 10L, "click"), (3L, 20L, "purchase"))
      .map { case (u, t, e) => (u, t * M, e) }.toDF("user_id", "us", "event_type")
    val got = Funnel.funnelSteps(ev, "user_id", "us", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toSeq
    assert(got == Seq(
      (1L, 10L * M, Some(20L * M), Some(30L * M), 3),
      (2L, 10L * M, None, None, 1)))
  }

  test("deadline: steps landing after t1 + within don't count") {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 100L, "purchase"),
      (2L, 0L, "view"), (2L, 99L, "click"))
      .map { case (u, t, e) => (u, t * M, e) }.toDF("user_id", "us", "event_type")
    val got = Funnel.funnelSteps(ev, "user_id", "us", "event_type",
        Seq("view", "click", "purchase"), withinUs = Some(50L * M))
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, Some(5L * M), None, 2), // purchase at 100s > 50s deadline
      (2L, 0L, None, None, 1))) // click at 99s > deadline
  }

  test("same-timestamp events do not satisfy 'strictly after'") {
    val ev = Seq((1L, 10L, "view"), (1L, 10L, "click"))
      .map { case (u, t, e) => (u, t * M, e) }.toDF("user_id", "us", "event_type")
    val got = Funnel.funnelSteps(ev, "user_id", "us", "event_type",
        Seq("view", "click"))
      .as[(Long, Long, Option[Long], Int)].collect().toSeq
    assert(got == Seq((1L, 10L * M, None, 1)))
  }

  test("retention: cohorts by first-event week, distinct users per offset") {
    val W = 7L * 86400L * M
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), // cohort 0, active weeks 0,1,3
      (2L, 0L), (2L, 0L),           // cohort 0, active week 0 (dup collapses)
      (3L, 1L), (3L, 2L))           // cohort 1, active weeks 1,2
      .map { case (u, w) => (u, w * W + 12345L) }.toDF("user_id", "us")
    val got = Funnel.retentionCohorts(ev, "user_id", "us")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}
