package graft

/** Scale-regression guard: builds the physical plan of EVERY registered
  * query and asserts the properties that must survive a 100× scale-up —
  * no cartesian/nested-loop join sneaks in outside the documented
  * tiny-side cases, and the flagship scan keeps its pushdown. A new
  * query that accidentally plans an all-pairs join fails here before it
  * ever reaches the driver.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plans legitimately join against a TINY unpartitioned
    * side (broadcast nested-loop / cartesian of ≤25 rows or single-row
    * aggregates) — each documented at its query site. */
  private val tinySideJoins = Set(
    "q15_range_join",        // 4-row band dimension, broadcast
    "q19_fuzzy_levenshtein", // 25-name broadcast dim, all-pairs by intent
    "dedup_simhash",         // single-row broadcast threshold params
    "emb_neardup_exact",     // documented all-pairs oracle-verification twin
    "q28_bag_set_ops",       // crossJoin of three single-row aggregates
    "doc_bm25_top10",        // single-row (N, avgdl) corpus-stats broadcast
    "doc_hybrid_rrf_top10",  // same single-row stats broadcast via bm25
    "doc_trigram_lm",        // single-row smoothing-vocab V broadcast
    "table_drift")           // single-row (ta, tb) totals broadcast
  // doc_dsir_sample is deliberately NOT exempt: its smoothing constant
  // folds into a projection literal, so any cartesian/BNLJ appearing in
  // its plan is a regression this guard must catch

  test("no unplanned cartesian or nested-loop join in any registered query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad && !tinySideJoins(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"unexpected cartesian/BNLJ in: $offenders")
  }

  test("the flagship scan keeps filter pushdown and column pruning") {
    val q01 = SparkEntry.queries("q01_filter_scan")(spark, sf0001)
    val formatted = q01.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("l_quantity"), "filter must reach the scan")
    assert(formatted.contains("ReadSchema"))
    // 5 projected columns of the 16-column lineitem reach ReadSchema
    val read = formatted.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.count(_ == ',') <= 5, s"over-wide scan: $read")
  }

  test("top-k queries plan as TakeOrderedAndProject (no global sort)") {
    Seq("q09_topk", "knn_top5", "knn_norm_top5").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), s"$name: $plan")
    }
  }
}
