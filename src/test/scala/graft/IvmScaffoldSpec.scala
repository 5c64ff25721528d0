package graft

/** [[graft.queries.IvmScaffold]] — the session-shared IVM scaffolding
  * must make query re-execution IDEMPOTENT: Bench runs every query
  * best-of-N in one JVM, so the second execution of an IVM query hits
  * the memoized corpus (and, for postings/fingerprints, re-merges the
  * same delta batch into the shared standing table). Re-running each
  * registered IVM query must return row-identical results — if a
  * repeated refresh ever compounded state, the bench's later runs
  * would silently measure a corrupted table.
  */
class IvmScaffoldSpec extends SparkSpec {

  private val ivmQueries = Seq(
    "doc_incremental_stats", "doc_distinct_incremental",
    "doc_minmax_incremental", "doc_quantile_incremental",
    "doc_postings_incremental", "doc_fingerprints_incremental",
    // mutates the shared standing IVF index per execution — the
    // anti-join-then-reinsert refresh must re-converge on re-run
    "knn_ivf_incremental")

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).toSeq

  for (name <- ivmQueries)
    test(s"$name returns identical rows on re-execution") {
      val first = rows(name)
      val second = rows(name)
      assert(first.nonEmpty, s"$name must produce rows")
      assert(second == first,
        s"$name diverged on re-execution: ${first.size} vs ${second.size} rows")
    }
}
