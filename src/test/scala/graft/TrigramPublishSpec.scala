package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TextSearch
import graft.pipeline.{MergeTable, TrigramRefresh}

/** [[graft.pipeline.TrigramRefresh.publish]] — the read-optimized
  * standing deployment: the maintained index re-laid-out bucketed by
  * TRIGRAM, so a substring search's `tg IN (...)` filter bucket-prunes
  * the posting scan (`SelectedBucketsCount: k out of n` with k < n in
  * the physical plan) while returning exactly the contains-scan rows.
  * This is the plan evidence behind SCALE.md's "bucket-pruned scan of
  * |query| trigram partitions" claim for the standing substring index. */
class TrigramPublishSpec extends SparkSpec {
  import spark.implicits._

  test("published index bucket-prunes the posting scan and matches the contains scan") {
    val root = Files.createTempDirectory("graft-tg-pub")
    val (corpus, idx) = (s"$root/corpus", s"$root/idx")
    val docs = (1L to 400L).map { i =>
      val tail = if (i % 7 == 0) " needle in here" else " plain filler text"
      (i, s"document body number $i$tail")
    }.toDF("doc_id", "text")
    MergeTable.create(spark, corpus, docs, "doc_id", nBuckets = 4)
    TrigramRefresh.build(spark, corpus, idx, version = 1)

    val table = "graft_tg_pub_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      TrigramRefresh.publish(spark, idx, table, s"$root/pub", nBuckets = 16)
      val postings = spark.table(table)
      val search = TextSearch.substringSearch(
        MergeTable.read(spark, corpus), postings, "needle")

      // the pruned scan: only the buckets holding the pattern's trigram
      // posting lists are read (≤ |distinct trigrams| = 4 of 16 here)
      val plan = search.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in plan:\n$plan"))
      assert(sel.group(2).toInt == 16, plan)
      assert(sel.group(1).toInt <= 4,
        s"expected <= 4 selected buckets for a 4-trigram pattern, " +
          s"got ${sel.group(1)}:\n$plan")

      // and pruning loses nothing: search ≡ contains scan
      val got = search.as[Long].collect().toSet
      val want = docs.filter(col("text").contains("needle"))
        .select("doc_id").as[Long].collect().toSet
      assert(got == want && want.nonEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft_tg_pub_spec")
  }
}
