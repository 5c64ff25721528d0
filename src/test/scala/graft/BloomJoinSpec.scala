package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomJoin

/** [[graft.ops.BloomJoin.prefiltered]] — the explicit runtime-filter
  * join: result equality with the plain join, the probe filter
  * sitting BELOW the fact-side exchange (pruning before the shuffle),
  * and actual pruning under a selective dim. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed (not LocalRelation): ConvertToLocalRelation would
  // otherwise evaluate the probe filter at optimization time and the
  // plan-shape assertions would see no Filter node at all
  private lazy val (fact, dim) = {
    val root = java.nio.file.Files.createTempDirectory("graft-bloomjoin")
    (1L to 5000L).map(i => (i % 500, i)).toDF("k", "payload")
      .write.parquet(s"$root/fact")
    (0L until 500L).filter(_ % 10 == 0).map(k => (k, s"d$k")).toDF("dk", "tag")
      .write.parquet(s"$root/dim")
    (spark.read.parquet(s"$root/fact"), spark.read.parquet(s"$root/dim"))
  }

  test("prefiltered inner join equals the plain join; left_semi too") {
    val got = BloomJoin.prefiltered(fact, dim, "k", "dk", expectedItems = 1024)
      .select("k", "payload", "tag").as[(Long, Long, String)].collect().toSet
    val want = fact.join(dim, fact("k") === dim("dk")).drop(dim("dk"))
      .select("k", "payload", "tag").as[(Long, Long, String)].collect().toSet
    assert(got == want && want.nonEmpty)

    val semi = BloomJoin.prefiltered(fact, dim, "k", "dk",
        expectedItems = 1024, joinType = "left_semi")
      .as[(Long, Long)].collect().toSet
    val semiWant = fact.join(dim, fact("k") === dim("dk"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(semi == semiWant && semiWant.nonEmpty)
  }

  test("the probe prunes the fact side below the join, ~to the selectivity") {
    // a 10%-selective dim: the pre-filter alone must cut the fact scan
    // to ~10% (+fpp) before any join runs
    val sketch = dim.select(xxhash64(col("dk")).as("h"))
      .agg(graft.expr.BloomExpr.bloomAgg(col("h"), 1024, 0.001).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pruned = fact.filter(
      graft.expr.BloomExpr.bloomMightContain(sketch, xxhash64(col("k"))))
    val kept = pruned.count()
    assert(kept >= 500 && kept <= 700,
      s"10% of 5000 fact rows should survive the probe (±fpp), got $kept")

    // plan shape: the bloom probe is a Filter below the join, on the
    // fact side — pruning happens before the join boundary
    val plan = BloomJoin.prefiltered(fact, dim, "k", "dk", expectedItems = 1024)
      .queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("bloom_might_contain")
    val joinAt = plan.indexOf("HashJoin")
    assert(probeAt >= 0, s"no bloom probe in plan:\n$plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe filter must sit BELOW the join node (appear after it in the tree print):\n$plan")
  }
}
