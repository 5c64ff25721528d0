package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime re-planning evidence: the 100 TB story relies on AQE
  * splitting skewed shuffle partitions, coalescing tiny ones, and
  * (Spark 3.3+) injecting runtime bloom filters from a selective dim
  * into the fact scan. These tests drive each mechanism on this
  * engine's plan shapes with thresholds scaled down to test data, and
  * assert the *final adaptive plan* — not config — shows the
  * mechanism engaged. SkewJoinSpec covers the planner-independent
  * salting fallback; this suite covers the adaptive path that handles
  * the same shapes without code changes on a real cluster.
  */
class AdaptiveExecSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with SQL confs set, restoring prior values after. */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 90% of fact rows hit one hot key, with a payload wide enough
      // that the hot key's shuffle partition trips the (scaled-down)
      // skew threshold — the same shape SkewJoin.salted handles.
      val pad = "x" * 96
      val fact = (1 to 40000).map { i =>
        (i.toLong, if (i % 10 < 9) 7L else (i % 100).toLong, pad)
      }.toDF("row_id", "k", "payload")
      val dim = (0L until 100L).map(k => (k, s"v$k")).toDF("dk", "dv")
      val joined = fact.join(dim, col("k") === col("dk"))
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"),
        s"final adaptive plan must mark the skewed join split:\n$plan")
      assert(joined.count() == 40000)
    }
  }

  test("AQE coalesces undersized post-shuffle partitions at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB") {
      // a tiny grouped aggregate: 4 configured shuffle partitions hold
      // a few KB — AQE should read them back as one coalesced partition
      val agg = (1 to 10000).map(i => (i % 50, i.toLong)).toDF("g", "v")
        .groupBy("g").agg(sum("v").as("s"))
      val plan = finalPlan(agg)
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"final adaptive plan must coalesce the tiny shuffle:\n$plan")
    }
  }

  test("runtime bloom filter from a selective dim prunes the fact scan") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // selective predicate on orders (creation side) → bloom filter
      // evaluated against lineitem's scan output (application side),
      // so non-matching fact rows die before the join shuffle.
      val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val orders = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"optimized plan must apply a runtime bloom filter to the fact side:\n$plan")
      assert(joined.count() > 0)
    }
  }
}
