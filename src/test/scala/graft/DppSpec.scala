package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the 100 TB star-join behavior made
  * concrete: a fact table written `partitionBy(key)` joined against a
  * FILTERED dimension reads only the partitions the dimension's
  * surviving keys name (the filter's effect reaches the fact scan at
  * RUNTIME via an injected subquery). Without DPP a 1000-partition
  * fact pays a full scan for every selective dimension filter. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("a filtered dim prunes the partitioned fact scan at runtime; result matches") {
    val root = Files.createTempDirectory("graft-dpp").toString
    val fact = (1L to 20000L).map(i => (i, (i % 20).toInt, (i % 97).toDouble))
      .toDF("row_id", "part_key", "amount")
    fact.write.partitionBy("part_key").parquet(s"$root/fact")
    val dim = (0 until 20).map(k => (k, if (k < 3) "keep" else "drop"))
      .toDF("part_key", "tag")
    dim.write.parquet(s"$root/dim")

    val f = spark.read.parquet(s"$root/fact")
    val d = spark.read.parquet(s"$root/dim").filter(col("tag") === "keep")
    val joined = f.join(d, "part_key")

    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.contains("dynamicpruning"),
      s"fact scan must carry a runtime pruning subquery:\n$planned")

    val got = joined.agg(count(lit(1)), sum(col("amount").cast("decimal(18,2)")))
      .as[(Long, java.math.BigDecimal)].head()
    val want = fact.join(dim.filter(col("tag") === "keep"), "part_key")
      .agg(count(lit(1)), sum(col("amount").cast("decimal(18,2)")))
      .as[(Long, java.math.BigDecimal)].head()
    assert(got == want, s"pruned result must equal unpruned: $got vs $want")
    assert(got._1 == 3000L, s"3 of 20 partitions survive: $got")
  }
}
