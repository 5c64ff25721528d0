package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join — the 100 TB design bullet made
  * concrete: two fact tables written bucketed+sorted by the join key
  * join WITHOUT a shuffle exchange on either side (SortMergeJoin reads
  * bucket-aligned files directly). At cluster scale this is the
  * difference between an O(data) network shuffle per join and zero —
  * the reason the survey's layout guidance says to bucket standing
  * fact tables on their dominant join key at write time. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joins on bucketed tables plan without a shuffle and match the plain join") {
    // managed tables land in the session's default warehouse
    // (spark-warehouse/, gitignored) and are dropped in finally —
    // warehouse.dir is a static conf the shared session can't change
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")

    val orders = (1L to 2000L).map(i => (i, s"status${i % 5}")).toDF("o_id", "status")
    val items = (1L to 6000L).map(i => (i, i % 2000 + 1, (i % 97).toDouble))
      .toDF("item_id", "o_id", "amount")

    orders.write.bucketBy(8, "o_id").sortBy("o_id").saveAsTable("b_orders")
    items.write.bucketBy(8, "o_id").sortBy("o_id").saveAsTable("b_items")

    val joined = spark.table("b_items").join(spark.table("b_orders"), "o_id")
      .groupBy("status").agg(count(lit(1)).as("n"),
        sum(col("amount").cast("decimal(18,2)")).cast("double").as("amt"))

    // disable broadcast so the join shape under test is sort-merge
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = spark.table("b_items").join(spark.table("b_orders"), "o_id")
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucket-aligned join must not shuffle either side:\n$plan")

      // and the result is the plain (shuffled) join's result
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val want = items.join(orders, "o_id")
        .groupBy("status").agg(count(lit(1)).as("n"),
          sum(col("amount").cast("decimal(18,2)")).cast("double").as("amt"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
