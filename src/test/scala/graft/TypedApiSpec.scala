package graft

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.model._

/** Typed Dataset surface over the same tables, plus bucketed-table
  * co-located joins (the pre-partitioning scale technique from
  * SCALE.md). */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("tables load as typed Datasets with compile-checked fields") {
    val li: Dataset[Lineitem] = Tables.lineitem(spark, sf0001).as[Lineitem]
    val orders: Dataset[Order] = Tables.orders(spark, sf0001).as[Order]
    val docs: Dataset[Doc] = Tables.documents(spark, sf0001).as[Doc]

    val byFlag = li.groupByKey(_.l_returnflag)
      .mapValues(_.l_quantity)
      .reduceGroups(_ + _)
      .collect().toMap
    assert(byFlag.keySet == Set("A", "N", "R"))
    assert(byFlag.values.forall(_ > 0))

    val bigOrders = orders.filter(_.o_totalprice > 400000).map(_.o_orderkey)
    assert(bigOrders.count() >= 0) // compiles typed; count sanity below
    assert(docs.map(_.n_chars).collect().forall(_ > 0))
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — use the session default and drop
    // the tables afterwards. The in-memory catalog forgets tables across
    // JVMs but leaves their directories, so clear those too.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    graft.pipeline.Layout.writeBucketed(
      Tables.orders(spark, sf0001), "b_orders", "o_orderkey", buckets = 4)
    graft.pipeline.Layout.writeBucketed(
      Tables.lineitem(spark, sf0001), "b_lineitem", "l_orderkey", buckets = 4)

    // the sf0.001 tables are broadcast-sized; turn broadcasting off so
    // the join actually exercises the bucket co-partitioning
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    joined.collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side — bucket layout is the
    // co-partitioning (the groupBy after it may still exchange)
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"))
    val exchangesBelowJoin = joinSection.split("\n")
      .count(l => l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey")))
    assert(exchangesBelowJoin == 0,
      s"bucketed join must not re-shuffle on the join key:\n$plan")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
