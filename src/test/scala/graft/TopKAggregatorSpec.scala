package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.expr.TopKAggregator

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed grouped top-k equals the window row_number formulation") {
    val orders = Tables.orders(spark, sf0001)

    // aggregator path: top-3 orders by totalprice per status
    val agg = orders
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, k, p) => (k, p) }
      .agg(new TopKAggregator(3).toColumn)
      .collect()
      .map { case (status, top) => status -> top.items.map(_.id) }
      .toMap

    // window oracle — explicit final sort: collect() order after a
    // filter is not guaranteed, and groupBy preserves encounter order
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy("o_orderstatus", "rn")
      .select("o_orderstatus", "o_orderkey").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    assert(agg.keySet == win.keySet)
    agg.foreach { case (status, ids) => assert(ids == win(status), s"status $status") }
  }

  test("buffer never exceeds k and ties break on id") {
    val data = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 1.0)).toDS()
    val top = data.groupByKey(_ => "all")
      .agg(new TopKAggregator(2).toColumn)
      .collect().head._2
    assert(top.items == Seq(
      TopKAggregator.Scored(1L, 5.0), TopKAggregator.Scored(2L, 5.0)))
  }
}
