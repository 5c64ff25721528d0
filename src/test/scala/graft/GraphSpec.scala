package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** [[Graph.pageRank]] — the distributed fixed-point iteration must agree
  * node-for-node with an in-memory reference implementation of the same
  * integer recurrence, be invariant to partitioning, conserve rank mass
  * up to floor losses, ignore duplicate/self edges, and rank a hub above
  * its spokes.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: the identical BIGINT recurrence over a Scala
    * Map — every div is Long division, as in the operator and oracle. */
  private def refPageRank(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val clean = edges.filter { case (s, d) => s != d }
    val nodes = (clean.map(_._1) ++ clean.map(_._2)).toSeq.sorted
    val n = nodes.size.toLong
    val deg = clean.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = 15L * Graph.Scale / (100L * n)
    var r = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(deg.contains).map(r).sum / n
      val inflow = clean.groupBy(_._2).map { case (t, es) =>
        t -> es.toSeq.map { case (s, _) => r(s) / deg(s) }.sum }
      r = nodes.map(v => v -> (base + 85L * (inflow.getOrElse(v, 0L) + dang) / 100L)).toMap
    }
    r
  }

  // a 20-node graph with hubs, chains, and two dangling sinks (18, 19)
  private val testEdges: Set[(Long, Long)] =
    (0L until 17L).flatMap { i =>
      Seq(i -> ((i * 7 + 3) % 20), i -> ((i * 11 + 5) % 20), i -> 0L)
    }.toSet.filter { case (s, d) => s != d }

  private def toDf(es: Set[(Long, Long)]): DataFrame =
    es.toSeq.sorted.toDF("src", "dst")

  private def run(df: DataFrame, iters: Int = 6): Map[Long, Long] =
    Graph.pageRank(df, iters).as[(Long, Long)].collect().toMap

  test("matches the in-memory integer reference node-for-node") {
    val got = run(toDf(testEdges))
    val want = refPageRank(testEdges, 6)
    assert(got == want)
  }

  test("invariant to input partitioning") {
    val base = run(toDf(testEdges))
    val repart = run(toDf(testEdges).repartition(7))
    assert(base == repart)
  }

  test("duplicate edges and self-loops do not change the result") {
    val noisy = toDf(testEdges)
      .union(toDf(testEdges).limit(5))        // duplicates
      .union(Seq((3L, 3L), (0L, 0L)).toDF("src", "dst")) // self-loops
    assert(run(noisy) == run(toDf(testEdges)))
  }

  test("rank mass is conserved up to floor losses") {
    val got = run(toDf(testEdges))
    val total = got.values.sum
    // each div floors away < 1 unit per term; with ~50 edges and 20
    // nodes over 6 iterations the loss is far below 1% of the mass
    assert(total <= Graph.Scale && total > (Graph.Scale * 0.99).toLong,
      s"total=$total")
  }

  test("a hub every node links to outranks all spokes") {
    val got = run(toDf(testEdges))
    val hub = got(0L)
    assert(got.collect { case (k, v) if k != 0L => v }.forall(_ < hub))
  }

  test("dangling sinks still hold rank and redistribute it") {
    val got = run(toDf(testEdges))
    val want = refPageRank(testEdges, 6)
    // sinks 18/19 exist in the output with the reference's exact value
    assert(got.contains(18L) && got(18L) == want(18L) && got(18L) > 0L)
  }
}
