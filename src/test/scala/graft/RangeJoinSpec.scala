package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** [[RangeJoin]] — binned range joins must be RESULT-IDENTICAL to the
  * naive theta-join formulation (the oracle twin) for every bin width,
  * and must plan as a hash join, not a nested-loop product.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixtures (no Math.random in tests either)
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private lazy val points: DataFrame = lcg(7)
    .take(400)
    .zipWithIndex
    .map { case (h, i) => (i.toLong, ((h >>> 11).toDouble / (1L << 53).toDouble) * 200.0 - 50.0) }
    .toSeq
    .toDF("pid", "v")

  private lazy val intervals: DataFrame = lcg(13)
    .grouped(2)
    .take(60)
    .zipWithIndex
    .map { case (Seq(a, b), i) =>
      val lo = ((a >>> 11).toDouble / (1L << 53).toDouble) * 180.0 - 50.0
      val len = ((b >>> 11).toDouble / (1L << 53).toDouble) * 25.0
      (i.toLong, lo, lo + len)
    }
    .toSeq
    .toDF("iid", "lo", "hi")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  private lazy val naivePoint: Set[(Long, Long)] = pairs(
    points.join(intervals, $"v" >= $"lo" && $"v" < $"hi"))

  test("binnedPointJoin == naive theta join for small, typical and huge widths") {
    for (w <- Seq(0.37, 5.0, 1000.0)) {
      val got = pairs(RangeJoin.binnedPointJoin(points, "v", intervals, "lo", "hi", w))
      assert(got == naivePoint, s"width $w")
    }
    assert(naivePoint.nonEmpty, "fixture must actually produce matches")
  }

  test("half-open boundary semantics: lo included, hi excluded, hi on a bin edge") {
    val p = Seq((1L, 10.0), (2L, 20.0), (3L, 19.999999)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi") // hi == 2 bins of width 10
    val got = pairs(RangeJoin.binnedPointJoin(p, "v", iv, "lo", "hi", 10.0))
    assert(got == Set((1L, 1L), (3L, 1L)))
  }

  test("degenerate intervals (empty, inverted) and negative values match nothing extra") {
    val p = Seq((1L, -3.0), (2L, 0.0)).toDF("pid", "v")
    val iv = Seq((1L, -5.0, -1.0), (2L, 4.0, 4.0), (3L, 9.0, 2.0)).toDF("iid", "lo", "hi")
    val got = pairs(RangeJoin.binnedPointJoin(p, "v", iv, "lo", "hi", 2.5))
    assert(got == Set((1L, 1L)))
  }

  test("binnedIntervalJoin == naive overlap join, one row per overlapping pair") {
    val l = lcg(17).grouped(2).take(50).zipWithIndex.map { case (Seq(a, b), i) =>
      val lo = ((a >>> 11).toDouble / (1L << 53).toDouble) * 100.0
      (i.toLong, lo, lo + ((b >>> 11).toDouble / (1L << 53).toDouble) * 15.0)
    }.toSeq.toDF("pid", "llo", "lhi")
    val r = lcg(23).grouped(2).take(50).zipWithIndex.map { case (Seq(a, b), i) =>
      val lo = ((a >>> 11).toDouble / (1L << 53).toDouble) * 100.0
      (i.toLong, lo, lo + ((b >>> 11).toDouble / (1L << 53).toDouble) * 15.0)
    }.toSeq.toDF("iid", "rlo", "rhi")
    val naive = r.join(l, $"llo" < $"rhi" && $"rlo" < $"lhi")
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    for (w <- Seq(1.3, 10.0, 500.0)) {
      val got = RangeJoin
        .binnedIntervalJoin(l, "llo", "lhi", r, "rlo", "rhi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      // Seq comparison after sort: catches duplicated pairs, not just set drift
      assert(got.sorted == naive.sorted, s"width $w")
    }
    assert(naive.nonEmpty)
  }

  test("touching half-open intervals do not overlap; identical ones do") {
    val l = Seq((1L, 0.0, 5.0)).toDF("pid", "llo", "lhi")
    val r = Seq((1L, 5.0, 9.0), (2L, 0.0, 5.0)).toDF("iid", "rlo", "rhi")
    val got = RangeJoin
      .binnedIntervalJoin(l, "llo", "lhi", r, "rlo", "rhi", 2.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("the binned plan is a hash join on the bin key — never a nested-loop product") {
    val plan = RangeJoin
      .binnedPointJoin(points, "v", intervals, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
