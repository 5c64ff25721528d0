package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Packing
import graft.pipeline.Layout

/** Property checks for the layout/packing math, sampled with fixed
  * scalacheck seeds (same offline pattern as ChunkTextSpec). */
class LayoutPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int = 60): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("zValue is injective and per-axis monotone on the bit domain") {
    val pts = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y")), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(zs.map(_._3).distinct.length == pts.length, "must be injective")
    assert(zs.forall { case (_, _, z) => z >= 0 && z < 1024 })
    // fixing one axis, z is strictly increasing in the other
    val onAxis = zs.filter(_._2 == 0).sortBy(_._1).map(_._3)
    assert(onAxis.zip(onAxis.tail).forall { case (a, b) => a < b })
    // out-of-range inputs clamp to the top corner, not wrap to 0
    val clamped = Seq((1000L, -5L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 5)).head().getLong(0)
    val corner = Seq((31L, 0L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 5)).head().getLong(0)
    assert(clamped == corner)
  }

  test("packing invariants hold for random weight sequences") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 500L))
    samples(gen, 40).foreach { weights =>
      val budget = 1000L
      val df = weights.zipWithIndex
        .map { case (w, i) => ("g", i.toLong, w) }.toDF("grp", "ord", "w")
      val out = Packing.packContiguous(df, "grp", "ord", "w", budget)
        .select("ord", "w", "bin_id").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      // bins are dense from 0 and non-decreasing in fill order
      val bins = out.map(_._3)
      assert(bins.head == 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 },
        s"bins must step by at most 1: ${bins.toSeq}")
      // each bin's weight stays under budget + one document
      val maxW = weights.max
      out.groupBy(_._3).values.foreach { rows =>
        assert(rows.map(_._2).sum < budget + maxW)
      }
      // total bin count is the sequential-fill count
      var cum = 0L
      val expectedBins = weights.map { w => val b = cum / budget; cum += w; b }
      assert(bins.toSeq == expectedBins, "must equal sequential fill")
    }
  }
}
