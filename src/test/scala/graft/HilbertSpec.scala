package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Layout

/** [[graft.pipeline.Layout.hilbertValue]] — the Hilbert curve's
  * defining properties, which distinguish it from Morton/z-order:
  * bijectivity over the full grid and UNIT-STEP adjacency between
  * consecutive curve positions (Morton jumps at power-of-two
  * boundaries). Plus a reference-model parity check and the locality
  * payoff measured against z-order. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference xy2d (the standard bit transform). */
  private def ref(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn; var y = yIn; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("bijective over the grid, unit-step adjacent, and equal to the reference model") {
    val bits = 4 // full 16x16 grid = 256 cells, exhaustive
    val grid = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
      .as[(Long, Long, Long)].collect()
    // reference parity on every cell
    got.foreach { case (x, y, h) =>
      assert(h == ref(x, y, bits), s"($x,$y): got $h want ${ref(x, y, bits)}")
    }
    // bijection onto [0, 256)
    assert(got.map(_._3).toSet == (0L until 256L).toSet)
    // the Hilbert property: consecutive curve positions are grid-adjacent
    val byD = got.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, d1), (x2, y2, d2)) =>
      assert(d2 == d1 + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between d=$d1 ($x1,$y1) and d=$d2 ($x2,$y2)")
    }
  }

  test("range-split by hilbert value covers tighter 2-D boxes than z-order") {
    // 64x64 grid split into 16 equal curve segments: sum of segment
    // bounding-box areas — smaller = better file-level pruning
    val bits = 6
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
    def boxArea(curve: (Long, Long) => Long): Long = {
      val cells = grid.map { case (x, y) => (curve(x, y), x, y) }.sortBy(_._1)
      cells.grouped(cells.size / 16).map { seg =>
        val xs = seg.map(_._2); val ys = seg.map(_._3)
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.sum
    }
    def morton(x: Long, y: Long): Long = {
      var d = 0L
      for (i <- 0 until bits) {
        d |= ((x >> i) & 1L) << (2 * i)
        d |= ((y >> i) & 1L) << (2 * i + 1)
      }
      d
    }
    val hilbertArea = boxArea(ref(_, _, bits))
    val mortonArea = boxArea(morton)
    assert(hilbertArea <= mortonArea,
      s"hilbert segments must box at least as tight: $hilbertArea vs $mortonArea")
    assert(hilbertArea <= 16 * 16 * 16 + 1000,
      s"16 segments of a 64x64 grid should box near-minimally, got $hilbertArea")
  }

  test("clamping and bits bounds") {
    val r = Seq((-5L, 2000L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 4).as("h"))
      .as[Long].head()
    assert(r == ref(0L, 15L, 4), "out-of-range inputs clamp like zValue")
    intercept[IllegalArgumentException](Layout.hilbertValue(lit(1), lit(1), 40))
  }
}
