package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{TopK, TopKState}

/** Direct property checks for the mutable [[TopKState]] buffer behind the
  * native `top_k` aggregate (VERDICT r4 ask #5). The SQL-level suite
  * (`TopKExprSpec`) proves plan shape and end-to-end results; this one
  * hammers the buffer itself — insert vs a sort-based reference, merge
  * associativity over arbitrary splits, the n==k boundary, duplicate
  * scores with id tie-breaks, and the serialize/deserialize round-trip —
  * with fixed scalacheck seeds (offline pattern of LayoutPropertySpec).
  */
class TopKStateSpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int = 80): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Ground truth: full sort by (score desc, id asc), take k. */
  private def reference(rows: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    rows.sortBy { case (id, s) => (-s, id) }.take(k)

  private def drain(st: TopKState): Seq[(Long, Double)] =
    (0 until st.n).map(i => (st.ids(i), st.scores(i)))

  private def build(rows: Seq[(Long, Double)], k: Int): TopKState = {
    val st = new TopKState(k)
    rows.foreach { case (id, s) => st.insert(id, s) }
    st
  }

  // scores drawn from a small set so duplicate scores (tie-breaks) are
  // common; ids can collide too — the reference treats rows as a bag
  private val rowsGen: Gen[List[(Long, Double)]] = Gen.sized { _ =>
    Gen.listOfN(120, for {
      id <- Gen.chooseNum(-50L, 50L)
      s <- Gen.oneOf(Gen.chooseNum(-5.0, 5.0), Gen.oneOf(-1.0, 0.0, 1.0, 2.5))
    } yield (id, s))
  }
  private val kGen: Gen[Int] = Gen.oneOf(1, 2, 3, 5, 8, 13, 120, 200)

  test("insert stream matches the sort-based reference for arbitrary k") {
    samples(Gen.zip(rowsGen, kGen)).foreach { case (rows, k) =>
      assert(drain(build(rows, k)) == reference(rows, k), s"k=$k rows=${rows.take(8)}…")
    }
  }

  test("n==k boundary: exactly k rows, then one more above/below/at the floor") {
    val k = 4
    val base = Seq((10L, 4.0), (20L, 3.0), (30L, 2.0), (40L, 1.0))
    val st = build(base, k)
    assert(st.n == k && drain(st) == base)
    // below the floor: rejected
    st.insert(99L, 0.5)
    assert(drain(st) == base)
    // at the floor with a LARGER id: rejected (id asc wins ties)
    st.insert(41L, 1.0)
    assert(drain(st) == base)
    // at the floor with a SMALLER id: replaces the floor
    st.insert(39L, 1.0)
    assert(drain(st) == Seq((10L, 4.0), (20L, 3.0), (30L, 2.0), (39L, 1.0)))
    // above the top: shifts everything down, evicts the floor
    st.insert(5L, 9.0)
    assert(drain(st) == Seq((5L, 9.0), (10L, 4.0), (20L, 3.0), (30L, 2.0)))
  }

  test("duplicate scores order by id ascending, duplicate (id,score) kept as a bag") {
    val k = 5
    val rows = Seq((7L, 1.0), (3L, 1.0), (9L, 1.0), (3L, 1.0), (1L, 1.0), (8L, 1.0))
    assert(drain(build(rows, k)) == reference(rows, k))
    assert(drain(build(rows, k)) == Seq((1L, 1.0), (3L, 1.0), (3L, 1.0), (7L, 1.0), (8L, 1.0)))
  }

  test("merge over any split of the stream equals the single-state result") {
    val splitGen = for {
      rows <- rowsGen
      k <- kGen
      nSplits <- Gen.chooseNum(2, 6)
      marks <- Gen.listOfN(rows.length, Gen.chooseNum(0, nSplits - 1))
    } yield (rows, k, marks)
    samples(splitGen).foreach { case (rows, k, marks) =>
      val whole = drain(build(rows, k))
      val parts = rows.zip(marks).groupBy(_._2).values.map(g => build(g.map(_._1), k))
      val merged = parts.reduce((a, b) => a.mergeWith(b))
      assert(drain(merged) == whole, s"k=$k splits=${parts.size}")
    }
  }

  test("merge with an empty side is the identity, in both directions") {
    val k = 3
    val st = build(Seq((1L, 5.0), (2L, 4.0)), k)
    val empty = new TopKState(k)
    assert(drain(st.mergeWith(empty)) == drain(st))
    assert(drain(empty.mergeWith(st)) == drain(st))
    assert(drain(empty.mergeWith(new TopKState(k))).isEmpty)
  }

  test("serialize/deserialize round-trips every generated state") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    samples(Gen.zip(rowsGen, kGen)).foreach { case (rows, k) =>
      val agg = TopK(Literal(0L), Literal(0.0), Literal(k))
      val st = build(rows, k)
      val back = agg.deserialize(agg.serialize(st))
      assert(back.k == st.k && drain(back) == drain(st))
      // a round-tripped buffer must still accept inserts and merges
      back.insert(-999L, Double.MaxValue)
      assert(back.scores(0) == Double.MaxValue && back.ids(0) == -999L)
    }
  }
}
