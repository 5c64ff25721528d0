package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.QSketchState

/** Property check for [[QSketchState]] over ARBITRARY partitionings and
  * merge trees (fixed-seed offline scalacheck pattern of
  * `BpePropertySpec`/`HeavyHittersSpec`):
  *
  *  - exact regime (distinct values ≤ k): any partition of the multiset
  *    merged in any tree shape yields the exact rank-rule quantile for
  *    every q, and a CANONICAL serialized form — byte-equal across
  *    partitionings, the property [[graft.pipeline.QuantileStats]]'
  *    carry-forward relies on;
  *  - any regime (adversarial values, k below distinct count): total
  *    mass stays exact, bins stay ≤ k, quantiles are observed values,
  *    and quantile(q) is monotone in q.
  */
class QSketchPropertySpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Smallest value whose cumulative count reaches max(1, ceil(q*n)). */
  private def refQuantile(xs: Seq[Double], q: Double): Double = {
    val sorted = xs.sorted
    sorted((math.max(1L, math.ceil(q * xs.size).toLong) - 1).toInt)
  }

  /** Build one sketch per chunk, then merge along an arbitrary
    * fold order decided by `leftFirst` bits. */
  private def merged(chunks: Seq[Seq[Double]], k: Int, leftFirst: Seq[Boolean]): QSketchState = {
    val sketches = chunks.map { c =>
      val st = new QSketchState(k)
      c.foreach(st.insert(_, 1L))
      st
    }
    sketches.zipWithIndex.drop(1).foldLeft(sketches.head) {
      case (acc, (s, i)) =>
        if (leftFirst(i % leftFirst.size))
          acc.mergeWith(s)
        else
          QSketchState.deserialize(s.serialized).mergeWith(acc)
    }
  }

  private val exactGen = for {
    // values from a 24-value domain, so k=32 keeps every sketch exact
    xs <- Gen.nonEmptyListOf(Gen.chooseNum(0, 23).map(_.toDouble))
    cuts <- Gen.listOfN(3, Gen.chooseNum(0, 200))
    bits <- Gen.listOfN(8, Gen.oneOf(true, false))
    q <- Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
  } yield (xs, cuts, bits, q)

  test("exact regime: arbitrary partitions and merge orders give the exact quantile and canonical bytes") {
    samples(exactGen, 200).foreach { case (xs, cuts, bits, q) =>
      val k = 32
      def chunksAt(cs: Seq[Int]): Seq[Seq[Double]] = {
        val sorted = (cs.map(_ % (xs.size + 1)).sorted :+ xs.size).distinct
        (0 +: sorted).sliding(2).map { case Seq(a, b) => xs.slice(a, b) }
          .filter(_.nonEmpty).toSeq match {
          case Seq() => Seq(xs)
          case s => s
        }
      }
      val m1 = merged(chunksAt(cuts), k, bits)
      val m2 = merged(chunksAt(cuts.reverse.map(_ + 13)), k, bits.map(!_))
      assert(m1.quantile(q) == refQuantile(xs, q),
        s"quantile mismatch: xs=$xs q=$q")
      assert(m1.serialized.toSeq == m2.serialized.toSeq,
        s"canonical bytes differ across partitionings: xs=$xs")
      assert(m1.total == xs.size)
    }
  }

  private val overflowGen = for {
    xs <- Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    k <- Gen.oneOf(2, 3, 8, 16)
    cuts <- Gen.listOfN(3, Gen.chooseNum(0, 500))
    bits <- Gen.listOfN(8, Gen.oneOf(true, false))
  } yield (xs, k, cuts, bits)

  test("any regime: exact mass, bounded bins, observed values, monotone quantiles") {
    samples(overflowGen, 200).foreach { case (xs, k, cuts, bits) =>
      val chunks = {
        val sorted = (cuts.map(_ % (xs.size + 1)).sorted :+ xs.size).distinct
        (0 +: sorted).sliding(2).map { case Seq(a, b) => xs.slice(a, b) }
          .filter(_.nonEmpty).toSeq match {
          case Seq() => Seq(xs)
          case s => s
        }
      }
      val st = merged(chunks, k, bits)
      assert(st.total == xs.size, "total mass is never approximated")
      assert(st.n <= k, s"bins ${st.n} exceed capacity $k")
      val qs = Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0).map(st.quantile)
      qs.foreach(v => assert(xs.contains(v), s"estimate $v not observed"))
      qs.sliding(2).foreach { case Seq(a, b) => assert(a <= b, "non-monotone") }
    }
  }
}
