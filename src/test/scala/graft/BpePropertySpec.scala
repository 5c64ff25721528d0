package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Bpe

/** Property check: the Column `aggregate`-fold merge (`Bpe.mergePair`,
  * the trainer's loop body) must agree with the greedy in-JVM encoder
  * (`Bpe.encodeWord`'s single-merge step) on arbitrary symbol sequences
  * and arbitrary pairs — including overlap runs ("aaa"), pairs absent
  * from the word, and merged-token adjacency. Fixed seeds (offline
  * scalacheck pattern of LayoutPropertySpec/TopKStateSpec). */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Greedy single-merge reference (the encodeWord inner loop). */
  private def referenceMerge(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("mergePair column fold == greedy reference on random inputs") {
    // small alphabet so pairs repeat and overlap; symbols may already be
    // multi-char (as after earlier merges)
    val symGen = Gen.oneOf("a", "b", "c", "ab", "ba", "aa")
    val caseGen = for {
      syms <- Gen.listOfN(10, symGen).map(_.take(10))
      n <- Gen.chooseNum(0, 10)
      a <- symGen
      b <- symGen
    } yield (syms.take(n), a, b)

    val cases = samples(caseGen, 120)
    assert(cases.size >= 100)
    val df = cases.zipWithIndex
      .map { case ((syms, a, b), i) => (i, syms, a, b) }
      .toDF("i", "syms", "a", "b")
    // group by (a, b) so each distinct pair gets one Column program
    cases.map { case (_, a, b) => (a, b) }.distinct.foreach { case (a, b) =>
      val got = df.filter(col("a") === a && col("b") === b)
        .select(col("i"), Bpe.mergePair(col("syms"), a, b).as("m"))
        .as[(Int, Seq[String])].collect().toMap
      cases.zipWithIndex.foreach { case ((syms, ca, cb), i) =>
        if (ca == a && cb == b) {
          val want = referenceMerge(syms, a, b)
          assert(got(i) == want,
            s"syms=$syms pair=($a,$b): got ${got(i)}, want $want")
        }
      }
    }
  }
}
