package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** Seeded fuzz of the `graft` DataSource's filter translation: random
  * conjunctions/disjunctions/negations over numeric and string columns
  * — equality, strict and closed ranges, IN-lists, null probes,
  * string prefixes — pushed through `format("graft")` must return
  * exactly what the same predicate returns over the raw MergeTable
  * read. The relation prunes files from whatever subset of the
  * predicate it can translate (a superset pass) and Spark re-applies
  * everything, so ANY divergence here is a wrongly skipped file or a
  * mistranslated bound. Runs on a deliberately hostile layout: one
  * clustered column, one unclustered, NULLs, multi-byte strings, and
  * a pending merge-on-read ledger.
  */
class GraftSourceFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-srcfuzz").toString

  test("random predicate fuzz: connector reads ≡ engine reads under pruning + pending ledger") {
    val rnd = new Random(7)
    val dir = tmpDir()
    // the lang domain deliberately straddles the UTF-16/code-point
    // ordering divergence: "a" (private-use BMP) sorts ABOVE the
    // supplementary-plane "😀x" in Java code units but BELOW
    // it in code points — the order zones compare in
    val langs = Seq("de", "en", "es", "früh", "中文", "a", "😀x", null)
    val base = (0L until 3000L).map { i =>
      (i, langs((i % 8).toInt), if (i % 97 == 0) null else java.lang.Long.valueOf(i % 500))
    }.toDF("id", "lang", "x")
    MergeTable.create(spark, dir, base, "id", nBuckets = 4)
    MergeTable.clusterBy(spark, dir, "x", filesPerBucket = 4)
    MergeTable.deleteKeys(spark, dir,
      (0L until 3000L by 13).toDF("id"), "id")

    val engine = MergeTable.read(spark, dir)
    val source = spark.read.format("graft").option("path", dir).load()

    def leaf(): Column = rnd.nextInt(12) match {
      case 0 => col("x") === rnd.nextLong(520)
      case 1 => col("x") > rnd.nextLong(520)
      case 2 => col("x") <= rnd.nextLong(520)
      case 3 => col("x").isin(Seq.fill(3)(rnd.nextLong(520)): _*)
      case 4 => col("lang") === langs(rnd.nextInt(7))
      case 5 => col("lang") < langs(rnd.nextInt(7))
      case 6 => col("lang").isNull
      case 7 => col("x").isNotNull
      case 8 => col("id") >= rnd.nextLong(3000)
      // string IN lists mixing planes: bound selection must stay in
      // code-point order or files holding only one plane vanish
      case 9 => col("lang").isin(
        Seq.fill(2)(langs(rnd.nextInt(7))): _*)
      case 10 => col("lang").startsWith(langs(rnd.nextInt(7)).take(1))
      case 11 => col("lang").contains("a")
    }

    def pred(depth: Int): Column =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => pred(depth - 1) && pred(depth - 1)
        case 1 => pred(depth - 1) || pred(depth - 1)
        case 2 => !pred(depth - 1)
      }

    var prunedTrials = 0
    for (trial <- 1 to 60) {
      val p = pred(if (trial % 2 == 0) 3 else 2)
      val want = engine.filter(p).select("id").as[Long].collect().sorted.toSeq
      val got = source.filter(p).select("id").as[Long].collect().sorted.toSeq
      assert(got == want,
        s"trial $trial diverged on predicate $p: got ${got.size} rows, " +
          s"want ${want.size}")
      val (kept, total) = graft.sources.GraftRelation.lastPruned
      if (kept < total) prunedTrials += 1
    }
    // the pruning paths (Or unions included) must actually fire under
    // fuzz, not just stay trivially exact by keeping everything
    assert(prunedTrials > 10,
      s"expected a non-trivial share of fuzzed scans to skip files, got $prunedTrials/60")
  }
}
