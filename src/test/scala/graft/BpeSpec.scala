package graft

import graft.ops.Bpe

/** BPE tokenizer training: the distributed histogram trainer must agree
  * merge-for-merge with a naive in-memory reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE (Sennrich alg. 1) over a word histogram, ties broken
    * lexicographically — the semantics Bpe.train claims. */
  private def referenceTrain(
      words: Map[String, Long], numMerges: Int, minFreq: Long): Seq[(String, String)] = {
    var hist = words.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty).toSeq :+ Bpe.EndOfWord) -> c }
    val merges = Vector.newBuilder[(String, String)]
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c)
      }
      if (pairCounts.isEmpty || pairCounts.values.max < minFreq) done = true
      else {
        val (a, b) = pairCounts.toSeq
          .minBy { case ((x, y), f) => (-f, x, y) }._1
        merges += ((a, b))
        hist = hist.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }
        it += 1
      }
    }
    merges.result()
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "the lowest and the newest of the new")

  test("distributed trainer matches the reference merge-for-merge") {
    val df = corpus.toDF("text")
    val words = corpus.flatMap(_.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val expected = referenceTrain(words, numMerges = 12, minFreq = 2)
    val got = Bpe.train(df, numMerges = 12, minFreq = 2)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    assert(got.nonEmpty && got.size <= 12)
  }

  test("training is deterministic under repartitioning") {
    val df = corpus.toDF("text")
    val a = Bpe.train(df, numMerges = 8)
    val b = Bpe.train(df.repartition(5), numMerges = 8)
    assert(a == b)
  }

  test("encodeWord applies merges greedily, round-trips the word") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w"))
    val toks = Bpe.encodeWord("lowest", merges)
    assert(toks == Seq("low", "est" + Bpe.EndOfWord), toks.toString)
    // concatenation restores the word + sentinel
    assert(toks.mkString == "lowest" + Bpe.EndOfWord)
    val full = Bpe.encodeWord("lowest", Nil)
    assert(full == Seq("l", "o", "w", "e", "s", "t", Bpe.EndOfWord))
    // overlap rule: merge (a,a) over "aaa" → "aa", "a"
    assert(Bpe.encodeWord("aaa", Seq(("a", "a"))) ==
      Seq("aa", "a", Bpe.EndOfWord))
  }

  test("tokenCount shrinks as merges are learned") {
    val df = corpus.toDF("text")
    val merges = Bpe.train(df, numMerges = 12, minFreq = 2)
    val before = Bpe.tokenCount(df, Nil).agg(
      org.apache.spark.sql.functions.sum("bpe_tokens")).head().getLong(0)
    val after = Bpe.tokenCount(df, merges).agg(
      org.apache.spark.sql.functions.sum("bpe_tokens")).head().getLong(0)
    assert(after < before, s"$after !< $before")
    assert(after > 0)
  }

  test("minFreq stops training before noise merges") {
    val df = Seq("aa bb cc dd ee").toDF("text") // every pair occurs once
    assert(Bpe.train(df, numMerges = 8, minFreq = 2).isEmpty)
  }
}
