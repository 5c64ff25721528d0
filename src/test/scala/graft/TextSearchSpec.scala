package graft

import org.apache.spark.sql.functions._

import graft.ops.TextSearch

/** BM25 + RRF retrieval: postings shape, hand-computed BM25 scores on a
  * tiny corpus, fusion arithmetic, and the physical-plan contracts
  * (top-k is TakeOrderedAndProject; no cartesian on the data path). */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark streams data fast data"), // dl 5, tf(data)=2
    (1L, "slow batch data"),              // dl 3, tf(data)=1
    (2L, "no match here at all"),         // dl 5, no query term
    (3L, "data data data data")           // dl 4, tf(data)=4
  ).toDF("doc_id", "text")

  test("postings carries (doc, term, tf, dl) with one row per doc-term") {
    val p = TextSearch.postings(corpus).collect()
    val distinctDocTerms = corpus
      .select($"doc_id", explode(TextSearch.tokens($"text")).as("t"))
      .distinct().count()
    assert(p.length.toLong === distinctDocTerms)
    val d0data = p.find(r => r.getLong(0) == 0L && r.getString(2) == "data").get
    assert(d0data.getInt(1) === 5)  // dl
    assert(d0data.getLong(3) === 2) // tf
  }

  test("bm25 matches the hand-computed Robertson formula") {
    // query = {data}: df = 3, N = 4, avgdl = 17/4 = 4.25
    val got = TextSearch.bm25(corpus, Seq("data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 4.0; val dfq = 3.0; val avgdl = 17.0 / 4
    val idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
    def w(tf: Double, dl: Double) =
      math.round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e4) / 1e4
    assert(got.keySet === Set(0L, 1L, 3L)) // doc 2 has no query term
    assert(got(0L) === w(2, 5))
    assert(got(1L) === w(1, 3))
    assert(got(3L) === w(4, 4))
    // saturation sanity: 4 occurrences in a short doc beats 1 in a short doc
    assert(got(3L) > got(1L))
  }

  test("bm25TopK plans as TakeOrderedAndProject and keeps score-desc id-asc order") {
    val top = TextSearch.bm25TopK(corpus, Seq("data", "spark"), 2)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    val rows = top.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("rrfFuse sums exact fixed-point reciprocal ranks; single-list docs survive") {
    val la = Seq((10L, 5.0, 1), (11L, 4.0, 2)).toDF("doc_id", "score", "rank")
    val lb = Seq((11L, 9.0, 1), (12L, 8.0, 2)).toDF("doc_id", "score", "rank")
    val fused = TextSearch.rrfFuse(Seq(la, lb))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def c(rank: Int) = math.round(1e9 / (60 + rank)) / 1e9
    assert(fused(10L) === c(1))
    assert(fused(11L) === c(2) + c(1))
    assert(fused(12L) === c(2))
    assert(fused(11L) > fused(10L) && fused(10L) > fused(12L))
  }

  test("rankTopN truncates before ranking: rank is 1..n over the global top-n") {
    val scores = Seq((1L, 3.0), (2L, 9.0), (3L, 7.0), (4L, 7.0))
      .toDF("doc_id", "score")
    val r = TextSearch.rankTopN(scores, 3).collect()
      .map(x => (x.getLong(0), x.getInt(2))).toMap
    assert(r === Map(2L -> 1, 3L -> 2, 4L -> 3)) // tie 7.0 breaks on id; doc 1 cut
  }

  test("bm25 plan has no cartesian product beyond the single-row stats broadcast") {
    val plan = TextSearch.bm25(corpus, Seq("data")).queryExecution.executedPlan
    val cartesians = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cartesians.isEmpty, s"unexpected CartesianProduct:\n$plan")
  }

  test("trigram substring search: candidates are a verified superset; index == scan") {
    import graft.ops.TextSearch
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "slow brown snail"),
      (3L, "quick silver"), (4L, "own brow"), (5L, "completely other"))
      .toDF("doc_id", "text")
    val idx = TextSearch.trigramPostings(docs)
    // cross-token pattern: 'k b' only matchable via char trigrams
    for (p <- Seq("brown", "quick", "k b", "own")) {
      val got = TextSearch.substringSearch(docs, idx, p)
        .as[Long].collect().toSet
      val want = docs.filter(col("text").contains(p))
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"pattern '$p': got $got want $want")
    }
    // the trigram prefilter actually prunes: a rare pattern's candidate
    // set is smaller than the corpus
    val candidates = idx.filter(col("tg").isin("qui", "uic", "ick"))
      .select("doc_id").distinct().count()
    assert(candidates < docs.count(), "prefilter must prune")
    // short patterns are routed to the scan path explicitly
    val e = intercept[IllegalArgumentException] {
      TextSearch.substringSearch(docs, idx, "ab")
    }
    assert(e.getMessage.contains("contains scan"))
  }
}
