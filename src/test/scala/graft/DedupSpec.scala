package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "The  quick   brown fox jumps over the lazy dog"), // dup after normalize
    (4L, "a completely different document about spark engines"),
    (5L, "the quick brown fox jumps over the sleepy dog")) // near-dup of 1
    .toDF("doc_id", "text")

  test("exact dedup keeps lowest id, flags the rest") {
    val got = Dedup.exact(docs).select("doc_id", "is_dup")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
  }

  test("ngram jaccard finds the near-dup pair and full dups at 1.0") {
    val got = Dedup.ngramJaccardPairs(docs, threshold = 0.4)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) == 1.0)
    assert(got.contains((1L, 5L)) && got((1L, 5L)) < 1.0)
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH surfaces the same near-dup candidates, no cartesian product") {
    val df = Dedup.minHashPairs(docs, threshold = 0.4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join in plan:\n$plan")
    val got = df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
  }

  test("simhash: identical docs have hamming 0, unrelated docs differ") {
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) == fp(3L)) // normalization collapses whitespace
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(5L)) <= 16, "near-dup should be close")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(4L)) > 10, "unrelated should be far")
  }

  test("embedding near-dup LSH: self-similar clusters surface, no cartesian product") {
    val emb = graft.embed.Embedder.embedColumn(docs, "text", graft.embed.HashingEmbedder(64))
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val df = Dedup.embeddingNearDupPairs(emb, dim = 64, threshold = 0.9)
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fp = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(1L) == fp(3L) && fp(1L) != fp(4L))
  }

  test("rolling hash is order-sensitive where token-set hashing is not") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val rh = df.select(col("doc_id"), TextAnalysis.rollingHash(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(rh(1L) != rh(2L))
  }

  test("contamination flags eval docs by train-shingle containment") {
    val train = Seq((1L, "a b c d e f"), (2L, "x y z w q r"))
      .toDF("doc_id", "text")
    val evalDf = Seq(
      (10L, "a b c d e f"), // every trigram in train → 1.0
      (11L, "a b c q r s t u v"), // 1 of 7 trigrams → ~0.14, below θ
      (12L, "p p p p")) // no overlap
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.contamination(train, evalDf, threshold = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(10L), s"flagged: $out")
    assert(out(10L) == 1.0)
    // below-threshold doc is measurable at a lower θ
    val loose = graft.ops.Dedup.contamination(train, evalDf, threshold = 0.1)
      .as[(Long, Double)].collect().toMap
    assert(loose.keySet == Set(10L, 11L))
    assert(loose(11L) < 0.2)
  }

  test("stripDuplicatePassages drops cross-document boilerplate passages") {
    val boiler = "all rights reserved worldwide"
    val df = Seq(
      (1L, s"$boiler unique one two three"),
      (2L, s"ALL  Rights RESERVED Worldwide other words here now"), // normalizes to boiler
      (3L, "completely fresh text body only"), // 5 tokens → full seg + partial tail
      (4L, s"  $boiler "))                     // all boilerplate → ""
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.stripDuplicatePassages(df, segTokens = 4, maxDocs = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, "unique one two three")))
    assert(got(2L) == ((2L, 2L, 1L, "other words here now")))
    assert(got(3L) == ((3L, 2L, 0L, "completely fresh text body only")))
    assert(got(4L) == ((4L, 1L, 1L, "")))
  }

  test("exactNfc collapses byte-distinct equal-rendering text that exact keeps apart") {
    // decomposed (e + U+0301) vs precomposed (U+00E9) — the distinct() guard below proves the fixtures are byte-distinct
    val docs = Seq((1L, "café au lait"), (2L, "café au lait"))
      .toDF("doc_id", "text")
    assert(docs.select("text").distinct().count() == 2, "fixture must be byte-distinct")
    val plain = Dedup.exact(docs)
    assert(plain.filter(col("is_dup")).count() == 0, "raw bytes differ → not dups")
    val nfc = Dedup.exactNfc(docs)
    assert(nfc.filter(col("is_dup")).count() == 1)
    assert(nfc.filter(!col("is_dup")).select("doc_id").as[Long].head() == 1L)
  }
}
