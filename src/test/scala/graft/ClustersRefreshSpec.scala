package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{ClustersRefresh, MergeTable}

/** [[graft.pipeline.ClustersRefresh]] — incremental connected
  * components over the near-dup pair graph: refresh ≡ full rebuild
  * through cluster MERGES (an insert bridging two standing clusters),
  * cluster SPLITS (deleting/rewriting the bridge), chained refreshes,
  * and crash-visibility of half-written versions. */
class ClustersRefreshSpec extends SparkSpec {
  import spark.implicits._

  // three near-dup families (A, B, C) with no cross-family shingles,
  // plus loners; within a family, docs share most trigrams
  private def fam(tag: String, i: Int): String =
    s"alpha $tag beta $tag gamma $tag delta $tag epsilon $tag v$i"

  private def baseDocs = Seq(
    (1L, fam("aa", 1)), (2L, fam("aa", 2)), (3L, fam("aa", 3)),
    (10L, fam("bb", 1)), (11L, fam("bb", 2)),
    (20L, fam("cc", 1)), (21L, fam("cc", 2)),
    (90L, "totally unrelated content one two three four five"),
    (91L, "another standalone body with no shared trigrams at all"))

  private def assignMap(dir: String, v: Int): Map[Long, Long] =
    ClustersRefresh.readAssign(spark, dir, v)
      .as[(Long, Long)].collect().toMap

  private def rebuildEquals(corpus: String, dir: String, v: Int): Unit = {
    val fresh = Files.createTempDirectory("graft-cc-rebuild").toString
    ClustersRefresh.build(spark, corpus, fresh, version = v)
    val a = assignMap(dir, v)
    val b = assignMap(fresh, v)
    assert(a == b, s"refresh must equal rebuild at v$v: got $a want $b")
  }

  test("refresh == rebuild across merges, splits, deletes and chained versions") {
    val root = Files.createTempDirectory("graft-cc-ivm")
    val (corpus, clusters) = (s"$root/corpus", s"$root/clusters")
    MergeTable.create(spark, corpus, baseDocs.toDF("doc_id", "text"),
      "doc_id", nBuckets = 4)
    ClustersRefresh.build(spark, corpus, clusters, version = 1)

    val v1 = assignMap(clusters, 1)
    assert(v1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L), s"v1 families: $v1")

    // v2: an inserted doc BRIDGES families A and B (shares shingles
    // with both); doc 21 is rewritten to unrelated text (splits C to
    // singletons); doc 3 deleted
    val bridge = s"${fam("aa", 9)} ${fam("bb", 9)}"
    MergeTable.merge(spark, corpus, Seq(
        (5L, bridge, false),
        (21L, "rewritten into something entirely different now", false),
        (3L, "", true))
      .toDF("doc_id", "text", "_del"), "doc_id", deleteCol = Some("_del"),
      validate = false)
    ClustersRefresh.refresh(spark, corpus, clusters, 1, 2)

    val v2 = assignMap(clusters, 2)
    assert(v2 == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L),
      s"A+bridge+B merged under min id 1; C dissolved; 3 gone: $v2")
    rebuildEquals(corpus, clusters, 2)

    // v3: delete the bridge — the merged cluster must SPLIT back
    MergeTable.merge(spark, corpus,
      Seq((5L, "", true)).toDF("doc_id", "text", "_del"),
      "doc_id", deleteCol = Some("_del"), validate = false)
    ClustersRefresh.refresh(spark, corpus, clusters, 2, 3)

    val v3 = assignMap(clusters, 3)
    assert(v3 == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L),
      s"bridge removal must split A|B apart again: $v3")
    rebuildEquals(corpus, clusters, 3)

    // survivors: one representative per cluster + singletons
    val surv = ClustersRefresh.survivors(spark, corpus, clusters, 3)
      .as[Long].collect().toSet
    assert(surv == Set(1L, 10L, 20L, 21L, 90L, 91L), s"survivors: $surv")
  }

  test("a torn version (no _DONE) is invisible; version() reads the newest complete") {
    val root = Files.createTempDirectory("graft-cc-torn")
    val (corpus, clusters) = (s"$root/corpus", s"$root/clusters")
    MergeTable.create(spark, corpus, baseDocs.toDF("doc_id", "text"),
      "doc_id", nBuckets = 2)
    ClustersRefresh.build(spark, corpus, clusters, version = 1)
    assert(ClustersRefresh.version(spark, clusters).contains(1))
    // simulate a crash between the parquet writes and the marker
    ClustersRefresh.readAssign(spark, clusters, 1)
      .write.parquet(s"$clusters/v2/assign")
    assert(ClustersRefresh.version(spark, clusters).contains(1),
      "half-written v2 must stay invisible")
  }

  test("restrictedPairs counts each unordered pair once and matches the full join") {
    val docs = baseDocs.toDF("doc_id", "text")
    val all = graft.ops.Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // with EVERY doc marked changed, restricted == full
    val everyone = docs.select("doc_id")
    val restricted = ClustersRefresh.restrictedPairs(docs, everyone, 0.2)
      .as[(Long, Long)].collect().toSeq
    assert(restricted.toSet == all, s"got ${restricted.toSet} want $all")
    assert(restricted.size == restricted.toSet.size, "no duplicate pairs")
    // with one changed doc, only its pairs
    val one = Seq(2L).toDF("doc_id")
    val oneRes = ClustersRefresh.restrictedPairs(docs, one, 0.2)
      .as[(Long, Long)].collect().toSet
    assert(oneRes == all.filter(p => p._1 == 2L || p._2 == 2L), s"$oneRes")
  }
}
