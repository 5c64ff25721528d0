package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Cluster-level dedup: connected components over near-dup pairs and
  * representative selection. */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components merge chained pairs") {
    // chain 1-2-3, pair 10-11, singleton 99 (no edges)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
    assert(!comps.contains(99L))
  }

  test("long chains converge (diameter > 2)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comps.values.toSet == Set(1L), s"one component expected: $comps")
  }

  test("dropNearDups keeps one representative per cluster plus singletons") {
    val docs = Seq(
      (1L, "a"), (2L, "a copy"), (3L, "a copy copy"),
      (10L, "b"), (11L, "b copy"), (99L, "unique")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDups(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 99L))
  }

  test("end-to-end: minhash pairs -> components -> deduped corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "completely unrelated text about spark query engines and scale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(docs, threshold = 0.4)
      .select("id_a", "id_b")
    val kept = Dedup.dropNearDups(docs, pairs).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(4L))
    assert(kept.contains(1L))
    assert(!kept.contains(2L), "exact dup must fold into the cluster")
  }

  test("alternating star contraction equals label propagation on random graphs") {
    val rnd = new scala.util.Random(101L)
    for (round <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val pairs = (1 to 60).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
      def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.select(col("id").cast("long"), col("comp").cast("long"))
          .as[(Long, Long)].collect().toMap
      // force the DISTRIBUTED paths (maxDriverEdges = 0) and compare
      // against the driver union-find default — three formulations,
      // one labeling
      val lp = labels(
        Dedup.connectedComponents(pairs, maxIter = 60, maxDriverEdges = 0))
      val alt = labels(
        Dedup.connectedComponentsAlternating(pairs, maxDriverEdges = 0))
      val drv = labels(Dedup.connectedComponents(pairs))
      assert(alt == lp, s"round $round: alternating != label propagation")
      assert(drv == lp, s"round $round: driver union-find != label propagation")
    }
  }

  test("beyond-cap diameter: label propagation fails LOUDLY, star contraction converges") {
    // a 60-node chain has diameter 59 — DISTRIBUTED label propagation
    // (forced by maxDriverEdges = 0) at the default 15-round cap
    // cannot finish, and silently under-merged components would be
    // the worst outcome; the guard must throw.
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponents(chain, maxDriverEdges = 0).collect())
    assert(e.getMessage.contains("did not converge"))
    // the O(log n) alternating form finishes well under its cap and
    // labels the whole chain as one component rooted at 1
    val alt = Dedup.connectedComponentsAlternating(chain, maxDriverEdges = 0)
      .select(col("id").cast("long"), col("comp").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(alt == (1L to 60L).map(_ -> 1L).toMap)
    // the small-graph driver union-find (the default path at this
    // size) agrees with the distributed contraction exactly — chains
    // are its worst case for naive approaches, so pin it here too
    val drv = Dedup.connectedComponents(chain)
      .select(col("id").cast("long"), col("comp").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(drv == alt, "driver union-find must equal the distributed fixpoint")
  }

  test("dropExactDups convenience") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    assert(Dedup.dropExactDups(docs).select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("emb_semantic_dedup assignment is a consistent component labeling") {
    val out = SparkEntry.queries("emb_semantic_dedup")(spark, sf0001)
      .as[(Long, Long, Boolean)].collect()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.length == n, "one row per vector")
    val rep = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, r, survives) =>
      assert(r <= id, s"rep is the component minimum: $id -> $r")
      assert(survives == (r == id))
      assert(rep(r) == r, s"a representative represents itself: $r -> ${rep(r)}")
    }
    assert(out.exists(!_._3), "fixture contains at least one near-dup cluster")
  }
}
