package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.index.VectorIndex
import graft.pipeline.{IndexRefresh, MergeTable}
import graft.streaming.StreamingIngest

/** [[IndexRefresh]] — incremental index maintenance must converge to
  * EXACTLY what a full rebuild of the new corpus version would produce,
  * with work bounded by the changed documents.
  */
class IndexRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val emb = HashingEmbedder(64)

  private def indexRows(dir: String): Set[(String, String)] =
    MergeTable.read(spark, dir).select("id", "chunk_text")
      .as[(String, String)].collect().toSet

  test("refresh == full rebuild after update + delete + insert; work is bounded") {
    val corpus = Files.createTempDirectory("graft-ir-corpus").toString + "/c"
    val index = Files.createTempDirectory("graft-ir-index").toString + "/i"

    val docs = (1L to 20L).map(i =>
      (i, s"document number $i talks at length about topic $i and the many details of subject $i " * 3))
      .toDF("doc_id", "text")
    MergeTable.create(spark, corpus, docs, "doc_id", nBuckets = 8)
    IndexRefresh.build(spark, corpus, index, emb, nBuckets = 8)

    // corpus v2: rewrite doc 2, delete doc 3, insert doc 21
    val upd = Seq(
      (2L, "a thoroughly rewritten second document about entirely fresh material " * 4, false),
      (3L, "", true),
      (21L, "a brand new twenty-first document joining the corpus with novel content " * 4, false))
      .toDF("doc_id", "text", "_del")
    MergeTable.merge(spark, corpus, upd, "doc_id", deleteCol = Some("_del"))

    val (v, nUp, nDel) = IndexRefresh.refresh(spark, corpus, index, 1, 2, emb)
    assert(v == 2)

    // exact convergence: incremental result == full rebuild of corpus v2
    val rebuilt = StreamingIngest.ingestBatch(
      MergeTable.read(spark, corpus).select("doc_id", "text"), emb)
      .select("id", "chunk_text").as[(String, String)].collect().toSet
    assert(indexRows(index) == rebuilt)

    // work bounded by the changed docs: 2 docs' chunks upserted, ≤ 2 docs' deleted
    val chunksPerDoc = rebuilt.size / 20 + 2
    assert(nUp <= 2L * chunksPerDoc, s"upserts $nUp not bounded by changed docs")
    assert(nDel <= 2L * chunksPerDoc, s"deletes $nDel not bounded by changed docs")
    assert(nUp > 0 && nDel > 0)

    // deleted doc's chunks are gone; search finds the rewritten content
    assert(!indexRows(index).exists(_._2.contains("topic 3 ")))
    val hit = VectorIndex.search(
      MergeTable.read(spark, index),
      emb.embed("thoroughly rewritten second document fresh material").map(_.toDouble),
      k = 1, threshold = 0.0, normalizedInput = true)
      .select(col("doc_id").cast("string")).as[String].head()
    assert(hit == "2")
  }

  test("no corpus change → no-op refresh") {
    val corpus = Files.createTempDirectory("graft-ir2-corpus").toString + "/c"
    val index = Files.createTempDirectory("graft-ir2-index").toString + "/i"
    val docs = (1L to 5L).map(i => (i, s"stable document $i with steady content " * 3))
      .toDF("doc_id", "text")
    MergeTable.create(spark, corpus, docs, "doc_id", nBuckets = 4)
    IndexRefresh.build(spark, corpus, index, emb, nBuckets = 4)
    // a content-identical merge bumps the version but changes nothing
    MergeTable.merge(spark, corpus,
      docs.limit(1).withColumn("text", col("text")), "doc_id")
    val before = indexRows(index)
    val (_, nUp, nDel) = IndexRefresh.refresh(spark, corpus, index, 1, 2, emb)
    assert(nUp == 0 && nDel == 0)
    assert(indexRows(index) == before)
  }
}
