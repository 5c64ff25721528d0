package graft

import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.pipeline.TestsetGen
import graft.streaming.StreamingIngest

/** The deterministic RAGAS-testset-candidate dataflow: scroll cap, empty
  * drop, fixed-seed clustering, representative + neighbor contexts. */
class TestsetGenSpec extends SparkSpec {
  import spark.implicits._

  private def index() = {
    val docs = (0 until 40).map { i =>
      val topic = Seq("install the mobile client", "configure the server network",
        "database backup and restore", "user permission management")(i % 4)
      (i.toLong.toString, s"$topic variant $i with details " + ("words " * 20))
    }.toDF("doc_id", "text")
    StreamingIngest.ingestBatch(docs, HashingEmbedder(64))
      .withColumnRenamed("chunk_text", "text")
      .withColumn("paragraph_name", concat(lit("sec_"), col("doc_id")))
      .withColumn("document_name", col("doc_id"))
  }

  test("one candidate per non-empty cluster, contexts from the same cluster") {
    val cands = TestsetGen.candidates(index(), limit = 1000, testSize = 4,
      contextsPerQuestion = 3).cache()
    val n = cands.count()
    assert(n >= 1 && n <= 4)
    // first context is the representative's own ground truth
    cands.select(col("ground_truth"), col("contexts")(0))
      .as[(String, String)].collect()
      .foreach { case (gt, c0) => assert(gt == c0) }
    // context cardinality bounded
    cands.select(size(col("contexts"))).as[Int].collect()
      .foreach(s => assert(s >= 1 && s <= 3))
    // payload metadata carried through
    assert(cands.columns.contains("paragraph_name"))
    assert(cands.columns.contains("document_name"))
    // question seed is deterministic from the ground truth
    cands.select("question", "ground_truth").as[(String, String)].collect()
      .foreach { case (q, gt) => assert(q.contains(gt.take(40))) }
  }

  test("deterministic: same index twice yields identical candidates") {
    val a = TestsetGen.candidates(index(), testSize = 4).collect().toSeq
    val b = TestsetGen.candidates(index(), testSize = 4).collect().toSeq
    assert(a == b)
  }

  test("scroll cap and empty-text drop match the reference loader") {
    val idx = index()
    val withEmpty = idx.unionByName(
      idx.limit(1).withColumn("text", lit(""))
        .withColumn("id", concat(col("id"), lit("_empty"))))
    // empty rows never become candidates
    val cands = TestsetGen.candidates(withEmpty, testSize = 4)
    assert(!cands.select("ground_truth").as[String].collect().exists(_.isEmpty))
    // a tight limit restricts the candidate pool to the first ids
    val ids = idx.orderBy("id").limit(5).select("text").as[String].collect().toSet
    val capped = TestsetGen.candidates(idx, limit = 5, testSize = 3)
    capped.select("ground_truth").as[String].collect()
      .foreach(gt => assert(ids.contains(gt)))
  }
}
