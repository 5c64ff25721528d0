package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.index.VectorIndex
import graft.streaming.StreamingIngest

/** ST1: streaming file ingest via foreachBatch reuses the batch pipeline;
  * ST2 semantics (event-time windows) are oracle-checked as batch queries
  * q17/q18. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: landed text files end up as searchable index rows") {
    val landing = Files.createTempDirectory("graft-landing").toString
    val index = Files.createTempDirectory("graft-index").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    Files.writeString(java.nio.file.Paths.get(landing, "doc_a.txt"),
      "the mobile client installation guide with many words " * 30)
    Files.writeString(java.nio.file.Paths.get(landing, "doc_b.txt"),
      "server network configuration reference manual " * 30)

    val q = StreamingIngest.start(spark, landing, index, ckpt, HashingEmbedder(128))
    q.awaitTermination(60000)

    val idx = spark.read.parquet(index)
    assert(idx.columns.toSeq ==
      Seq("id", "doc_id", "chunk_idx", "chunk_text", "embedding"))
    val docs = idx.select("doc_id").distinct().as[String].collect().toSet
    assert(docs == Set("doc_a.txt", "doc_b.txt"))
    // chunked: each doc produced multiple ≤700-char chunks
    assert(idx.count() > 2)
    assert(idx.select(max(length(col("chunk_text")))).as[Int].head() <= 700)
    // vectors are unit-normalized at write time
    val norms = idx.select(VectorIndex.l2Norm(col("embedding"))).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9))

    // search finds the right document
    val query = HashingEmbedder(128).embed("mobile client installation").map(_.toDouble)
    val top = VectorIndex.search(idx, query, k = 1, threshold = 0.0, normalizedInput = true)
      .select("doc_id").as[String].head()
    assert(top == "doc_a.txt")
  }

  test("streaming ingest is incremental: a second start picks up only new files") {
    val landing = Files.createTempDirectory("graft-landing2").toString
    val index = Files.createTempDirectory("graft-index2").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString

    Files.writeString(java.nio.file.Paths.get(landing, "one.txt"), "first document")
    StreamingIngest.start(spark, landing, index, ckpt, HashingEmbedder(32))
      .awaitTermination(60000)
    val n1 = spark.read.parquet(index).count()

    Files.writeString(java.nio.file.Paths.get(landing, "two.txt"), "second document")
    StreamingIngest.start(spark, landing, index, ckpt, HashingEmbedder(32))
      .awaitTermination(60000)
    val idx = spark.read.parquet(index)
    assert(idx.count() == n1 + 1)
    assert(idx.select("doc_id").distinct().count() == 2)
  }
}
