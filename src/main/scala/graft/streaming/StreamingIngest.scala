package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.embed.{Embedder, HashingEmbedder}
import graft.index.VectorIndex
import graft.ops.ChunkText

/** ST1 — streaming ingestion. The reference ingests per HTTP request
  * (`scripts/app.py:17-45`): each uploaded document is parsed → chunked →
  * embedded → upserted, independently. The Spark-native form is a file
  * source + `foreachBatch` running the identical batch pipeline — ingest
  * stays idempotent per file (mirroring the reference's per-file output)
  * and every micro-batch is the same code path as batch ingest, so there
  * is exactly one pipeline to test.
  *
  * Scale: the landing directory is listed incrementally (file-source
  * checkpointing); each batch parallelizes across executors; the index
  * write is an append-mode distributed parquet write (replacing the
  * reference's per-paragraph upsert RPC, `qdrant_service.py:26-28`).
  */
object StreamingIngest {

  /** The batch pipeline shared by streaming and batch ingest:
    * documents `(doc_id, text)` → 700/200 chunks → embeddings →
    * unit-normalized vector rows `(id, doc_id, chunk_idx, chunk_text,
    * embedding)`. */
  def ingestBatch(
      docs: DataFrame,
      embedder: Embedder = HashingEmbedder(),
      chunkSize: Int = ChunkText.DefaultChunkSize,
      overlap: Int = ChunkText.DefaultOverlap): DataFrame = {
    val chunked = ChunkText.explodeChunks(docs, "text", chunkSize, overlap)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
    val embedded = Embedder.embedColumn(chunked, "chunk_text", embedder)
    VectorIndex.withNormalized(embedded)
      .withColumn("id",
        graft.ops.Functions.contentId(col("doc_id"), col("chunk_idx"), col("chunk_text")))
      .select("id", "doc_id", "chunk_idx", "chunk_text", "embedding")
  }

  /** Start a streaming ingest: every text file landing in `landingDir`
    * becomes a document (one per file), flows through [[ingestBatch]],
    * and appends to the parquet vector index at `indexDir`. */
  def start(
      spark: SparkSession,
      landingDir: String,
      indexDir: String,
      checkpointDir: String,
      embedder: Embedder = HashingEmbedder()): StreamingQuery = {
    val files = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(landingDir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("doc_id"),
        col("value").as("text"))
    files.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, embedder)
          .write.mode("append").parquet(indexDir)
      }
      .start()
  }
}
