package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.streaming.StreamingIngest

/** Incremental RAG-index maintenance over a mutable corpus — the
  * composition the MergeTable machinery exists for: corpus edits
  * (takedowns, re-crawls, fixes) flow to the vector index at a cost
  * proportional to WHAT CHANGED, never a full re-embed.
  *
  * Both sides are [[MergeTable]]s: the corpus keyed by `doc_id`, the
  * index keyed by the chunk content id (`Functions.contentId` — a pure
  * function of doc, chunk index and text). One refresh round:
  *
  *  1. [[MergeTable.changes]] between two corpus versions — reads only
  *     CHANGED buckets;
  *  2. pre-change chunk ids: the old text of exactly the changed docs
  *     (bucket-pruned [[MergeTable.readForKeys]] at `fromVersion`)
  *     re-chunked through the SAME deterministic pipeline — no chunk-id
  *     registry to maintain, the corpus is its own index of record;
  *  3. post-images chunk+embed ([[StreamingIngest.ingestBatch]], the
  *     one ingest code path);
  *  4. one index MERGE: upsert the new rows, delete old chunk ids that
  *     no longer exist. Chunks whose content survived an edit keep
  *     their id and simply upsert in place.
  *
  * Embedding — the expensive step at 100 TB — runs over changed docs
  * only. Deletions are exact: a doc's removal deletes precisely its
  * chunks, proven by re-deriving them from the pre-image.
  */
object IndexRefresh {

  /** Build the initial index table from a corpus version. */
  def build(
      spark: SparkSession,
      corpusDir: String,
      indexDir: String,
      embedder: Embedder = HashingEmbedder(),
      nBuckets: Int = 16,
      version: Int = -1): Unit = {
    val docs = MergeTable.read(spark, corpusDir, version).select("doc_id", "text")
    MergeTable.create(spark, indexDir,
      StreamingIngest.ingestBatch(docs, embedder), "id", nBuckets)
  }

  /** Apply corpus changes `fromVersion → toVersion` to the index.
    * Returns `(indexVersion, upserts, deletes)` — both counts bounded
    * by the changed docs' chunks. No-op (returns the current index
    * version with zero counts) when nothing changed. */
  def refresh(
      spark: SparkSession,
      corpusDir: String,
      indexDir: String,
      fromVersion: Int,
      toVersion: Int,
      embedder: Embedder = HashingEmbedder()): (Int, Long, Long) = {
    val ch = MergeTable.changes(spark, corpusDir, fromVersion, toVersion, "doc_id")
      .persist()
    try {
      if (ch.isEmpty) {
        (MergeTable.latestVersion(spark, indexDir), 0L, 0L)
      } else {
        val changedKeys = ch.select("doc_id")
        val oldDocs = MergeTable
          .readForKeys(spark, corpusDir, changedKeys, "doc_id", version = fromVersion)
          .select("doc_id", "text")
        val oldIds = StreamingIngest.ingestBatch(oldDocs, embedder).select("id")
        val newRows = StreamingIngest.ingestBatch(
          ch.filter(col("_change") =!= "delete").select("doc_id", "text"),
          embedder).persist()
        try {
          // chunk ids that existed before and no longer do → delete
          // records (index schema, null payload, _del=true)
          val gone = oldIds.join(newRows.select("id"), Seq("id"), "left_anti").distinct()
          val dels = gone.select(
            col("id") +: newRows.columns.filter(_ != "id").map(c =>
              lit(null).cast(newRows.schema(c).dataType).as(c)) :+
              lit(true).as("_del"): _*)
          val batch = newRows.withColumn("_del", lit(false)).unionByName(dels)
          val nUp = newRows.count()
          val nDel = dels.count()
          val v = MergeTable.merge(spark, indexDir, batch, "id",
            deleteCol = Some("_del"), validate = false)
          (v, nUp, nDel)
        } finally newRows.unpersist()
      }
    } finally ch.unpersist()
  }
}
