package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.ops.Functions

/** The reference's batch line-embedding CLI (`scripts/vectorize_out.py`):
  * read a text file, one record per non-empty stripped line (S2 + P1),
  * assign a dense 0-based id in file order (P10), embed each line, and
  * write D5-shaped records `(id, text, model, embedding)` as JSON (S6).
  *
  * Scale note: the dense `row_number` over the whole file serializes on
  * one window partition — correct for the reference's single-file CLI
  * semantics; multi-file corpora get per-file ids by partitioning the
  * window on the filename instead (the id contract is per-file either
  * way).
  */
object VectorizeLines {

  /** S2 — one trimmed, non-empty line per record, in file order. */
  def loadLines(spark: SparkSession, path: String): DataFrame = {
    // text source exposes no intrinsic line index; capture file offsets
    // deterministically via the per-file input order
    spark.read.textFile(path).toDF("value")
      .withColumn("file", input_file_name())
      .withColumn("__order", monotonically_increasing_id())
      .filter(Functions.nonEmptyText(col("value")))
      .withColumn("id",
        row_number().over(Window.partitionBy("file").orderBy("__order")) - 1)
      .select(col("id").cast("long").as("id"), trim(col("value")).as("text"))
  }

  /** D5 records with embeddings attached. */
  def vectorize(
      lines: DataFrame,
      embedder: Embedder = HashingEmbedder(),
      model: String = "hashing-1024",
      limit: Option[Int] = None): DataFrame = {
    val capped = limit.fold(lines)(lines.limit) // O-LIMIT (--limit N)
    Embedder.embedColumn(capped, "text", embedder)
      .select(col("id"), col("text"), lit(model).as("model"), col("embedding"))
  }

  /** End-to-end CLI analog: text file in, JSON records out (S6). */
  def run(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      embedder: Embedder = HashingEmbedder(),
      limit: Option[Int] = None): Long = {
    val out = vectorize(loadLines(spark, inPath), embedder, limit = limit)
    out.write.mode("overwrite").json(outPath)
    out.count()
  }
}
