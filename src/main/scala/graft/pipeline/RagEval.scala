package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.index.VectorIndex
import graft.ops.TextAnalysis

/** The evaluation harness dataflow (reference §3.4:
  * `scripts/make_ragas_dataset.py` — load a golden QA JSON (D8), score
  * each record per metric, reduce to per-metric means (A3), write a
  * score snapshot (D9) and CSV (S10)).
  *
  * The reference's metric *values* come from remote LLM judges — an
  * external-model property, not engine behavior (SURVEY §6). The engine
  * preserves the dataflow with deterministic lexical/vector metrics:
  * answer↔ground-truth token F1, context precision/recall by token
  * overlap, and an embedding-cosine answer relevancy via the
  * deterministic hashing embedder.
  */
object RagEval {

  /** D8 — golden QA record. */
  val qaSchema: StructType = StructType(Seq(
    StructField("question", StringType),
    StructField("answer", StringType),
    StructField("ground_truth", StringType),
    StructField("contexts", ArrayType(StringType))))

  /** S3 — multiLine JSON array source with the D8 schema enforced. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(qaSchema).json(path)

  private def toks(c: org.apache.spark.sql.Column) =
    array_distinct(filter(split(lower(c), "[^\\p{L}\\p{N}']+"), t => length(t) > 0))

  /** Per-record deterministic metrics. */
  def scoreRecords(df: DataFrame): DataFrame = {
    val aT = toks(col("answer"))
    val gT = toks(col("ground_truth"))
    val ctxT = array_distinct(flatten(transform(col("contexts"), c => toks(c))))
    val inter = size(array_intersect(aT, gT)).cast("double")
    val p = inter / greatest(size(aT), lit(1)).cast("double")
    val r = inter / greatest(size(gT), lit(1)).cast("double")
    df.select(
      col("question"),
      when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0).as("answer_gt_f1"),
      (size(array_intersect(gT, ctxT)).cast("double") /
        greatest(size(gT), lit(1)).cast("double")).as("context_recall"),
      (size(array_intersect(ctxT, aT)).cast("double") /
        greatest(size(ctxT), lit(1)).cast("double")).as("context_precision"),
      VectorIndex.cosine(
        embedCol(col("answer")), embedCol(col("question"))).as("answer_relevancy"))
  }

  private def embedCol(c: org.apache.spark.sql.Column) = {
    val e = graft.embed.HashingEmbedder(256)
    val f = udf((s: String) => e.embed(if (s == null) "" else s))
    f(c)
  }

  /** A3 — per-metric means over the dataset → one-row score frame (D9
    * shape: dataset_length + metric map). */
  def evaluate(df: DataFrame): DataFrame = {
    val scored = scoreRecords(df)
    scored.agg(
      count(lit(1)).as("dataset_length"),
      round(avg(col("answer_gt_f1")), 6).as("answer_gt_f1"),
      round(avg(col("context_recall")), 6).as("context_recall"),
      round(avg(col("context_precision")), 6).as("context_precision"),
      round(avg(col("answer_relevancy")), 6).as("answer_relevancy"))
  }

  /** D9 + S10 — score snapshot as JSON, per-record scores as CSV. */
  def write(df: DataFrame, outDir: String): Unit = {
    evaluate(df).coalesce(1).write.mode("overwrite").json(s"$outDir/score")
    scoreRecords(df).coalesce(1).write.mode("overwrite")
      .option("header", true).csv(s"$outDir/records")
  }
}
