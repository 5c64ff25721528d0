package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.TextClustering

/** Deterministic analog of the reference's RAGAS testset-generation
  * dataflow (`make_ragas_test.py:57-132`): scroll the vector index with
  * a row cap, drop empty texts, carry the payload metadata — then, where
  * the reference hands the corpus to an LLM `TestsetGenerator`, cluster
  * the contexts in embedding space and emit one candidate QA row per
  * cluster: the cluster representative (closest to its center) supplies
  * the ground-truth context, its nearest same-cluster neighbors the
  * retrieval contexts, and a deterministic question seed stands in for
  * the LLM-phrased question. The LLM phrasing/critique step stays
  * external by design (this environment is offline); everything that
  * runs at corpus scale — selection, clustering, context assembly — is
  * here, reproducible run to run (fixed-seed KMeans, id tie-breaks).
  */
object TestsetGen {

  /** `index` needs `(id, text, embedding)`; `paragraph_name` /
    * `document_name` / `document_version` are carried when present
    * (the payload metadata of `load_documents_from_qdrant`,
    * `make_ragas_test.py:78-88`).
    *
    * @param limit    scroll cap (the reference's `limit=1000`)
    * @param testSize number of candidate QA rows (clusters)
    * @param contextsPerQuestion nearest cluster members kept as contexts
    */
  def candidates(
      index: DataFrame,
      limit: Int = 1000,
      testSize: Int = 50,
      contextsPerQuestion: Int = 3): DataFrame = {
    val metaCols = Seq("paragraph_name", "document_name", "document_version")
      .filter(index.columns.contains)

    // scroll-with-cap: deterministic id order (TakeOrderedAndProject —
    // per-partition heads, no global sort materialization), empty texts
    // dropped exactly like load_documents_from_qdrant's `if not text`
    val scrolled = index
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .orderBy("id")
      .limit(limit)

    val clustered = TextClustering.clusterEmbeddingsWithDist(
      scrolled, "embedding", k = testSize)

    // rank within cluster by distance-to-center, id as the tie-break;
    // the window runs over at most `limit` rows — bounded by the scroll
    // cap, not the corpus size
    val w = Window.partitionBy("cluster").orderBy(col("dist"), col("id"))
    val ranked = clustered.withColumn("rank", row_number().over(w))

    val contexts = ranked
      .filter(col("rank") <= contextsPerQuestion)
      .groupBy("cluster")
      .agg(transform(
        array_sort(collect_list(struct(col("rank"), col("text")))),
        x => x.getField("text")).as("contexts"))

    val reps = ranked.filter(col("rank") === 1)
    val out = reps.join(contexts, "cluster")
      .withColumn("question",
        concat(lit("What is described by: \""),
          substring(col("text"), 1, 80), lit("\"?")))
      .withColumn("ground_truth", col("text"))
    out.select(
      (Seq(col("cluster"), col("question"), col("ground_truth"),
        col("contexts")) ++ metaCols.map(col)): _*)
      .orderBy("cluster")
  }
}
