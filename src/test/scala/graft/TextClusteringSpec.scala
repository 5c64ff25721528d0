package graft

import org.apache.spark.sql.functions._

import graft.ml.TextClustering

class TextClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf+kmeans pipeline clusters and is deterministic") {
    val docs = Tables.documents(spark, sf0001).limit(200).cache()
    val a = TextClustering.cluster(docs, k = 5)
    assert(a.columns.contains("cluster"))
    val clusters = a.select("cluster").distinct().as[Int].collect().toSet
    assert(clusters.size == 5 && clusters.forall(c => c >= 0 && c < 5))
    val b = TextClustering.cluster(docs, k = 5)
    val pa = a.select("doc_id", "cluster").as[(Long, Int)].collect().toMap
    val pb = b.select("doc_id", "cluster").as[(Long, Int)].collect().toMap
    assert(pa == pb, "same seed must reproduce the same clustering")
  }

  test("embedding kmeans recovers well-separated clusters exactly") {
    // three tight clusters around orthogonal centers
    val rng = new scala.util.Random(7)
    val rows = (0 until 90).map { i =>
      val label = i % 3
      val base = Array.fill(8)(0.0f)
      base(label) = 10.0f
      (i.toLong, label, base.map(x => x + rng.nextFloat() * 0.1f).toSeq)
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = TextClustering.clusterEmbeddings(df, k = 3)
    val purity = out.groupBy("cluster", "label").count()
      .groupBy("cluster").agg(max("count").as("maj"), sum("count").as("tot"))
      .agg(sum("maj").cast("double") / sum("tot")).as[Double].head()
    assert(purity == 1.0, s"separable clusters must be fully recovered, got $purity")
  }

  test("embedding kmeans beats chance on the overlapping synthetic corpus") {
    // testdata embeddings are heavily overlapping (max pairwise cosine
    // ~0.5); exact recovery is impossible, but structure must beat the
    // ~0.1 random-assignment purity
    val out = TextClustering.clusterEmbeddings(Tables.embeddings(spark, sf0001), k = 10)
    val purity = out.groupBy("cluster", "label").count()
      .groupBy("cluster").agg(max("count").as("maj"), sum("count").as("tot"))
      .agg(sum("maj").cast("double") / sum("tot")).as[Double].head()
    assert(purity > 0.12, s"purity $purity should beat chance (~0.1)")
  }
}
