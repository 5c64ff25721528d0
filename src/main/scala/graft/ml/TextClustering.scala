package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib text pipeline: tokenize → hashed TF → IDF → KMeans — the
  * "Spark DataFrame transformations + AI/ML pipeline" axis of the north
  * star. Deterministic (fixed seed, hashing features) so clustering
  * output is reproducible run to run.
  *
  * Scale notes: every stage is a narrow per-row transform except the
  * IDF fit (one pass, tree-aggregated document frequencies) and the
  * KMeans iterations (k×dim broadcast centers + map-side partial sums —
  * no shuffle of the feature matrix itself).
  */
object TextClustering {

  /** Fit the pipeline on `textCol` and return the input with a
    * `cluster` column. */
  def cluster(
      df: DataFrame,
      textCol: String = "text",
      k: Int = 10,
      numFeatures: Int = 1 << 12,
      seed: Long = 42L): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__toks")
        .setPattern("[^a-z0-9]+").setToLowercase(true),
      new HashingTF().setInputCol("__toks").setOutputCol("__tf")
        .setNumFeatures(numFeatures),
      new IDF().setInputCol("__tf").setOutputCol("__tfidf"),
      new KMeans().setFeaturesCol("__tfidf").setPredictionCol("cluster")
        .setK(k).setSeed(seed)))
    pipeline.fit(df).transform(df)
      .drop("__toks", "__tf", "__tfidf")
  }

  /** KMeans over a raw embedding column (`ARRAY<FLOAT/DOUBLE>`) — the
    * embedding-space clustering used for corpus curation. */
  def clusterEmbeddings(
      df: DataFrame,
      embCol: String = "embedding",
      k: Int = 10,
      seed: Long = 42L): DataFrame = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val withVec = df.withColumn("__vec", toVec(col(embCol)))
    val km = new KMeans().setFeaturesCol("__vec").setPredictionCol("cluster")
      .setK(k).setSeed(seed)
    km.fit(withVec).transform(withVec).drop("__vec")
  }

  /** [[clusterEmbeddings]] plus a `dist` column: squared euclidean
    * distance of each row to its own cluster center. The k×dim center
    * matrix rides the task closure (broadcast-sized); the distance is a
    * narrow per-row transform — no extra shuffle. Accepts float or
    * double arrays. */
  def clusterEmbeddingsWithDist(
      df: DataFrame,
      embCol: String = "embedding",
      k: Int = 10,
      seed: Long = 42L): DataFrame =
    kmeansAssign(df, embCol, k, seed)._1

  /** KMeans fit + assignment returning both the assigned frame
    * (`cluster`, `dist` columns added) and the k×dim cluster centers —
    * the build step for centroid-probed structures (IVF). */
  def kmeansAssign(
      df: DataFrame,
      embCol: String = "embedding",
      k: Int = 10,
      seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val withVec = df.withColumn("__vec", toVec(col(embCol).cast("array<double>")))
    val model = new KMeans().setFeaturesCol("__vec").setPredictionCol("cluster")
      .setK(k).setSeed(seed).fit(withVec)
    val centers = model.clusterCenters
    val distTo = udf((v: org.apache.spark.ml.linalg.Vector, c: Int) =>
      Vectors.sqdist(v, centers(c)))
    val assigned = model.transform(withVec)
      .withColumn("dist", distTo(col("__vec"), col("cluster")))
      .drop("__vec")
    (assigned, centers.map(_.toArray))
  }
}
