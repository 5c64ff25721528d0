package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O-KNN / O-THRESH / S9 — the vector index.
  *
  * The reference stores `(uuid, float[1024], payload)` points in Qdrant
  * with COSINE distance (`scripts/services/qdrant_service.py:20-42`) and
  * queries top-k=5 with score_threshold=0.5
  * (`scripts/test.out.py:14-19`). Here the index **is** a Spark table:
  *
  *  - vectors are L2-normalized **at write time**, so search is a plain
  *    dot product (dot ≡ cosine on unit vectors) — no per-row norm
  *    recomputation on the 100 TB read path;
  *  - top-k is `filter(θ) → orderBy(sim desc) → limit(k)`, which Catalyst
  *    plans as `TakeOrderedAndProjectExec`: per-partition heap top-k on
  *    executors, k-way merge on the driver — no global sort, no collect;
  *  - all arithmetic is done in double (cast from float) so results are
  *    stable and match the DuckDB oracle bit-for-bit after rounding.
  */
object VectorIndex {

  /** Sum of element-wise products, evaluated sequentially per row —
    * deterministic (no cross-row float reduction). Backed by the
    * codegen'd [[graft.expr.VectorExpressions.DotProduct]]; the
    * higher-order-function formulation ([[hofDot]]) computes the same
    * value interpreted, kept as a portability reference. */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExpressions.dot(a, b)

  def l2Norm(a: Column): Column = graft.expr.VectorExpressions.l2Norm(a)

  /** Cosine similarity between two vector columns (no normalization
    * assumption): dot / (||a|| * ||b||), single codegen'd pass. */
  def cosine(a: Column, b: Column): Column = graft.expr.VectorExpressions.cosine(a, b)

  /** HOF twin of [[dot]] — interpreted; same sequential arithmetic. */
  def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2-normalize an `ARRAY<FLOAT/DOUBLE>` column to unit length
    * (as doubles). Zero vectors normalize to zero. */
  def normalized(a: Column): Column = {
    val n = l2Norm(a)
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(transform(a, x => x.cast("double")))
  }

  /** Write-time normalization: returns the frame with `embCol` replaced by
    * its unit-normalized double form. Do this once at ingest so every
    * search is a dot product. */
  def withNormalized(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df.withColumn(embCol, normalized(col(embCol)))

  /** Write-time int8 scalar quantization: appends `qembedding` (BINARY,
    * one signed byte per dimension) and `qscale` (the per-vector
    * max-|x| symmetric scale). A 1024-d float vector is 4 KB; its int8
    * form is 1 KB — at 100 TB the quantized index is the one that fits
    * in the page cache, and the scoring kernel becomes pure integer ALU
    * work (`ByteDotProduct`, codegen'd). Quantize AFTER
    * [[withNormalized]] so the reconstructed dot approximates cosine.
    * Keep the float column for the re-rank tier or drop it for a
    * pure-int8 index. */
  def withQuantized(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val scaled = df.withColumn("qscale",
      graft.expr.VectorExpressions.maxAbs(col(embCol)))
    scaled.withColumn("qembedding",
      graft.expr.VectorExpressions.quantizeInt8(col(embCol), col("qscale")))
  }

  /** Approximate top-k search over an int8-quantized index
    * ([[withQuantized]] over normalized vectors): score =
    * `byteDot(qv, qq) · qscale · |q|∞ / 127²` ≈ cosine. Same
    * TakeOrderedAndProject shape as [[search]]; the scan reads 1 byte
    * per dimension instead of 4. Quantization error is ~1/255 per
    * element — rank inversions only between near-tied neighbors, which
    * the float re-rank tier (exact [[search]] over the top-k·4
    * candidates) removes; `QuantizedIndexSpec` measures recall. */
  def searchQuantized(
      index: DataFrame,
      query: Array[Double],
      k: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    val qn = {
      val n = math.sqrt(query.map(x => x * x).sum)
      if (n > 0) query.map(_ / n) else query
    }
    val qs = qn.map(math.abs).foldLeft(0.0)(math.max)
    val qb = if (qs == 0.0) qn.map(_ => 0.toByte)
      else qn.map(x => math.round(x / qs * 127.0).toByte)
    val factor = qs / (127.0 * 127.0)
    index
      .withColumn("score",
        round(graft.expr.VectorExpressions.byteDot(col("qembedding"), lit(qb)) *
          col("qscale") * lit(factor), 4))
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col(index.columns.head))
      .limit(k)
  }

  /** Two-tier search: the int8 tier scans cheaply for `k · overfetch`
    * candidates, the float tier re-scores exactly those rows and
    * returns the final top-k. With an overfetch covering the
    * quantization error band (default 4×), the result equals exact
    * [[search]] — which is how `knn_quantized_rerank_top5` shares the
    * brute-force oracle. At 100 TB the exact tier touches only
    * `k · overfetch` vectors, so the 4-byte-per-dim payload is read
    * for a few dozen rows instead of the whole index.
    *
    * `index` needs the float `embCol` AND the [[withQuantized]]
    * columns; the id column is `index.columns.head`. */
  def searchReranked(
      index: DataFrame,
      query: Array[Double],
      k: Int = 5,
      threshold: Double = 0.5,
      embCol: String = "embedding",
      overfetch: Int = 4): DataFrame = {
    require(overfetch >= 1)
    val idCol = index.columns.head
    val candidates = searchQuantized(index, query, k * overfetch,
      threshold = -1.0) // exact threshold applies at the re-rank tier
      .select(col(idCol), col(embCol))
    val qn = {
      val n = math.sqrt(query.map(x => x * x).sum)
      if (n > 0) query.map(_ / n) else query
    }
    val qCol = array(qn.map(lit): _*)
    candidates
      .withColumn("score", round(dot(col(embCol), qCol), 4))
      .filter(col("score") >= threshold)
      .select(idCol, "score")
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** S9 — persist index rows. Partitioned by `document_version` when the
    * column exists (SURVEY §7.1 M7): version-scoped searches and
    * re-ingests prune whole directories, and an idempotent re-ingest of
    * one version is a partition overwrite, not a table rewrite. */
  def write(df: DataFrame, path: String, mode: String = "append"): Unit = {
    val w = df.write.mode(mode)
    if (df.columns.contains("document_version"))
      w.partitionBy("document_version").parquet(path)
    else w.parquet(path)
  }

  /** Load the index, optionally pruned to one document version (a
    * partition-directory read when written via [[write]]). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      version: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(path)
    version.fold(df)(v => df.filter(col("document_version") === v))
  }

  /** IVF (inverted-file) ANN index: every row is assigned to one of
    * `nlist` KMeans cells at build time. A search scores the query
    * against the nlist centers on the driver (nlist×dim doubles — a
    * constant) and scans only the `nprobe` nearest cells.
    *
    * 100 TB shape: persist `cells` with `partitionBy("cell")` — probing
    * then PRUNES partition directories (reads ~nprobe/nlist of the
    * index from disk) instead of filtering a full scan. With
    * `nprobe == nlist` the search is exhaustive and must equal exact
    * brute-force — the oracle-checked configuration (`knn_ivf_top5`);
    * recall-vs-cost at `nprobe < nlist` is unit-tested on separable
    * clusters (`IvfIndexSpec`). */
  case class IvfIndex(cells: DataFrame, centers: Array[Array[Double]]) {
    def nlist: Int = centers.length
  }

  def buildIvf(
      index: DataFrame,
      nlist: Int = 16,
      embCol: String = "embedding",
      seed: Long = 42L): IvfIndex = {
    val (assigned, centers) =
      graft.ml.TextClustering.kmeansAssign(index, embCol, nlist, seed)
    IvfIndex(assigned.withColumnRenamed("cluster", "cell").drop("dist"), centers)
  }

  /** Persist an IVF index as a directory pair:
    * `<path>/cells` — the assigned rows, `partitionBy("cell")` so a
    * probe of the reloaded index PRUNES partition directories (reads
    * ~nprobe/nlist of the bytes — the `numFiles` scan metric proves it
    * in `IvfIndexSpec`); `<path>/centers` — an nlist-row sidecar of
    * `(cell, center)` (nlist×dim doubles, a constant independent of
    * corpus size). The index survives the building session: search
    * clusters need only the path.
    *
    * A rebuild in place is OVERWRITE by definition — there is no append
    * mode. Appending cells assigned under a NEW KMeans run into
    * directories keyed by the OLD build's cell ids silently skews every
    * probe (rows land in cells whose center no longer describes them),
    * and a second sidecar write would duplicate center rows. Both
    * directories are overwritten together; [[loadIvf]] additionally
    * rejects any half-rebuilt layout. */
  def writeIvf(ivf: IvfIndex, path: String): Unit = {
    ivf.cells.write.mode("overwrite").partitionBy("cell").parquet(path + "/cells")
    val spark = ivf.cells.sparkSession
    import spark.implicits._
    ivf.centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "center")
      .coalesce(1) // nlist rows — one tiny sidecar file
      .write.mode("overwrite").parquet(path + "/centers")
  }

  /** Reload a persisted IVF index. Centers (a constant-size sidecar)
    * are collected to the driver — the same place [[probeCells]] needs
    * them; cells stay a lazy partition-pruned parquet scan. Refuses a
    * sidecar with duplicate or missing cell ids — the signature of an
    * append/crash mid-rebuild, which would misdirect every probe. */
  def loadIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val rows = spark.read.parquet(path + "/centers")
      .select("cell", "center").collect()
    val ids = rows.map(_.getInt(0)).sorted
    require(ids.toSeq == (0 until ids.length),
      s"corrupt IVF sidecar at $path/centers: cell ids ${ids.take(8).mkString(",")}… " +
        "are not exactly 0..nlist-1 — an index rebuild must overwrite, never append")
    val centers = rows.sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    IvfIndex(spark.read.parquet(path + "/cells"), centers)
  }

  /** The rows of the `nprobe` cells whose centers are most cosine-similar
    * to `query` (driver-side center scoring; cell-id tie-break). */
  def probeCells(ivf: IvfIndex, query: Array[Double], nprobe: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val ranked = ivf.centers.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      val cn = math.sqrt(c.map(x => x * x).sum)
      val sim = if (cn > 0 && qn > 0) dot / (cn * qn) else 0.0
      (i, sim)
    }
    val chosen = ranked.sortBy { case (i, s) => (-s, i) }
      .take(math.min(nprobe, ivf.nlist)).map(_._1)
    ivf.cells.filter(col("cell").isin(chosen.map(Integer.valueOf): _*))
  }

  /** ANN top-k over an IVF index: probe, then the same
    * filter → orderBy → limit TakeOrderedAndProject path as [[search]]
    * — but over nprobe cells instead of the full index. */
  def searchIvf(
      ivf: IvfIndex,
      query: Array[Double],
      k: Int = 5,
      threshold: Double = 0.5,
      nprobe: Int = 4,
      embCol: String = "embedding",
      normalizedInput: Boolean = false): DataFrame =
    search(probeCells(ivf, query, nprobe).drop("cell"), query, k, threshold,
      embCol, normalizedInput)

  /** Exact brute-force top-k cosine search. `index` may be raw
    * (`normalizedInput = false`, norms computed on the fly) or
    * pre-normalized (the scale path). Plans as TakeOrderedAndProject. */
  def search(
      index: DataFrame,
      query: Array[Double],
      k: Int = 5,
      threshold: Double = 0.5,
      embCol: String = "embedding",
      normalizedInput: Boolean = false): DataFrame = {
    val qn = {
      val n = math.sqrt(query.map(x => x * x).sum)
      if (n > 0) query.map(_ / n) else query
    }
    val qCol = array(qn.map(lit): _*)
    val sim =
      if (normalizedInput) dot(col(embCol), qCol)
      else dot(col(embCol), qCol) / l2Norm(col(embCol))
    index
      .withColumn("score", sim)
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col(index.columns.head))
      .limit(k)
  }
}
