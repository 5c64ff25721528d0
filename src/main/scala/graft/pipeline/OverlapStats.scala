package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.{KmvExpr, KmvState}

/** Incremental cross-split OVERLAP maintenance over a [[MergeTable]] —
  * the [[BucketedView]] instance for set-overlap statistics: one KMV
  * bottom-k sketch ([[graft.expr.KmvAgg]]) of the split's distinct
  * trigram-shingle hashes per (bucket, split) cell. Refresh re-sketches
  * only [[MergeTable.changedBucketIds]] buckets and carries every other
  * cell forward BYTE-identically (the KMV serialized form is canonical
  * — the bottom-k of a set is order-free); finalize merges a split's
  * cells with `kmv_merge` and the pairwise audit is plain set algebra
  * over the merged sketches.
  *
  * This is the standing contamination monitor of a training pipeline:
  * after every ingest batch, "did train/val/test leak into each other"
  * costs the changed buckets' re-sketch plus three sketch merges —
  * never a join between split token sets.
  *
  * Exactness contract: while every sketch stays complete (distinct
  * hashes ≤ k) the audit is EXACT set algebra — the engine's synthetic
  * corpus keeps it there at any sf (31-word vocabulary ⇒ ≤ 31³ = 29,791
  * possible shingles < k = 32,768), and [[overlapPairs]] emits the
  * `exact` bit so a consumer (or the DuckDB oracle) sees immediately
  * when an answer left the exact regime.
  *
  * 100 TB cost model: refresh ∝ touched buckets; view state is
  * #buckets × #splits sketches of ≤ 9+8k bytes; the audit reduces to
  * #splits bounded binaries.
  */
object OverlapStats {

  /** Row-local derive: split assignment is a pure function of the key
    * ([[graft.ops.Sampling.hashSplit]] 80/10/10) and shingling is
    * per-row — legal under [[BucketedView]]'s derive contract
    * (preserves `bucket`, identical on full builds and changed-bucket
    * refreshes). */
  def shingleSplitDerive(keyCol: String = "doc_id", textCol: String = "text")
      : DataFrame => DataFrame = df =>
    graft.ops.Sampling.hashSplit(df, keyCol,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("bucket"), col("split"),
        explode(graft.ops.Dedup.shingles(col(textCol), 3)).as("sh0"))
      .select(col("bucket"), col("split"), xxhash64(col("sh0")).as("h"))

  /** The partial (per-cell) side: one KMV sketch per cell. */
  def partials(k: Int = 32768): Seq[Column] =
    Seq(KmvExpr.kmvAgg(col("h"), k).as("sk"))

  /** Full build at `version`: (bucket, split, sk BINARY). */
  def compute(
      spark: SparkSession, dir: String, groupCol: String = "split",
      version: Int = -1, k: Int = 32768,
      derive: DataFrame => DataFrame = shingleSplitDerive()): DataFrame =
    BucketedView.compute(spark, dir, groupCol, partials(k), version, derive)

  /** Maintain a [[compute]] view from `fromVersion` to `toVersion`:
    * changed buckets re-sketch, unchanged cells carry forward
    * byte-identically. Equals a fresh [[compute]] (spec-pinned). */
  def refresh(
      spark: SparkSession, dir: String, oldView: DataFrame,
      groupCol: String, fromVersion: Int, toVersion: Int, k: Int = 32768,
      derive: DataFrame => DataFrame = shingleSplitDerive()): DataFrame =
    BucketedView.refresh(
      spark, dir, oldView, groupCol, partials(k), fromVersion, toVersion, derive)

  /** Per-group merged sketch off the cell view: (groupCol, sk). */
  def merged(view: DataFrame, groupCol: String = "split"): DataFrame =
    BucketedView.finalizeView(view, groupCol,
      Seq(KmvExpr.kmvMerge(col("sk")).as("sk")))

  /** Pairwise overlap audit off a merged (group, sk) frame: one row
    * per unordered group pair with `(inter, n_union, jaccard, exact)`.
    *
    * CANONICAL CONVENTION: EVERY unordered pair of present groups gets
    * a row, including zero-intersection pairs — "these splits share
    * nothing" is an answer a contamination monitor must state, not an
    * absent row. The DuckDB oracles replay this with a cross join of
    * the per-group counts LEFT-joined to the shared-shingle pairs
    * (COALESCE(inter, 0)), so a sparse fixture with disjoint splits
    * stays hash-identical.
    *
    * The merged frame is COLLECTED (bounded: #groups ≤ `maxGroups`
    * sketches of ≤ 9+8k bytes — 3 × ~256 KB for the split monitor, the
    * same constant-bounded-sidecar pattern as the IVF codebooks) and
    * the pair stats run driver-side via [[KmvState.pairStats]]: one
    * pass over the data instead of the two a self-join of the
    * aggregation plan would trigger (Spark does not reuse a
    * non-broadcast exchange against a broadcast one). Rounding
    * replicates Spark's `round(x, 6)` (HALF_UP on the shortest
    * decimal form) so the result hashes identically to the previous
    * in-plan formulation. */
  def overlapPairs(merged: DataFrame, maxGroups: Int = 64): DataFrame = {
    val spark = merged.sparkSession
    val rows = merged.collect().map(r =>
      (String.valueOf(r.get(0)), r.getAs[Array[Byte]](1)))
    require(rows.length <= maxGroups,
      s"overlapPairs collected ${rows.length} group sketches (> $maxGroups); " +
        "this audit is for a bounded split/corpus axis")
    val out = for {
      (ga, sa) <- rows.toSeq
      (gb, sb) <- rows.toSeq
      if ga < gb
    } yield {
      val (inter, union, jacc, exact) = KmvState.pairStats(sa, sb)
      Row(ga, gb, inter.toLong, union.toLong,
        java.math.BigDecimal.valueOf(jacc)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(),
        exact)
    }
    val schema = StructType(Seq(
      StructField("split_a", StringType, nullable = false),
      StructField("split_b", StringType, nullable = false),
      StructField("inter", LongType, nullable = false),
      StructField("n_union", LongType, nullable = false),
      StructField("jaccard", DoubleType, nullable = false),
      StructField("exact", BooleanType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(out.sortBy(r => (r.getString(0), r.getString(1))), 1),
        schema)
      .orderBy("split_a", "split_b")
  }
}
