package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level duplicate-passage detection via winnowing
  * (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS fingerprint).
  * Whole-document hashing ([[Dedup.exact]], [[TextAnalysis.fingerprint]])
  * misses the dominant duplication mode in web-scale corpora: distinct
  * pages sharing boilerplate or quoted passages. Passage-level dedup
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better") needs a position-local fingerprint; winnowing guarantees
  * any shared run of ≥ k+w−1 characters yields at least one identical
  * selected fingerprint in both documents, at an expected density of
  * 2/(w+1) of positions.
  *
  * All arithmetic is exact integer math so a DuckDB oracle can replay
  * it bit for bit: the k-gram hash is the base-31 polynomial fold of
  * character ordinals modulo 2³¹ (every intermediate < 2³⁶, no BIGINT
  * overflow under ANSI mode in either engine), and winnowing is a
  * plain windowed min — no floats anywhere.
  *
  * 100 TB shape: hashing and winnowing are SCAN-LOCAL — per-row array
  * expressions bounded by the document length, no shuffle until the
  * selected fingerprints (a ~2/(w+1) fraction of positions) leave the
  * scan. The fingerprint count-by-hash is a hash aggregate with
  * map-side partials; everything downstream is linear in the selected
  * set, never in all k-gram positions.
  */
object Winnow {

  /** Power-of-two modulus: `%` of a non-negative BIGINT is exact and
    * identical in Spark and DuckDB. */
  val Mod: Long = 1L << 31

  /** Per-position k-gram polynomial hashes, as `array<bigint>` —
    * position `i` (1-based) hashes characters `i..i+k-1`. `t` MUST be
    * a plain attribute holding already-normalized text, never an
    * expression: higher-order lambdas re-evaluate their subtrees per
    * element, so an inlined `regexp_replace` here costs O(L·k) regex
    * executions per row (measured: a single task burned 19 min at
    * sf0.01 before this was made attribute-only). Documents shorter
    * than `k` yield an empty array (guarded: Spark's `sequence(1, n)`
    * with n ≤ 0 would count DOWN, not produce empty). */
  private def kgramHashes(t: Column, k: Int): Column = {
    val n = length(t) - (k - 1)
    when(n >= 1,
      transform(sequence(lit(1), n), i =>
        (0 until k).foldLeft(lit(0L)) { (h, j) =>
          (h * 31L + ascii(t.substr(i + lit(j), lit(1))).cast("long")) % Mod
        }))
      .otherwise(lit(Array.empty[Long]))
  }

  /** Window-min winnow over an ATTRIBUTE `h` of k-gram hashes (same
    * re-evaluation constraint as [[kgramHashes]]): min per window of
    * `w` consecutive hashes, distinct. */
  private def winnowed(h: Column, w: Int): Column =
    when(size(h) >= w,
      array_distinct(transform(sequence(lit(w), size(h)), t =>
        array_min(slice(h, t - w + 1, lit(w))))))
      .otherwise(lit(Array.empty[Long]))

  /** Winnowed fingerprint set: for every window of `w` consecutive
    * k-gram hashes take the min, then distinct — one row per selected
    * `(id, fp)`. Documents with fewer than `w` k-grams (length
    * < k+w−1) contribute no fingerprints.
    *
    * Each stage lives in its OWN projection so the normalized text and
    * the hash array stay single-evaluation attributes — Catalyst's
    * CollapseProject declines to inline a non-cheap alias referenced
    * more than once, which is exactly what keeps this O(L·(k+w)) per
    * row instead of O(L²·k). */
  def fingerprints(
      df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      k: Int = 16, w: Int = 8): DataFrame = {
    require(k >= 2 && k <= 64, "k-gram width out of range")
    require(w >= 1, "window must be positive")
    df.select(col(idCol), Dedup.normalizedText(col(textCol)).as("t"))
      .select(col(idCol), kgramHashes(col("t"), k).as("h"))
      .select(col(idCol), winnowed(col("h"), w).as("fps"))
      .select(col(idCol), explode(col("fps")).as("fp"))
  }

  /** Per-document duplicate-passage signal: `n_fp` selected
    * fingerprints and `n_shared` of them that occur in ≥ 2 distinct
    * documents — `n_shared / n_fp` is the duplicate-passage ratio used
    * as a filter threshold. Every input document appears in the output
    * (zero counts for documents too short to fingerprint). */
  def dupPassageStats(
      df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      k: Int = 16, w: Int = 8): DataFrame = {
    val fps = fingerprints(df, textCol, idCol, k, w)
    val counts = fps.groupBy("fp").agg(countDistinct(col(idCol)).as("nd"))
    val perDoc = fps.join(counts, "fp")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
    df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }
}
