package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification safety gates over quasi-identifier columns —
  * the release-policy step a training corpus with user-derived
  * metadata passes before leaving the curation pipeline (the
  * complement of [[TextSanitize]]'s in-text PII masking: masking
  * hides values, these SUPPRESS rows whose attribute COMBINATION is
  * itself identifying).
  *
  * - k-anonymity by suppression (Sweeney, IJUFKS 2002): a row
  *   survives only if ≥ k rows share its full quasi-identifier
  *   combination — otherwise the combination is a fingerprint.
  * - l-diversity (Machanavajjhala et al., ICDE 2006): a surviving
  *   combination must also carry ≥ l DISTINCT values of a sensitive
  *   column — a 50-row group that all share one diagnosis is
  *   k-anonymous yet leaks the diagnosis.
  *
  * Shape at scale: ONE map-side-combined aggregation reduces the
  * corpus to its quasi-combination profile (bounded by combination
  * cardinality, ≪ rows), joined back null-safely. The data rows
  * stream through a broadcast hash join when the profile is small —
  * no row shuffle — and degrade to a shuffled equi-join when an
  * adversarial quasi-set makes the profile row-sized (AQE's call,
  * deliberately unhinted). Generalization (value coarsening) is a
  * plain Column the caller applies first — bucketing `n_chars div
  * 100` IS the generalization step, so suppression composes with any
  * coarsening policy.
  */
object Privacy {

  /** Null-safe equality on every quasi column — NULL is a value of a
    * quasi-identifier (two rows with a missing zip code still share
    * it), so the join back must not drop null groups. */
  private def quasiJoin(df: DataFrame, prof: DataFrame, quasiCols: Seq[String]): Column =
    quasiCols.map(c => df(c) <=> prof(s"__q_$c")).reduce(_ && _)

  private def profile(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: Option[String])
      : DataFrame = {
    val aggs = count(lit(1L)).as("__n") +:
      sensitiveCol.map(s => count_distinct(col(s)).as("__l")).toSeq
    df.groupBy(quasiCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) ++
        Seq(col("__n")) ++ sensitiveCol.map(_ => col("__l")): _*)
  }

  /** Rows whose quasi-identifier combination occurs ≥ `k` times.
    * Exact suppression semantics; column set and order unchanged. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1 && quasiCols.nonEmpty)
    val prof = profile(df, quasiCols, None).filter(col("__n") >= k)
    df.join(prof, quasiJoin(df, prof, quasiCols), "inner")
      .select(df.columns.map(df(_)): _*)
  }

  /** Rows surviving BOTH gates: combination size ≥ `k` and ≥ `l`
    * distinct `sensitiveCol` values within it. `l = 1` degrades to
    * plain k-anonymity (any non-empty group has one value). */
  def lDiversify(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1 && quasiCols.nonEmpty)
    val prof = profile(df, quasiCols, Some(sensitiveCol))
      .filter(col("__n") >= k && col("__l") >= l)
    df.join(prof, quasiJoin(df, prof, quasiCols), "inner")
      .select(df.columns.map(df(_)): _*)
  }

  /** The audit behind the gates: one row per quasi combination with
    * its size, distinct-sensitive count (when given) and whether the
    * k/l policy suppresses it — what a release review reads. */
  def anonymityProfile(
      df: DataFrame, quasiCols: Seq[String], k: Int,
      sensitiveCol: Option[String] = None, l: Int = 1): DataFrame = {
    require(k >= 1 && l >= 1 && quasiCols.nonEmpty)
    val prof = profile(df, quasiCols, sensitiveCol)
    val lCol = if (sensitiveCol.isDefined) col("__l") else lit(1L)
    prof.select(
      quasiCols.map(c => col(s"__q_$c").as(c)) ++ Seq(
        col("__n").as("n"),
        lCol.as("n_sensitive"),
        (col("__n") < k || lCol < l).as("suppressed")): _*)
  }

  /** Right-to-be-forgotten propagation audit: after a deletion request
    * lands, PROVE the ids are gone from every derived artifact — the
    * GDPR/CCPA erasure obligation covers indexes, postings, chunk
    * stores and fingerprints, not just the source table, and a
    * maintained-view family is exactly where a deletion silently
    * survives (a stale index version, a lagging refresh cursor).
    * Returns one `(artifact, residual)` row per artifact, in
    * declaration order; a compliant state is all-zero — anything else
    * names the leaking artifact.
    *
    * Each artifact costs one column-pruned filtered count (the id
    * column only crosses the scan). `ids` is an in-literal — a
    * deletion request batch is human-scale (≤ ~10k, enforced); audits
    * of larger batches should join against a deletion table instead. */
  def forgottenAudit(
      ids: Seq[Any],
      artifacts: Seq[(String, DataFrame, String)]): DataFrame = {
    require(ids.nonEmpty, "no ids to audit")
    require(ids.length <= 10000,
      s"${ids.length} ids — batch audits beyond 10k should anti-join a deletion table")
    require(artifacts.nonEmpty, "no artifacts declared")
    require(artifacts.map(_._1).distinct.length == artifacts.length,
      "duplicate artifact names")
    val spark = artifacts.head._2.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = artifacts.map { case (name, df, idCol) =>
      Row(name, df.filter(col(idCol).isin(ids: _*)).count())
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("artifact", StringType, nullable = false),
        StructField("residual", LongType, nullable = false))))
  }
}
