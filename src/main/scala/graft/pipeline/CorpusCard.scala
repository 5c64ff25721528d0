package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset CARD — the "datasheets for datasets" deliverable (Gebru et
  * al., CACM 2021; HF dataset cards): one call reduces a corpus to the
  * long-form `(section, metric, value)` report a release ships with —
  * volume, length distribution, language mix, exact-duplication rate,
  * and cheap quality flags.
  *
  * Every value is an exact BIGINT (counts, sums, or 10⁻⁶-fixed-point
  * means computed in INTEGER arithmetic), so the card is partition-,
  * rerun- and engine-invariant — it hashes identically in DuckDB,
  * which is what lets a card be an ORACLE row rather than a pretty
  * printout. Fixed-point means bound the inputs: `10⁶ · Σchars` must
  * stay under 2⁶³ (Σchars < 9.2 × 10¹², i.e. ~9 TB of text per card —
  * shard cards per source/date partition beyond that, which a release
  * process does anyway).
  *
  * Cost: ONE map-side-combined aggregation over one scan for all
  * scalar metrics (the [[graft.ops.Profile]] discipline — the single
  * `count_distinct` rides the same pass), plus one (lang) group-by
  * whose output is bounded by language cardinality. Nothing collects
  * but the constant-size report. */
object CorpusCard {

  /** The card for `docs` (needs `text` and a language column —
    * `langCol`, default `lang`). `tokens` is the tokenizer column
    * (caller supplies it so the card matches the pipeline's own
    * tokenization). */
  def card(
      docs: DataFrame, tokens: Column, langCol: String = "lang"): DataFrame = {
    val toksLen = size(tokens)
    val scalars = docs.agg(
      count(lit(1L)).as("n_docs"),
      sum(toksLen.cast("long")).as("n_tokens"),
      sum(length(col("text")).cast("long")).as("n_chars"),
      min(length(col("text")).cast("long")).as("min_chars"),
      max(length(col("text")).cast("long")).as("max_chars"),
      count_distinct(md5(graft.ops.Dedup.normalizedText(col("text"))))
        .as("distinct_docs"),
      sum(when(toksLen < 50, 1L).otherwise(0L)).as("short_docs"))
    val langRows = docs
      .groupBy(coalesce(col(langCol), lit("null")).as("l"))
      .agg(count(lit(1L)).as("value"))
    assemble(scalars, langRows)
  }

  /** Shared final shaping: `scalars` is ONE row with the named global
    * aggregates, `langRows` is `(l, value)` — both the from-scratch
    * [[card]] and the cell-maintained [[cardFromCells]] land here, so
    * the two paths cannot diverge in shape or arithmetic. The
    * EMPTY-CORPUS shape is decided here too, once for both paths:
    * count-like scalars coalesce to 0 (a SUM over no rows is NULL on
    * the from-cells path, a COUNT is 0 on the from-scratch path),
    * min/max stay NULL (no values — NULL is the honest answer on both
    * paths), and the fixed-point means guard `n_docs = 0` explicitly
    * (ANSI `0 DIV 0` would throw where the pre-coalesce NULL
    * numerator used to null-propagate). */
  private def assemble(scalars0: DataFrame, langRows: DataFrame): DataFrame = {
    val spark = scalars0.sparkSession
    import spark.implicits._
    val scalars = scalars0.select(
      coalesce(col("n_docs"), lit(0L)).as("n_docs"),
      coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
      coalesce(col("n_chars"), lit(0L)).as("n_chars"),
      col("min_chars"), col("max_chars"),
      coalesce(col("distinct_docs"), lit(0L)).as("distinct_docs"),
      coalesce(col("short_docs"), lit(0L)).as("short_docs"))
    val scalarRows = scalars.select(explode(map(
      lit("volume|n_docs"), col("n_docs"),
      lit("volume|n_tokens"), col("n_tokens"),
      lit("volume|n_chars"), col("n_chars"),
      lit("length|min_chars"), col("min_chars"),
      lit("length|max_chars"), col("max_chars"),
      // 1e-6 fixed-point mean in pure integer arithmetic
      lit("length|mean_chars_fp6"),
      expr("CASE WHEN n_docs = 0 THEN NULL " +
        "ELSE (1000000 * n_chars) DIV n_docs END"),
      lit("duplication|distinct_docs"), col("distinct_docs"),
      lit("duplication|n_exact_dup_docs"),
      col("n_docs") - col("distinct_docs"),
      lit("duplication|dup_rate_fp6"),
      expr("CASE WHEN n_docs = 0 THEN NULL " +
        "ELSE (1000000 * (n_docs - distinct_docs)) DIV n_docs END"),
      lit("quality|short_docs_lt50_tokens"), col("short_docs"))))
    val langKeyed = langRows
      .select(concat(lit("languages|lang:"), col("l")).as("key"), col("value"))
    scalarRows.toDF("key", "value").unionByName(langKeyed)
      .select(
        split(col("key"), "\\|").getItem(0).as("section"),
        split(col("key"), "\\|").getItem(1).as("metric"),
        col("value").cast("long").as("value"))
      .orderBy("section", "metric")
  }

  // ----- incremental decomposition ([[BucketedView]] cells) -----
  //
  // Two cell views maintain the whole card with touched-bucket cost:
  //  - LANG cells, one row per (bucket, lang): every scalar metric is
  //    distributive/algebraic over them (counts/sums re-sum, min/max
  //    re-fold), and the language mix is their per-lang roll-up.
  //  - DUP cells, one row per (bucket, normalized-text-hash): the
  //    exact-duplication ledger. Global distinct_docs is the DISTINCT
  //    hash count over the cells — a hash can span buckets, so cells
  //    cannot just sum; the finalize is one aggregation over cell
  //    state (hashes + counts, never text), which is also why this is
  //    a standing artifact and not a per-query recompute at 100 TB.
  // Deletes need no special casing: a deleted row's bucket is a
  // changed bucket whose cells rebuild from post-merge rows (the
  // BucketedView contract — what signed-delta IVM cannot do for
  // min/max and distinct).

  /** `derive` for the lang cells: normalizes NULL lang to the 'null'
    * bucket label the card reports. Row-local, bucket-preserving. */
  def deriveLang(langCol: String = "lang")(df: DataFrame): DataFrame =
    df.withColumn("l", coalesce(col(langCol), lit("null")))

  /** Per-(bucket, lang) partials carrying every scalar the card needs. */
  def langPartials(tokens: Column): Seq[Column] = {
    val toksLen = size(tokens)
    Seq(
      count(lit(1L)).as("c_docs"),
      sum(toksLen.cast("long")).as("c_tokens"),
      sum(length(col("text")).cast("long")).as("c_chars"),
      min(length(col("text")).cast("long")).as("c_min"),
      max(length(col("text")).cast("long")).as("c_max"),
      sum(when(toksLen < 50, 1L).otherwise(0L)).as("c_short"))
  }

  /** `derive` for the duplication ledger: the same normalized-text
    * hash the from-scratch card distinct-counts. */
  def deriveDup(df: DataFrame): DataFrame =
    df.withColumn("h", md5(graft.ops.Dedup.normalizedText(col("text"))))

  /** Per-(bucket, hash) occurrence count. */
  val dupPartials: Seq[Column] = Seq(count(lit(1L)).as("c"))

  /** The card from maintained cells — equals [[card]] bit-for-bit
    * (`CorpusCardSpec` pins it): global scalars re-fold the lang
    * cells, distinct_docs distinct-counts the dup ledger, and the
    * language mix rolls the lang cells up per language. */
  def cardFromCells(langCells: DataFrame, dupCells: DataFrame): DataFrame = {
    val scalars = langCells.agg(
        sum(col("c_docs")).as("n_docs"),
        sum(col("c_tokens")).as("n_tokens"),
        sum(col("c_chars")).as("n_chars"),
        min(col("c_min")).as("min_chars"),
        max(col("c_max")).as("max_chars"),
        sum(col("c_short")).as("short_docs"))
      .crossJoin(dupCells.agg(count_distinct(col("h")).as("distinct_docs")))
    val langRows = langCells.groupBy(col("l"))
      .agg(sum(col("c_docs")).as("value"))
    assemble(scalars, langRows)
  }
}
