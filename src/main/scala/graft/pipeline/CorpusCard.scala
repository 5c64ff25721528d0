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

  /** The card for `docs` (needs `text` and `lang` columns).
    * `tokens` is the tokenizer column (caller supplies it so the card
    * matches the pipeline's own tokenization). */
  def card(docs: DataFrame, tokens: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
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
    val scalarRows = scalars.select(explode(map(
      lit("volume|n_docs"), col("n_docs"),
      lit("volume|n_tokens"), col("n_tokens"),
      lit("volume|n_chars"), col("n_chars"),
      lit("length|min_chars"), col("min_chars"),
      lit("length|max_chars"), col("max_chars"),
      // 1e-6 fixed-point mean in pure integer arithmetic
      lit("length|mean_chars_fp6"),
      expr("(1000000 * n_chars) DIV n_docs"),
      lit("duplication|distinct_docs"), col("distinct_docs"),
      lit("duplication|n_exact_dup_docs"),
      col("n_docs") - col("distinct_docs"),
      lit("duplication|dup_rate_fp6"),
      expr("(1000000 * (n_docs - distinct_docs)) DIV n_docs"),
      lit("quality|short_docs_lt50_tokens"), col("short_docs"))))
    val langRows = docs
      .groupBy(coalesce(col("lang"), lit("null")).as("l"))
      .agg(count(lit(1L)).as("value"))
      .select(concat(lit("languages|lang:"), col("l")).as("key"), col("value"))
    scalarRows.toDF("key", "value").unionByName(langRows)
      .select(
        split(col("key"), "\\|").getItem(0).as("section"),
        split(col("key"), "\\|").getItem(1).as("metric"),
        col("value").cast("long").as("value"))
      .orderBy("section", "metric")
  }
}
