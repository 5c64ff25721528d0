package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O-PAIR — caption→asset pairing: the reference's ordered state machine
  * (`scripts/docx_etl.py:174-205`, dup `scripts/parsers/docx_parser.py:
  * 166-197`): a caption paragraph arms a "pending caption"; a following
  * asset block of the matching kind (figure caption → next image, table
  * caption → next table) consumes it. The pending caption survives
  * intervening non-matching blocks and clears only when consumed.
  *
  * Distributed form: an as-of match in sequence space. Each asset finds
  * the **last preceding caption of its kind** via a fill-down window
  * (`last(…, ignoreNulls = true)` over rows up to the previous block),
  * then `row_number` keeps only the **first** asset after each caption —
  * together reproducing the arm/consume semantics without any stateful
  * single-threaded pass. Partitioned by `doc_id`: scales with corpus
  * size.
  */
object PairAssets {

  /** Input: blocks `(doc_id, seq, kind, text, …)` where `kind` is one of
    * `caption_figure`, `caption_table`, `figure`, `table`, `para`.
    * Output: `(doc_id, cap_seq, caption, asset_seq, kind)` — one row per
    * caption successfully paired with its first following matching asset.
    */
  def apply(blocks: DataFrame): DataFrame = {
    val byDocPrev = Window.partitionBy("doc_id").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, -1)

    val armed = blocks
      // the last preceding figure-caption / table-caption, carried forward
      .withColumn("pending_fig_seq",
        last(when(col("kind") === "caption_figure", col("seq")), ignoreNulls = true)
          .over(byDocPrev))
      .withColumn("pending_fig_text",
        last(when(col("kind") === "caption_figure", col("text")), ignoreNulls = true)
          .over(byDocPrev))
      .withColumn("pending_tab_seq",
        last(when(col("kind") === "caption_table", col("seq")), ignoreNulls = true)
          .over(byDocPrev))
      .withColumn("pending_tab_text",
        last(when(col("kind") === "caption_table", col("text")), ignoreNulls = true)
          .over(byDocPrev))

    val matched = armed
      .filter(col("kind").isin("figure", "table"))
      .withColumn("cap_seq",
        when(col("kind") === "figure", col("pending_fig_seq"))
          .otherwise(col("pending_tab_seq")))
      .withColumn("caption",
        when(col("kind") === "figure", col("pending_fig_text"))
          .otherwise(col("pending_tab_text")))
      .filter(col("cap_seq").isNotNull)

    // each caption pairs only with its FIRST following matching asset
    matched
      .withColumn("rn",
        row_number().over(
          Window.partitionBy("doc_id", "cap_seq").orderBy("seq")))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"), col("cap_seq"), col("caption"),
        col("seq").as("asset_seq"), col("kind"))
  }
}
