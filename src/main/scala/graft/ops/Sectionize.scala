package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O-SEC — the sectionizer: the reference's single ordered pass over
  * document paragraphs (`scripts/parsers/docx_parser.py:54-86`):
  *
  *  - a heading paragraph opens a new section titled by that paragraph;
  *  - following non-empty paragraphs accumulate into the section text
  *    (joined with `" "`, `docx_parser.py:47`);
  *  - text before the first heading is dropped (`docx_parser.py:82-83`);
  *  - sections that end up with no body text are dropped
  *    (`docx_parser.py:61-63`);
  *  - duplicate heading titles stay distinct sections.
  *
  * Distributed form: classic fill-down. `sec_id` = running count of
  * headings (window partitioned per document, ordered by `seq`), title =
  * the heading's text within the (doc, sec) group, body = order-safe
  * concat. The `array_sort(collect_list(struct(seq, …)))` step is
  * mandatory: `collect_list` order after a shuffle is NOT deterministic,
  * and at 1000 executors an unsorted concat is a silent wrong answer.
  *
  * Scale note: windows partition by `doc_id`, so parallelism is
  * #documents — ideal for a corpus of many documents (the 100 TB shape);
  * a single giant document serializes its own window but nothing else.
  */
object Sectionize {

  /** Input: blocks `(doc_id, seq, style, text, …)` in document order.
    * Output: one row per non-empty section:
    * `(doc_id, sec_id, title, text, n_paragraphs)`. */
  def apply(
      blocks: DataFrame,
      headingPrefix: String = "Heading"): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("seq")

    blocks
      .withColumn("is_heading", Functions.isHeading(col("style"), headingPrefix))
      .withColumn("sec_id",
        sum(when(col("is_heading"), 1).otherwise(0)).over(byDoc))
      // sec_id = 0 → before the first heading → dropped
      .filter(col("sec_id") > 0)
      .withColumn("title",
        max(when(col("is_heading"), col("text")))
          .over(Window.partitionBy("doc_id", "sec_id")))
      // body paragraphs only, and only non-empty ones
      .filter(!col("is_heading") && Functions.nonEmptyText(col("text")))
      .groupBy("doc_id", "sec_id", "title")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("seq"), col("text")))),
            x => x.getField("text")),
          " ").as("text"),
        count(lit(1)).as("n_paragraphs"))
  }
}
