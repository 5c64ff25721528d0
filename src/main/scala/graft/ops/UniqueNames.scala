package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O-UNIQ — collision-suffixed unique filenames: the reference tracks a
  * `used` set per document and renames the 2nd, 3rd, … occurrence of a
  * base name to `base_1`, `base_2`, …
  * (`scripts/parsers/docx_parser.py:120-127`, dup
  * `scripts/docx_etl.py:128-135`).
  *
  * Distributed form: `row_number` over `(doc_id, base, ext)` ordered by
  * `seq`; occurrence 1 keeps `base + ext`, occurrence n gets
  * `base_{n-1} + ext`. (Cross-base collisions with a pre-existing
  * literal `x_1` are theoretical — the reference would hit the same
  * ambiguity — so observable behavior on real data matches.)
  */
object UniqueNames {

  /** Input must have `doc_id`, `seq`, `base`, `ext` columns; adds
    * `filename`. */
  def apply(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id", "base", "ext").orderBy("seq")
    df.withColumn("occ", row_number().over(w))
      .withColumn("filename",
        when(col("occ") === 1, concat(col("base"), col("ext")))
          .otherwise(concat(col("base"), lit("_"), col("occ") - 1, col("ext"))))
      .drop("occ")
  }
}
