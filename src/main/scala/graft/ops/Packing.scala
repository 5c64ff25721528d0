package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: concatenate documents into
  * fixed-budget bins (token/char budget per training sequence), the
  * step between curation and tokenization.
  *
  * True bin packing is sequential; the distributed form used here is
  * *contiguous fill*: within each group (shard key — language, source),
  * documents in a deterministic order accumulate into a running total,
  * and a document belongs to the bin in which its first unit lands
  * (`floor(cumsum_exclusive / budget)`). Bins may overrun the budget by
  * at most one document — the downstream concatenate-then-chunk step
  * absorbs that, which is how packing is done in practice (greedy
  * best-fit would need global state and still overruns or pads).
  *
  * One window shuffle per call, partitioned by the group key —
  * parallelism scales with shard count, the 100 TB shape. Fully
  * deterministic (no RNG, stable order), so re-runs produce identical
  * bins and the DuckDB oracle (`doc_pack_bins`) checks it exactly.
  */
object Packing {

  /** Assign each row a `bin_id` within its group: contiguous fill in
    * `order` until the running `weight` total crosses a `budget`
    * multiple.
    *
    * @param group  shard column (bins never span groups)
    * @param order  deterministic fill order (must be unique per group)
    * @param weight per-row cost column (token count, char count)
    * @param budget bin capacity in `weight` units
    */
  def packContiguous(
      df: DataFrame,
      group: String,
      order: String,
      weight: String,
      budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(group)).orderBy(col(order))
    df.withColumn("__cum", sum(col(weight)).over(w))
      .withColumn("bin_id",
        floor((col("__cum") - col(weight)) / lit(budget.toDouble)))
      .drop("__cum")
  }

  /** Per-bin summary: document count and total weight. */
  def binStats(
      packed: DataFrame,
      group: String,
      weight: String): DataFrame =
    packed.groupBy(col(group), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weight)).cast("long").as("bin_weight"))
}
