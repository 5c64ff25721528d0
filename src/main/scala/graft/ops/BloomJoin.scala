package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.BloomExpr

/** Bloom-prefiltered equi-join — the explicit, composable form of the
  * runtime filter Spark's AQE injects for some plans: build one Bloom
  * sketch of the dim side's join keys (a constant-size bit array —
  * [[graft.expr.BloomAgg]] OR-merges partials map-side, so the dim's
  * key set never crosses the wire), embed it as a literal probe on the
  * fact side, and drop non-matching fact rows AT THE SCAN, before the
  * join's shuffle ever sees them.
  *
  * Semantics: the probe has no false negatives, so the pre-filter
  * passes a SUPERSET of the joining rows (≤ fpp false positives), and
  * the real join behind it makes the result exact — equal to the
  * plain equi-join by construction (`q44_bloom_join` pins it against
  * a DuckDB plain-join replay; `BloomJoinSpec` pins the plan: the
  * probe filter sits below the fact-side exchange and prunes).
  *
  * 100 TB role: with a selective dim (the usual star shape — a
  * filtered dimension joining a huge fact), the fact-side shuffle
  * carries ~|matching| rows instead of the whole table. The sketch
  * build is one aggregation of the (small) dim; the driver holds only
  * the fixed-size sketch (the constant-bounded-sidecar pattern of
  * `Dedup.contaminationBloom`), never a key list — unlike an
  * `isin`-pushdown, this works for dims of any cardinality the fpp
  * budget allows.
  */
object BloomJoin {

  /** `fact ⋈ dim` on `factKey == dimKey` (inner or left_semi), with
    * the fact scan pre-filtered by a Bloom sketch of dim's keys.
    * Output matches the plain `fact.join(dim, ...)` of the same type
    * (for inner: dim's key column dropped — its value equals the fact
    * key). Keys are probed via `xxhash64`, so any orderable key type
    * works; a 64-bit hash collision inside the sketch only ever adds
    * a false positive, which the real join removes. */
  def prefiltered(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1L << 22,
      fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloom-prefiltered join supports inner/left_semi, got $joinType")
    // the only driver-side collect: the constant-size sketch itself
    val sketch = dim
      .select(xxhash64(col(dimKey)).as("__h"))
      .agg(BloomExpr.bloomAgg(col("__h"), expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pruned = fact.filter(
      BloomExpr.bloomMightContain(sketch, xxhash64(col(factKey))))
    val joined = pruned.join(dim, pruned(factKey) === dim(dimKey),
      joinType.toLowerCase match { case "leftsemi" => "left_semi"; case t => t })
    if (joinType.toLowerCase == "inner") joined.drop(dim(dimKey)) else joined
  }
}
