package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST4 — stream-stream joins. Two live streams equi-joined on a key
  * with an event-time interval bound (the attribution shape: a click
  * joins the view that preceded it by at most `within`).
  *
  * Both sides carry watermarks and the join condition bounds the
  * right timestamp to `[leftTs, leftTs + within]` — together these let
  * the state store evict rows once they can no longer match, so state
  * is O(events inside the watermark+interval horizon), not O(stream).
  * An unbounded stream-stream join (no time bound) would grow state
  * forever at 100 TB/day; this operator makes the bound part of the
  * API rather than a caller obligation.
  *
  * Inner interval joins emit in append mode; the result is exactly the
  * batch join under the same condition (asserted stream≡batch in
  * `StreamJoinSpec`).
  */
object StreamJoins {

  /** Watermarked interval equi-join:
    * `left.key == right.key AND right.ts ∈ [left.ts, left.ts + within]`.
    *
    * @param within   SQL interval literal body, e.g. `"10 minutes"`
    * @param leftWatermark / rightWatermark  max lateness per side; also
    *   the state-retention horizon (shorter = less state, more dropped
    *   late data)
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String,
      leftWatermark: String = "10 minutes",
      rightWatermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark).alias("l")
    val r = right.withWatermark(rightTs, rightWatermark).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND r.$rightTs >= l.$leftTs " +
        s"AND r.$rightTs <= l.$leftTs + interval $within"))
      .drop(r(key))
  }
}
