package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a bounded top-k per group — the custom
  * UDAF seam from SURVEY §2.10.
  *
  * Grouped top-k via aggregation beats the `row_number`-window
  * formulation at scale: the window needs every group fully sorted
  * (shuffle of all rows, per-partition sort), while this aggregator
  * keeps a k-element buffer per group on the map side and merges
  * k-vs-k — the shuffle carries at most `k × #groups × width` bytes
  * regardless of input size. Ordering: score descending, id ascending
  * as the deterministic tie-break.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0)

  override def zero: Seq[(Long, Double)] = Seq.empty

  private def cap(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortBy { case (id, score) => (-score, id) }.take(k)

  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    cap(b :+ a)

  override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    cap(b1 ++ b2)

  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
}
