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
  *
  * The buffer is a case class under `Encoders.product`, so it shuffles
  * as a Tungsten struct (field-level access, compact rows) rather than
  * an opaque Kryo blob, and the buffer is kept sorted so `reduce` is a
  * bounded insertion (O(k) copy, no per-row sort) with an O(1) fast
  * reject when the incoming row can't make the top k.
  */
object TopKAggregator {
  case class Scored(id: Long, score: Double)
  case class TopKBuf(items: Seq[Scored])

  /** true iff `a` ranks strictly before `b`. */
  @inline private[expr] def before(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
}

class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), TopKAggregator.TopKBuf, TopKAggregator.TopKBuf] {
  import TopKAggregator._
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(b: TopKBuf, a: (Long, Double)): TopKBuf = {
    val item = Scored(a._1, a._2)
    val items = b.items
    // fast path: buffer full and the new row ranks after the current floor
    if (items.length >= k && !before(item, items.last)) b
    else {
      val i = items.indexWhere(x => before(item, x))
      val inserted =
        if (i < 0) items :+ item
        else (items.take(i) :+ item) ++ items.drop(i)
      TopKBuf(if (inserted.length > k) inserted.take(k) else inserted)
    }
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    // k-vs-k sorted merge, stops at k
    val x = b1.items; val y = b2.items
    val out = Seq.newBuilder[Scored]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && before(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
      n += 1
    }
    TopKBuf(out.result())
  }

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
