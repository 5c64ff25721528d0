package graft.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: at most `k` (item → counter) entries
  * plus the number of decrement rounds applied. Invariants (Misra–Gries
  * 1982; merge rule from Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *  - `est(x) ≤ true(x) ≤ est(x) + rounds` for every item (absent ⇒ est 0);
  *  - `rounds ≤ N / (k+1)` where N is the total items consumed, and this
  *    bound SURVIVES arbitrary merge trees — so map-side partials combine
  *    into a summary with the same guarantee;
  *  - any item with `true(x) > N/(k+1)` is guaranteed present;
  *  - if every partial ever holds ≤ k distinct items, no decrement fires
  *    anywhere and the summary is EXACT counts under any partitioning.
  */
final class MGState(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  var rounds: Long = 0L

  def add(item: String): Unit = {
    // live entries are always ≥ 1, so 0 == absent (getOrDefault avoids
    // the null-unboxing trap of java.util.HashMap.get under Scala Long)
    val cur = counts.getOrDefault(item, 0L)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // decrement-all round: k counters and the incoming item each give
      // up one occurrence — k+1 total, hence the N/(k+1) error bound.
      rounds += 1L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries combine: sum counters, then if over capacity
    * subtract the (k+1)-th largest value from all (dropping ≤0) — that
    * subtraction is itself a batched decrement round of size `sub`. */
  def mergeWith(other: MGState): MGState = {
    val out = new MGState(k)
    out.rounds = rounds + other.rounds
    out.counts.putAll(counts)
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = out.counts.getOrDefault(e.getKey, 0L)
      out.counts.put(e.getKey, cur + e.getValue)
    }
    if (out.counts.size > k) {
      val vals = new Array[Long](out.counts.size)
      var i = 0
      val vi = out.counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      out.rounds += sub
      val oi = out.counts.entrySet().iterator()
      while (oi.hasNext) {
        val e = oi.next()
        if (e.getValue <= sub) oi.remove() else e.setValue(e.getValue - sub)
      }
    }
    out
  }
}

/** Native grouped heavy-hitters sketch: `heavy_hitters(item, k)` returns
  * `array<struct<item, count_lo, count_hi>>` sorted by (count_lo desc,
  * item asc), where `[count_lo, count_hi]` brackets the true frequency.
  *
  * The scale shape mirrors [[TopK]]/[[BloomAgg]]: map-side partials are
  * k-bounded, only O(k) state crosses the shuffle per group, and the
  * merge preserves the ε = N/(k+1) guarantee — vs the exact formulation's
  * full (group, item)-keyed shuffle. With k chosen ≥ the group's distinct
  * cardinality the sketch degrades to exact counts (count_lo == count_hi),
  * which is what the DuckDB oracle pins at the gate's scale factor.
  *
  * Reference behavior: the reference's counter/top-terms reporting shapes
  * (BASELINE.md quality tallies), generalized to a mergeable sketch.
  */
case class HeavyHitters(
    itemExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] {

  private lazy val k: Int = kExpr.eval() match {
    case null => throw new IllegalArgumentException("heavy_hitters: k must be a non-null literal")
    case v: Number =>
      val i = v.intValue()
      require(i > 0, s"heavy_hitters: k must be positive, got $i")
      i
    case other => throw new IllegalArgumentException(s"heavy_hitters: bad k literal $other")
  }

  override def children: Seq[Expression] = Seq(itemExpr, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), kExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lo", LongType, nullable = false),
      StructField("count_hi", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGState = new MGState(k)

  override def update(buf: MGState, input: InternalRow): MGState = {
    val item = itemExpr.eval(input)
    if (item != null) buf.add(item.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: MGState, b2: MGState): MGState = b1.mergeWith(b2)

  override def eval(buf: MGState): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Long)] {
      def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    val rows = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      val (item, c) = entries(i)
      rows(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c, c + buf.rounds))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MGState): Array[Byte] = {
    var bytes = 4 + 8
    val items = new Array[(Array[Byte], Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items(i) = (b, e.getValue)
      bytes += 4 + b.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.length)
    bb.putLong(buf.rounds)
    i = 0
    while (i < items.length) {
      val (b, c) = items(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val st = new MGState(k)
    st.rounds = bb.getLong()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      st.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersExpr {

  /** Column-API entry: `heavyHitters($"item", 256)` as an aggregate Column. */
  def heavyHitters(item: Column, k: Int): Column =
    Bridge.toColumn(
      HeavyHitters(Cast(Bridge.toExpr(item), StringType), Literal(k))
        .toAggregateExpression())

  /** SQL surface: `heavy_hitters(item, k)`. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "heavy_hitters" -> (es => {
      require(es.length == 2, s"heavy_hitters expects 2 arguments, got ${es.length}")
      val item = if (es(0).dataType == StringType) es(0) else Cast(es(0), StringType)
      HeavyHitters(item, es(1)).toAggregateExpression()
    }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
