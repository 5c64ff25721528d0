package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile-sketch state: a sorted bounded histogram of
  * (observed value, exact count) bins over primitive parallel arrays.
  *
  * While the number of DISTINCT values a sketch has seen stays at or
  * below its capacity `k`, the state is the exact value→count multiset
  * — quantiles are exact discrete quantiles, merges are exact multiset
  * sums, and the serialized form is CANONICAL (sorted by value), i.e.
  * independent of row order and partitioning. Past capacity the sketch
  * degrades gracefully: the adjacent bin pair with the smallest value
  * gap collapses into the heavier side's observed value (ties keep the
  * smaller value), so answers remain values that occurred in the data
  * and the total mass stays exact; only ranks blur, by at most the
  * collapsed mass around the query point (property-pinned in
  * `QSketchSpec`, same graceful-degrade contract style as the HLL
  * coupon-regime pin in `SketchedStatsSpec`).
  *
  * This mirrors the exactness structure of Spark's DataSketches HLL
  * trio used by [[graft.pipeline.SketchedStats]]: a bounded-domain
  * column keeps every cell exact at ANY scale factor, which is what
  * makes a cross-engine SQL oracle valid without a data-dependent
  * precondition.
  */
final class QSketchState(var k: Int) {
  var n: Int = 0
  var values: Array[Double] = new Array[Double](math.max(k + 1, 1))
  var counts: Array[Long] = new Array[Long](math.max(k + 1, 1))

  def total: Long = {
    var s = 0L; var i = 0
    while (i < n) { s += counts(i); i += 1 }
    s
  }

  private def ensureCapacity(): Unit = {
    if (values.length < k + 1) {
      values = java.util.Arrays.copyOf(values, k + 1)
      counts = java.util.Arrays.copyOf(counts, k + 1)
    }
  }

  /** First index with values(i) >= v (so equal values collapse). */
  private def lowerBound(v: Double): Int = {
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (values(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def insert(v: Double, c: Long): Unit = {
    ensureCapacity()
    val pos = lowerBound(v)
    if (pos < n && values(pos) == v) { counts(pos) += c; return }
    System.arraycopy(values, pos, values, pos + 1, n - pos)
    System.arraycopy(counts, pos, counts, pos + 1, n - pos)
    values(pos) = v
    counts(pos) = c
    n += 1
    if (n > k && n > 1) compactOne()
  }

  /** Collapse the adjacent pair with the smallest value gap (ties →
    * leftmost); the survivor keeps the heavier side's observed value
    * (ties → the smaller value) and the summed count. */
  private def compactOne(): Unit = {
    var best = 0
    var bestGap = Double.PositiveInfinity
    var i = 0
    while (i < n - 1) {
      val gap = values(i + 1) - values(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    if (counts(best + 1) > counts(best)) values(best) = values(best + 1)
    counts(best) += counts(best + 1)
    System.arraycopy(values, best + 2, values, best + 1, n - best - 2)
    System.arraycopy(counts, best + 2, counts, best + 1, n - best - 2)
    n -= 1
  }

  /** Merge `other` into this (capacity adopts the larger `k`). In the
    * exact regime this is an exact multiset sum. */
  def mergeWith(other: QSketchState): QSketchState = {
    if (other.k > k) k = other.k
    var i = 0
    while (i < other.n) { insert(other.values(i), other.counts(i)); i += 1 }
    this
  }

  /** Smallest retained value whose cumulative count reaches
    * `max(1, ceil(q * total))` — the exact discrete quantile while no
    * compaction has occurred. Caller guards n > 0. */
  def quantile(q: Double): Double = {
    val rank = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L; var i = 0
    while (i < n) {
      cum += counts(i)
      if (cum >= rank) return values(i)
      i += 1
    }
    values(n - 1)
  }

  /** Canonical bytes: k, n, then (value, count) pairs sorted by value.
    * Partition-invariant in the exact regime — [[graft.pipeline.QuantileStats]]
    * relies on this for byte-identical carry-forward of untouched
    * cells. */
  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(k)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(values(i)); bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object QSketchState {
  def deserialize(bytes: Array[Byte]): QSketchState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new QSketchState(bb.getInt())
    val n = bb.getInt()
    st.n = n
    var i = 0
    while (i < n) { st.values(i) = bb.getDouble(); st.counts(i) = bb.getLong(); i += 1 }
    st
  }
}

/** `qsketch(value, k)` — aggregate a DOUBLE column into a serialized
  * [[QSketchState]] (BINARY). The partial/merge decomposition runs
  * map-side inside `ObjectHashAggregateExec`, so the shuffle carries
  * one ≤(8+16k)-byte buffer per group per partition instead of rows —
  * the same scale shape as `hll_sketch_agg`. */
case class QSketchAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchState] {

  private lazy val k: Int = kExpr.eval() match {
    case null => throw new IllegalArgumentException("qsketch: k must be a non-null literal")
    case v: Number =>
      val i = v.intValue()
      require(i > 0, s"qsketch: k must be positive, got $i")
      i
    case other => throw new IllegalArgumentException(s"qsketch: bad k literal $other")
  }

  /** Analysis-time rejection of a non-constant `k` (e.g. a column
    * passed from SQL): without this, `kExpr.eval()` with no input row
    * surfaces as a confusing executor-side error. (ADVICE r8.) */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch: k must be a constant (foldable) expression, got ${kExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QSketchState = new QSketchState(k)

  override def update(buf: QSketchState, input: InternalRow): QSketchState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double], 1L)
    buf
  }

  override def merge(b1: QSketchState, b2: QSketchState): QSketchState = b1.mergeWith(b2)

  override def eval(buf: QSketchState): Any = buf.serialized

  override def serialize(buf: QSketchState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): QSketchState =
    QSketchState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "qsketch"
}

/** `qsketch_merge(sketch)` — union serialized sketches (the
  * `hll_union_agg` analog; capacity adopts the largest input's `k`).
  * Exact multiset sum while inputs are in the exact regime. */
case class QSketchMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchState] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QSketchState = new QSketchState(0)

  override def update(buf: QSketchState, input: InternalRow): QSketchState = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(QSketchState.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: QSketchState, b2: QSketchState): QSketchState = b1.mergeWith(b2)

  override def eval(buf: QSketchState): Any = buf.serialized

  override def serialize(buf: QSketchState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): QSketchState =
    QSketchState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "qsketch_merge"
}

/** `qsketch_quantile(sketch, q)` — discrete quantile from a serialized
  * sketch: the smallest retained value whose cumulative count reaches
  * `ceil(q * n)`. NULL for an empty sketch. Runs on one row per group
  * (post-aggregation), so interpreted eval is fine. */
case class QSketchQuantile(sketch: Expression, qExpr: Expression)
  extends Expression with CodegenFallback {

  private lazy val q: Double = qExpr.eval() match {
    case null => throw new IllegalArgumentException("qsketch_quantile: q must be a non-null literal")
    case v: Number =>
      val d = v.doubleValue()
      require(d >= 0.0 && d <= 1.0, s"qsketch_quantile: q must be in [0,1], got $d")
      d
    case other => throw new IllegalArgumentException(s"qsketch_quantile: bad q literal $other")
  }

  /** Analysis-time rejection of a non-constant `q` — same contract as
    * [[QSketchAgg.checkInputDataTypes]]. (ADVICE r8.) */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!qExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"qsketch_quantile: q must be a constant (foldable) expression, got ${qExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(sketch, qExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), qExpr = newChildren(1))

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) return null
    val st = QSketchState.deserialize(b.asInstanceOf[Array[Byte]])
    if (st.n == 0) null else st.quantile(q)
  }

  override def prettyName: String = "qsketch_quantile"
}

/** `qsketch_ks(a, b)` — two-sample Kolmogorov–Smirnov statistic
  * between two serialized sketches: `max_v |CDF_a(v) − CDF_b(v)|`
  * over the union of retained values. In the exact regime (both
  * sketches within capacity) this is EXACTLY the classical two-sample
  * KS statistic of the underlying multisets — the scale-invariant
  * drift measure that complements PSI (no binning choice, detects
  * location/shape shifts PSI's fixed buckets can blur). Past capacity
  * the collapsed bins blur each CDF step by at most the collapsed
  * mass (the qsketch degrade contract). NULL if either side is empty.
  * Runs on one row per group pair (post-aggregation). */
case class QSketchKs(a: Expression, b: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(a, b)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val ab = a.eval(input); val bb = b.eval(input)
    if (ab == null || bb == null) return null
    val sa = QSketchState.deserialize(ab.asInstanceOf[Array[Byte]])
    val sb = QSketchState.deserialize(bb.asInstanceOf[Array[Byte]])
    val na = sa.total; val nb = sb.total
    if (na == 0L || nb == 0L) return null
    // merge-walk the two sorted bin arrays; track cumulative mass
    var i = 0; var j = 0
    var cumA = 0L; var cumB = 0L
    var ks = 0.0
    while (i < sa.n || j < sb.n) {
      val va = if (i < sa.n) sa.values(i) else Double.PositiveInfinity
      val vb = if (j < sb.n) sb.values(j) else Double.PositiveInfinity
      if (va <= vb) { cumA += sa.counts(i); i += 1 }
      if (vb <= va) { cumB += sb.counts(j); j += 1 }
      val d = math.abs(cumA.toDouble / na - cumB.toDouble / nb)
      if (d > ks) ks = d
    }
    ks
  }

  override def prettyName: String = "qsketch_ks"
}

/** `qsketch_n(sketch)` — total (exact) mass of a serialized sketch;
  * counts are never approximated, only value resolution is. */
case class QSketchN(sketch: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) null else QSketchState.deserialize(b.asInstanceOf[Array[Byte]]).total
  }

  override def prettyName: String = "qsketch_n"
}

/** Column API + SQL registration for the quantile-sketch family —
  * `qsketch` / `qsketch_merge` / `qsketch_quantile` / `qsketch_n`, the
  * same partial/union/finalize trio shape as Spark's DataSketches HLL
  * functions, which is exactly what lets [[graft.pipeline.BucketedView]]
  * maintain per-(bucket, group) quantile cells incrementally (deletes
  * handled by touched-bucket re-sketch — see
  * [[graft.pipeline.QuantileStats]]).
  *
  * Reference capability analog: the reference's eval/statistics paths
  * report score distributions (`ragas` summary stats); re-expressed
  * Spark-first as a mergeable, shuffle-bounded sketch rather than a
  * full sort per group.
  */
object QuantileSketchExpr {

  def qsketch(value: Column, k: Int): Column =
    Bridge.toColumn(
      QSketchAgg(Cast(Bridge.toExpr(value), DoubleType), Literal(k))
        .toAggregateExpression())

  def qsketchMerge(sketch: Column): Column =
    Bridge.toColumn(QSketchMergeAgg(Bridge.toExpr(sketch)).toAggregateExpression())

  def qsketchQuantile(sketch: Column, q: Double): Column =
    Bridge.toColumn(QSketchQuantile(Bridge.toExpr(sketch), Literal(q)))

  def qsketchN(sketch: Column): Column =
    Bridge.toColumn(QSketchN(Bridge.toExpr(sketch)))

  def qsketchKs(a: Column, b: Column): Column =
    Bridge.toColumn(QSketchKs(Bridge.toExpr(a), Bridge.toExpr(b)))

  /** SQL surface (values cast to DOUBLE so INT/BIGINT columns work
    * from SQL). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = {
    def castTo(e: Expression, dt: DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt)
    Seq(
      "qsketch" -> (es => {
        require(es.length == 2, s"qsketch expects 2 arguments, got ${es.length}")
        QSketchAgg(castTo(es(0), DoubleType), es(1)).toAggregateExpression()
      }),
      "qsketch_merge" -> (es => {
        require(es.length == 1, s"qsketch_merge expects 1 argument, got ${es.length}")
        QSketchMergeAgg(es(0)).toAggregateExpression()
      }),
      "qsketch_quantile" -> (es => {
        require(es.length == 2, s"qsketch_quantile expects 2 arguments, got ${es.length}")
        QSketchQuantile(es(0), castTo(es(1), DoubleType))
      }),
      "qsketch_n" -> (es => {
        require(es.length == 1, s"qsketch_n expects 1 argument, got ${es.length}")
        QSketchN(es(0))
      }),
      "qsketch_ks" -> (es => {
        require(es.length == 2, s"qsketch_ks expects 2 arguments, got ${es.length}")
        QSketchKs(es(0), es(1))
      }))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
