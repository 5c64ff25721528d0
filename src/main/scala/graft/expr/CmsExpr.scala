package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the fifth mergeable-sketch family member, filling the one query
  * shape the others don't: POINT-QUERYABLE frequency estimates for
  * ARBITRARY keys (HLL: distinct only; Bloom: membership; KMV: set
  * overlap; qsketch: order statistics; Misra–Gries heavy hitters:
  * only the top keys survive — a key outside the retained set has no
  * answer). `est(x) ≥ true(x)` always (one-sided error), and
  * `est(x) ≤ true(x) + εN` with probability 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉.
  *
  * State: a d×w matrix of exact counts — a SUM of per-row increment
  * matrices, so merge is elementwise addition and the serialized form
  * is CANONICAL (partition- and merge-tree-invariant), like every
  * sketch in this family. The shuffle carries one (8 + 8·d·w)-byte
  * buffer per group (two int dims + the matrix), never the keys.
  *
  * Row hashes are multiply-shift (Dietzfelbinger et al.):
  * `slot_i(x) = ((x·A_i + B_i) mod 2^64) >>> (64 − log₂ w)` with odd
  * constants A_i, B_i derived from the row index — the SAME 64-bit
  * wraparound algebra the MinHash oracle replays in DuckDB HUGEINT,
  * so the whole sketch (and its estimates) is cross-engine
  * hash-comparable: `events_freq_cms` pins Spark's sketch against a
  * DuckDB replay of slots, counts and the min-over-rows estimate.
  */
object Cms {
  /** Odd multiply-shift constants per row — splitmix64 of the row
    * index, forced odd (a multiply-shift multiplier must be odd). */
  def aConst(i: Int): Long = mix(2 * i + 1) | 1L
  def bConst(i: Int): Long = mix(1000003 * (i + 1)) | 1L
  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def slot(x: Long, i: Int, logW: Int): Int =
    ((x * aConst(i) + bConst(i)) >>> (64 - logW)).toInt
}

final class CmsState(val w: Int, val d: Int) {
  require(w > 0 && (w & (w - 1)) == 0, s"cms width must be a power of two, got $w")
  require(d > 0 && d <= 16, s"cms depth must be in 1..16, got $d")
  private val logW = java.lang.Integer.numberOfTrailingZeros(w)
  val counts: Array[Long] = new Array[Long](d * w)

  def add(x: Long, by: Long = 1L): Unit = {
    var i = 0
    while (i < d) { counts(i * w + Cms.slot(x, i, logW)) += by; i += 1 }
  }

  def query(x: Long): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = counts(i * w + Cms.slot(x, i, logW))
      if (c < m) m = c
      i += 1
    }
    m
  }

  def mergeWith(o: CmsState): CmsState = {
    require(o.w == w && o.d == d,
      s"cms shape mismatch: ${w}x$d vs ${o.w}x${o.d}")
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    this
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * counts.length)
    bb.putInt(w); bb.putInt(d)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object CmsState {
  def deserialize(bytes: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new CmsState(bb.getInt(), bb.getInt())
    var i = 0
    while (i < st.counts.length) { st.counts(i) = bb.getLong(); i += 1 }
    st
  }
}

/** `cms_agg(hash, w, d)` — fold a LONG key column into one serialized
  * d×w count-min sketch. Partial/merge map-side in
  * `ObjectHashAggregateExec`; only the count matrix crosses the wire. */
case class CmsAgg(
    child: Expression,
    wExpr: Expression,
    dExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  private def literalInt(e: Expression, what: String): Int = e.eval() match {
    case null => throw new IllegalArgumentException(s"cms_agg: $what must be a non-null literal")
    case v: Number => v.intValue()
    case other => throw new IllegalArgumentException(s"cms_agg: bad $what literal $other")
  }
  private lazy val w: Int = literalInt(wExpr, "width")
  private lazy val d: Int = literalInt(dExpr, "depth")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg: key argument must be BIGINT, got ${child.dataType.simpleString}")
    else if (!wExpr.foldable || !dExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "cms_agg: width and depth must be constant (foldable) expressions")
    else if (!Seq(wExpr, dExpr).forall(e =>
        Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(e.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg: width/depth must be integral, got " +
          s"${wExpr.dataType.simpleString}/${dExpr.dataType.simpleString}")
    else if (wExpr.eval() == null || dExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "cms_agg: width and depth must be non-null literals")
    else {
      // the dims are foldable: evaluate them HERE so a bad shape fails
      // analysis once, not inside CmsState's require on every task
      val wv = wExpr.eval().asInstanceOf[Number].longValue()
      val dv = dExpr.eval().asInstanceOf[Number].intValue()
      if (wv <= 0 || wv > (1L << 30) || (wv & (wv - 1)) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"cms_agg: width must be a power of two in 1..2^30, got $wv")
      else if (dv <= 0 || dv > 16)
        TypeCheckResult.TypeCheckFailure(
          s"cms_agg: depth must be in 1..16, got $dv")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def children: Seq[Expression] = Seq(child, wExpr, dExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), wExpr = newChildren(1), dExpr = newChildren(2))

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CmsState = new CmsState(w, d)

  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: CmsState, b2: CmsState): CmsState = b1.mergeWith(b2)
  override def eval(buf: CmsState): Any = buf.serialized
  override def serialize(buf: CmsState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): CmsState = CmsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "cms_agg"
}

/** `cms_merge(sketch)` — elementwise-sum union of serialized sketches. */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_merge: argument must be BINARY (a serialized CMS), got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // shape adopts the first input
  override def createAggregationBuffer(): CmsState = null

  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val raw = child.eval(input)
    if (raw == null) buf
    else {
      val in = CmsState.deserialize(raw.asInstanceOf[Array[Byte]])
      if (buf == null) in else buf.mergeWith(in)
    }
  }

  override def merge(b1: CmsState, b2: CmsState): CmsState =
    if (b1 == null) b2 else if (b2 == null) b1 else b1.mergeWith(b2)

  override def eval(buf: CmsState): Any =
    if (buf == null) new CmsState(1, 1).serialized else buf.serialized

  override def serialize(buf: CmsState): Array[Byte] =
    if (buf == null) Array.empty else buf.serialized
  override def deserialize(bytes: Array[Byte]): CmsState =
    if (bytes.isEmpty) null else CmsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "cms_merge"
}

/** `cms_query(sketch, key)` — min-over-rows frequency estimate
  * (≥ true count always; ≤ true + εN w.h.p.). */
case class CmsQuery(sketch: Expression, key: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, key)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), key = newChildren(1))

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_query: sketch must be BINARY, got ${sketch.dataType.simpleString}")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_query: key must be BIGINT, got ${key.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input); val k = key.eval(input)
    if (s == null || k == null) null
    else CmsState.deserialize(s.asInstanceOf[Array[Byte]])
      .query(k.asInstanceOf[Long])
  }

  override def prettyName: String = "cms_query"
}

object CmsExpr {

  def cmsAgg(hash: Column, width: Int, depth: Int): Column =
    Bridge.toColumn(CmsAgg(Bridge.toExpr(hash), Literal(width), Literal(depth))
      .toAggregateExpression())

  def cmsMerge(sketch: Column): Column =
    Bridge.toColumn(CmsMergeAgg(Bridge.toExpr(sketch)).toAggregateExpression())

  def cmsQuery(sketch: Column, key: Column): Column =
    Bridge.toColumn(CmsQuery(Bridge.toExpr(sketch), Bridge.toExpr(key)))

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cms_agg" -> (es => {
      require(es.length == 3, s"cms_agg expects 3 arguments, got ${es.length}")
      CmsAgg(es(0), es(1), es(2)).toAggregateExpression()
    }),
    "cms_merge" -> (es => {
      require(es.length == 1, "cms_merge expects 1 argument")
      CmsMergeAgg(es(0)).toAggregateExpression()
    }),
    "cms_query" -> (es => {
      require(es.length == 2, "cms_query expects 2 arguments")
      CmsQuery(es(0), es(1))
    }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
