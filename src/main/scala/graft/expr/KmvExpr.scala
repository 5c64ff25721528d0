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

/** K-minimum-values (KMV) distinct-set sketch — the mergeable sketch
  * family member that answers SET-OVERLAP questions (intersection /
  * union / Jaccard between two sketched sets), which neither HLL
  * (union-only distinct), Bloom (membership), nor the quantile sketch
  * can: KMV's retained sample is a uniform bottom-k of the hashed
  * universe, so two sketches can be COMPARED (Beyer et al., SIGMOD'07
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations").
  *
  * State: the `k` smallest DISTINCT 64-bit hashes seen, in unsigned
  * order, plus a `saturated` flag. Both are order- and
  * partition-independent functions of the input SET (the bottom-k of a
  * set does not depend on arrival order; `saturated` ⟺ distinct > k),
  * so the serialized form is CANONICAL — byte-identical under any
  * partitioning and merge tree, which is what lets
  * [[graft.pipeline.BucketedView]] carry unchanged cells forward by
  * reference.
  *
  * Exactness contract (the family's oracle-validity trick, same shape
  * as the HLL coupon regime and the qsketch exact regime): while
  * `saturated` is false the state IS the complete distinct hash set —
  * distinct counts and pairwise intersection/union/Jaccard are EXACT,
  * and with a bounded input domain they stay exact at ANY scale
  * factor. Past saturation the standard KMV estimators take over with
  * relative error ~1/√(k−2) (property-pinned in `KmvSpec`).
  *
  * 100 TB role: cross-split / cross-corpus contamination and overlap
  * measurement WITHOUT a join — each split reduces map-side to one
  * ≤(9+8k)-byte buffer inside `ObjectHashAggregateExec`; comparing
  * two corpora is then a scalar over two binaries instead of a
  * shuffle of their token sets. Update hot path is one unsigned
  * compare against the current kth-min (no allocation, no set probe)
  * once the sketch is full and the stream hash exceeds it.
  */
final class KmvState(var k: Int) {
  /** Binary max-heap (unsigned order) of the retained hashes —
    * `heap(0)` is the current kth-min, the O(1) reject threshold. */
  private var heap: Array[Long] = new Array[Long](math.min(k, 16))
  private var heapSize: Int = 0
  var saturated: Boolean = false

  /** Open-addressing membership set over the retained hashes (KMV is a
    * DISTINCT sketch — re-inserting a retained hash must be a no-op).
    * Hand-rolled on primitive arrays: no boxing on the update path.
    * `slotUsed` disambiguates the 0L hash from an empty slot. */
  private var slots: Array[Long] = new Array[Long](32)
  private var slotUsed: Array[Boolean] = new Array[Boolean](32)
  private var slotCount: Int = 0

  def size: Int = heapSize

  private def cmpU(a: Long, b: Long): Int = java.lang.Long.compareUnsigned(a, b)

  private def setContains(h: Long): Boolean = {
    val mask = slots.length - 1
    var i = (java.lang.Long.hashCode(h) & 0x7fffffff) & mask
    while (slotUsed(i)) {
      if (slots(i) == h) return true
      i = (i + 1) & mask
    }
    false
  }

  private def setAdd(h: Long): Unit = {
    if ((slotCount + 1) * 4 > slots.length * 3) growSet()
    val mask = slots.length - 1
    var i = (java.lang.Long.hashCode(h) & 0x7fffffff) & mask
    while (slotUsed(i)) i = (i + 1) & mask
    slots(i) = h; slotUsed(i) = true; slotCount += 1
  }

  private def setRemove(h: Long): Unit = {
    // Standard open-addressing deletion: re-insert the displaced run.
    val mask = slots.length - 1
    var i = (java.lang.Long.hashCode(h) & 0x7fffffff) & mask
    while (slotUsed(i) && slots(i) != h) i = (i + 1) & mask
    if (!slotUsed(i)) return
    slotUsed(i) = false; slotCount -= 1
    var j = (i + 1) & mask
    while (slotUsed(j)) {
      val v = slots(j)
      slotUsed(j) = false; slotCount -= 1
      setAdd(v)
      j = (j + 1) & mask
    }
  }

  private def growSet(): Unit = {
    val oldSlots = slots; val oldUsed = slotUsed
    slots = new Array[Long](oldSlots.length * 2)
    slotUsed = new Array[Boolean](oldSlots.length * 2)
    slotCount = 0
    var i = 0
    while (i < oldSlots.length) {
      if (oldUsed(i)) setAdd(oldSlots(i))
      i += 1
    }
  }

  private def heapPush(h: Long): Unit = {
    if (heapSize == heap.length)
      heap = java.util.Arrays.copyOf(heap,
        math.min(math.max(heap.length.toLong * 2, 16L), k.toLong).toInt)
    var i = heapSize
    heap(i) = h; heapSize += 1
    while (i > 0 && cmpU(heap((i - 1) >> 1), heap(i)) < 0) {
      val p = (i - 1) >> 1
      val t = heap(p); heap(p) = heap(i); heap(i) = t
      i = p
    }
  }

  private def heapPopMax(): Long = {
    val m = heap(0)
    heapSize -= 1
    heap(0) = heap(heapSize)
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var big = i
      if (l < heapSize && cmpU(heap(l), heap(big)) > 0) big = l
      if (r < heapSize && cmpU(heap(r), heap(big)) > 0) big = r
      if (big == i) return m
      val t = heap(big); heap(big) = heap(i); heap(i) = t
      i = big
    }
    m
  }

  def insert(h: Long): Unit = {
    if (heapSize == k) {
      val c = cmpU(h, heap(0))
      if (c > 0) { saturated = true; return } // beyond kth-min: new distinct, dropped
      if (c == 0) return                      // == kth-min: already retained
      if (setContains(h)) return
      setRemove(heapPopMax())
      saturated = true                        // a distinct value was displaced
      heapPush(h); setAdd(h)
    } else {
      if (setContains(h)) return
      heapPush(h); setAdd(h)
    }
  }

  /** Union: insert every retained hash of `other`; an incomplete input
    * taints the union even if everything fits. Capacity adopts the
    * SMALLER k when they differ (a bottom-k₁ ∪ bottom-k₂ is only a
    * faithful bottom-min(k₁,k₂) of the union) — callers in this
    * engine always merge same-k sketches; the merge-aggregate buffer
    * starts unbounded and adopts its first input's k. */
  def mergeWith(other: KmvState): KmvState = {
    if (other.k < k) {
      k = other.k
      while (heapSize > k) { setRemove(heapPopMax()); saturated = true }
    }
    var i = 0
    while (i < other.heapSize) { insert(other.heap(i)); i += 1 }
    saturated = saturated || other.saturated
    this
  }

  /** Retained hashes in ascending unsigned order — the canonical form. */
  def sortedValues: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, heapSize)
    // unsigned sort: flip the sign bit, sort signed, flip back
    var i = 0
    while (i < out.length) { out(i) ^= Long.MinValue; i += 1 }
    java.util.Arrays.sort(out)
    i = 0
    while (i < out.length) { out(i) ^= Long.MinValue; i += 1 }
    out
  }

  /** Distinct-count estimate: exact size when the sketch is complete,
    * else the standard KMV estimator (k−1)/u₍k₎ with hashes mapped to
    * (0,1] by their unsigned value. */
  def distinctEstimate: Double =
    if (!saturated) heapSize.toDouble
    else {
      val kthMin = heap(0) // max of retained = kth smallest overall
      val u = (uToUnit(kthMin))
      (heapSize - 1).toDouble / u
    }

  private def uToUnit(h: Long): Double =
    // unsigned h in [0, 2^64-1] → (0, 1]
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  def serialized: Array[Byte] = {
    val vs = sortedValues
    val bb = ByteBuffer.allocate(9 + 8 * vs.length)
    bb.putInt(k)
    bb.put(if (saturated) 1.toByte else 0.toByte)
    bb.putInt(vs.length)
    var i = 0
    while (i < vs.length) { bb.putLong(vs(i)); i += 1 }
    bb.array()
  }
}

object KmvState {
  def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KmvState(bb.getInt())
    val sat = bb.get() == 1
    val n = bb.getInt()
    var i = 0
    while (i < n) { st.insert(bb.getLong()); i += 1 }
    st.saturated = sat
    st
  }

  /** Sorted retained hashes + flags without rebuilding heap/set — the
    * scalar-side fast path (pair comparisons only need the arrays). */
  def readSorted(bytes: Array[Byte]): (Int, Boolean, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val sat = bb.get() == 1
    val n = bb.getInt()
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = bb.getLong(); i += 1 }
    (k, sat, vs)
  }

  private def uToUnit(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  /** Pairwise overlap stats of two serialized sketches:
    * (intersection, union, jaccard, exact). Exact (plain sorted-merge
    * set algebra) when BOTH sketches are complete; otherwise the
    * Beyer et al. ρ-estimator over the bottom-min(k) of the union. */
  def pairStats(aBytes: Array[Byte], bBytes: Array[Byte]): (Double, Double, Double, Boolean) = {
    val (ka, satA, va) = readSorted(aBytes)
    val (kb, satB, vb) = readSorted(bBytes)
    if (!satA && !satB) {
      // Complete sets: exact sorted-merge intersection/union.
      var i = 0; var j = 0; var inter = 0L
      while (i < va.length && j < vb.length) {
        val c = java.lang.Long.compareUnsigned(va(i), vb(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      val union = va.length.toLong + vb.length - inter
      val jacc = if (union == 0) 0.0 else inter.toDouble / union
      (inter.toDouble, union.toDouble, jacc, true)
    } else {
      val kc = math.min(ka, kb)
      // Bottom-kc of the union of retained values (sorted merge, dedup).
      val cap = math.min(kc.toLong, va.length.toLong + vb.length).toInt
      val s = new Array[Long](cap)
      var i = 0; var j = 0; var n = 0
      var rho = 0
      while (n < cap && (i < va.length || j < vb.length)) {
        val takeA = j >= vb.length ||
          (i < va.length && java.lang.Long.compareUnsigned(va(i), vb(j)) <= 0)
        val inBoth = i < va.length && j < vb.length && va(i) == vb(j)
        val v = if (takeA) va(i) else vb(j)
        if (inBoth) { i += 1; j += 1; rho += 1 }
        else if (takeA) i += 1
        else j += 1
        s(n) = v; n += 1
      }
      if (n == 0) return (0.0, 0.0, 0.0, false)
      val jacc = rho.toDouble / n
      // Union distinct estimate off the bottom-n threshold. (This arm
      // only runs when at least one side is saturated, so the merged
      // bottom-n is always an estimator sample, never a complete set.)
      val unionEst = (n - 1).toDouble / uToUnit(s(n - 1))
      (jacc * unionEst, unionEst, jacc, false)
    }
  }
}

/** `kmv_agg(hash, k)` — fold a LONG hash column into one serialized
  * [[KmvState]] (BINARY). Partial/merge runs map-side inside
  * `ObjectHashAggregateExec`: the shuffle carries one ≤(9+8k)-byte
  * buffer per group per partition, never the hashed set. */
case class KmvAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  private lazy val k: Int = kExpr.eval() match {
    case null => throw new IllegalArgumentException("kmv_agg: k must be a non-null literal")
    case v: Number =>
      val i = v.intValue()
      require(i >= 2, s"kmv_agg: k must be >= 2, got $i")
      i
    case other => throw new IllegalArgumentException(s"kmv_agg: bad k literal $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_agg: k must be a constant (foldable) expression, got ${kExpr.sql}")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_agg: hash argument must be BIGINT, got ${child.dataType.simpleString}")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"kmv_agg: k must be integral, got ${kExpr.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvState, b2: KmvState): KmvState = b1.mergeWith(b2)

  override def eval(buf: KmvState): Any = buf.serialized

  override def serialize(buf: KmvState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): KmvState = KmvState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_agg"
}

/** `kmv_merge(sketch)` — union serialized sketches (the
  * `hll_union_agg` analog). Exact set union while inputs are complete. */
case class KmvMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_merge: argument must be BINARY (a serialized KMV sketch), " +
          s"got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvState = new KmvState(Int.MaxValue)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val raw = child.eval(input)
    if (raw != null) buf.mergeWith(KmvState.deserialize(raw.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: KmvState, b2: KmvState): KmvState = b1.mergeWith(b2)

  override def eval(buf: KmvState): Any = buf.serialized

  override def serialize(buf: KmvState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): KmvState = KmvState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_merge"
}

/** Base for the post-aggregation scalars — they run on one row per
  * group, so interpreted eval is fine. All inputs must be BINARY
  * (serialized sketches); anything else is an analysis-time error,
  * not a mid-job ClassCastException. */
abstract class KmvScalar extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.zipWithIndex.collect {
      case (c, i) if c.dataType != BinaryType => s"arg ${i + 1}: ${c.dataType.simpleString}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: sketch argument(s) must be BINARY (a serialized KMV sketch); got " +
        bad.mkString(", "))
  }
}

/** `kmv_n(sketch)` — retained-hash count (= exact distinct count while
  * the sketch is complete). */
case class KmvN(sketch: Expression) extends KmvScalar {
  override def children: Seq[Expression] = Seq(sketch)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(sketch = newChildren(0))
  override def dataType: DataType = LongType
  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) null
    else KmvState.readSorted(b.asInstanceOf[Array[Byte]])._3.length.toLong
  }
  override def prettyName: String = "kmv_n"
}

/** `kmv_exact(sketch)` — true while the sketch retains its COMPLETE
  * distinct set (answers off it are exact, not estimates). Lets a
  * query EMIT its own oracle-validity bit: if data ever outgrows k the
  * hash comparison fails loudly instead of silently comparing an
  * estimate against an exact oracle. */
case class KmvExact(sketch: Expression) extends KmvScalar {
  override def children: Seq[Expression] = Seq(sketch)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(sketch = newChildren(0))
  override def dataType: DataType = BooleanType
  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) null
    else !KmvState.readSorted(b.asInstanceOf[Array[Byte]])._2
  }
  override def prettyName: String = "kmv_exact"
}

/** `kmv_distinct(sketch)` — distinct-count estimate (exact while
  * complete, (k−1)/u₍k₎ past saturation). */
case class KmvDistinct(sketch: Expression) extends KmvScalar {
  override def children: Seq[Expression] = Seq(sketch)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(sketch = newChildren(0))
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) null
    else KmvState.deserialize(b.asInstanceOf[Array[Byte]]).distinctEstimate
  }
  override def prettyName: String = "kmv_distinct"
}

/** Shared shape of the three pairwise scalars. */
abstract class KmvPairScalar extends KmvScalar {
  def a: Expression
  def b: Expression
  override def children: Seq[Expression] = Seq(a, b)
  override def dataType: DataType = DoubleType
  protected def pick(stats: (Double, Double, Double, Boolean)): Any
  override def eval(input: InternalRow): Any = {
    val ab = a.eval(input); val bb = b.eval(input)
    if (ab == null || bb == null) null
    else pick(KmvState.pairStats(ab.asInstanceOf[Array[Byte]], bb.asInstanceOf[Array[Byte]]))
  }
}

/** `kmv_intersect(a, b)` — |A∩B| (exact while both complete). */
case class KmvIntersect(a: Expression, b: Expression) extends KmvPairScalar {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
  override protected def pick(s: (Double, Double, Double, Boolean)): Any = s._1
  override def prettyName: String = "kmv_intersect"
}

/** `kmv_union_n(a, b)` — |A∪B| (exact while both complete). */
case class KmvUnionN(a: Expression, b: Expression) extends KmvPairScalar {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
  override protected def pick(s: (Double, Double, Double, Boolean)): Any = s._2
  override def prettyName: String = "kmv_union_n"
}

/** `kmv_jaccard(a, b)` — |A∩B|/|A∪B| (exact while both complete). */
case class KmvJaccard(a: Expression, b: Expression) extends KmvPairScalar {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
  override protected def pick(s: (Double, Double, Double, Boolean)): Any = s._3
  override def prettyName: String = "kmv_jaccard"
}

/** Column API + SQL registration for the KMV family — the fourth
  * mergeable-sketch trio (after HLL, qsketch, Bloom): `kmv_agg` /
  * `kmv_merge` partial-union aggregates plus the post-aggregation
  * scalars `kmv_n` / `kmv_exact` / `kmv_distinct` / `kmv_intersect` /
  * `kmv_union_n` / `kmv_jaccard`.
  *
  * Reference capability analog: the reference's eval pipeline needs
  * train/eval separation guarantees (`make_ragas_test.py` builds its
  * testset from the same corpus it indexes); at 100 TB the overlap
  * audit between splits/corpora must not join their token sets —
  * KMV reduces each side to one bounded buffer first.
  */
object KmvExpr {

  def kmvAgg(hash: Column, k: Int): Column =
    Bridge.toColumn(KmvAgg(Bridge.toExpr(hash), Literal(k)).toAggregateExpression())

  def kmvMerge(sketch: Column): Column =
    Bridge.toColumn(KmvMergeAgg(Bridge.toExpr(sketch)).toAggregateExpression())

  def kmvN(sketch: Column): Column = Bridge.toColumn(KmvN(Bridge.toExpr(sketch)))
  def kmvExact(sketch: Column): Column = Bridge.toColumn(KmvExact(Bridge.toExpr(sketch)))
  def kmvDistinct(sketch: Column): Column = Bridge.toColumn(KmvDistinct(Bridge.toExpr(sketch)))
  def kmvIntersect(a: Column, b: Column): Column =
    Bridge.toColumn(KmvIntersect(Bridge.toExpr(a), Bridge.toExpr(b)))
  def kmvUnionN(a: Column, b: Column): Column =
    Bridge.toColumn(KmvUnionN(Bridge.toExpr(a), Bridge.toExpr(b)))
  def kmvJaccard(a: Column, b: Column): Column =
    Bridge.toColumn(KmvJaccard(Bridge.toExpr(a), Bridge.toExpr(b)))

  val functions: Seq[(String, Seq[Expression] => Expression)] = {
    def castTo(e: Expression, dt: DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt)
    Seq(
      "kmv_agg" -> (es => {
        require(es.length == 2, s"kmv_agg expects 2 arguments, got ${es.length}")
        KmvAgg(castTo(es(0), LongType), es(1)).toAggregateExpression()
      }),
      "kmv_merge" -> (es => {
        require(es.length == 1, s"kmv_merge expects 1 argument, got ${es.length}")
        KmvMergeAgg(es(0)).toAggregateExpression()
      }),
      "kmv_n" -> (es => { require(es.length == 1, "kmv_n expects 1 argument"); KmvN(es(0)) }),
      "kmv_exact" -> (es => { require(es.length == 1, "kmv_exact expects 1 argument"); KmvExact(es(0)) }),
      "kmv_distinct" -> (es => { require(es.length == 1, "kmv_distinct expects 1 argument"); KmvDistinct(es(0)) }),
      "kmv_intersect" -> (es => { require(es.length == 2, "kmv_intersect expects 2 arguments"); KmvIntersect(es(0), es(1)) }),
      "kmv_union_n" -> (es => { require(es.length == 2, "kmv_union_n expects 2 arguments"); KmvUnionN(es(0), es(1)) }),
      "kmv_jaccard" -> (es => { require(es.length == 2, "kmv_jaccard expects 2 arguments"); KmvJaccard(es(0), es(1)) }))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
