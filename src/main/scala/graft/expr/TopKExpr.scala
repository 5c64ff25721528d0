package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer over primitive parallel arrays — the
  * aggregation state of [[TopK]]. Kept sorted by (score desc, id asc);
  * insertion is an O(1) floor reject + O(k) `arraycopy`, merge is a
  * k-vs-k sorted merge. No per-row object allocation: the arrays are
  * sized once at `k` and reused for the life of the group.
  */
final class TopKState(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  @inline private def before(s: Double, i: Long, j: Int): Boolean =
    s > scores(j) || (s == scores(j) && i < ids(j))

  def insert(id: Long, score: Double): Unit = {
    if (n == k && !before(score, id, n - 1)) return // floor reject
    var pos = n
    var lo = 0
    var hi = n
    while (lo < hi) { // binary search for insertion point
      val mid = (lo + hi) >>> 1
      if (before(score, id, mid)) hi = mid else lo = mid + 1
    }
    pos = lo
    val last = math.min(n, k - 1)
    if (pos < last) {
      System.arraycopy(ids, pos, ids, pos + 1, last - pos)
      System.arraycopy(scores, pos, scores, pos + 1, last - pos)
    }
    if (pos < k) {
      ids(pos) = id
      scores(pos) = score
      if (n < k) n += 1
    }
  }

  /** Sorted k-vs-k merge of `other` into a fresh state. */
  def mergeWith(other: TopKState): TopKState = {
    if (other.n == 0) return this
    if (n == 0) return other
    val out = new TopKState(k)
    var i = 0; var j = 0
    while (out.n < k && (i < n || j < other.n)) {
      val takeLeft = j >= other.n || (i < n &&
        (scores(i) > other.scores(j) ||
          (scores(i) == other.scores(j) && ids(i) < other.ids(j))))
      if (takeLeft) { out.ids(out.n) = ids(i); out.scores(out.n) = scores(i); i += 1 }
      else { out.ids(out.n) = other.ids(j); out.scores(out.n) = other.scores(j); j += 1 }
      out.n += 1
    }
    out
  }
}

/** Native Catalyst grouped top-k: `top_k(id, score, k)` returns the k
  * highest-score `(id, score)` structs per group, score descending with
  * id ascending as the deterministic tie-break.
  *
  * This is the scale-right plan shape for grouped top-N — identical
  * algorithm to the typed [[TopKAggregator]] (k-bounded map-side
  * buffers; the shuffle carries ≤ k rows per group instead of the
  * window formulation's full per-group sort) — but it runs on
  * `InternalRow`s inside `ObjectHashAggregateExec`, so the per-input-row
  * path is two primitive reads and a bounded array insert: no product
  * encoder, no `Seq` allocation, no object ser/de per row. Buffers are
  * serialized (fixed 4 + 16k bytes) only at shuffle boundaries.
  *
  * Reference behavior: grouped "best N per key" result shape
  * (reference `scripts/` retrieval top-k); formulated Spark-first as a
  * first-class aggregate function registered in the session function
  * registry beside the vector expressions.
  */
case class TopK(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  private lazy val k: Int = kExpr.eval() match {
    case null => throw new IllegalArgumentException("top_k: k must be a non-null literal")
    case v: Number =>
      val i = v.intValue()
      require(i > 0, s"top_k: k must be positive, got $i")
      i
    case other => throw new IllegalArgumentException(s"top_k: bad k literal $other")
  }

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1), kExpr = newChildren(2))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      buf.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    }
    buf
  }

  override def merge(b1: TopKState, b2: TopKState): TopKState = b1.mergeWith(b2)

  override def eval(buf: TopKState): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val st = new TopKState(k)
    st.n = n
    var i = 0
    while (i < n) { st.ids(i) = bb.getLong(); st.scores(i) = bb.getDouble(); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "top_k"
}

object TopKExpr {

  /** Column-API entry: `topK($"id", $"score", 3)` as an aggregate Column. */
  def topK(id: Column, score: Column, k: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Bridge.toColumn(
      TopK(Bridge.toExpr(id), Bridge.toExpr(score), Literal(k)).toAggregateExpression())
  }

  /** SQL surface: `top_k(id, score, k)` — inputs cast to the canonical
    * (BIGINT, DOUBLE) so INT ids / DECIMAL scores work from SQL. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    def castTo(e: Expression, dt: DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt)
    Seq("top_k" -> (es => {
      require(es.length == 3, s"top_k expects 3 arguments, got ${es.length}")
      TopK(castTo(es(0), LongType), castTo(es(1), DoubleType), es(2))
        .toAggregateExpression()
    }))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
