package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path (O-KNN, dedup).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — three lambda invocations and boxing per
  * float. These expressions evaluate over `ArrayData` primitives and
  * participate in whole-stage codegen (`doGenCode` emits a call into a
  * tight static scalar loop), which is what a 100 TB scan needs. Same
  * arithmetic as the HOF form: sequential left-to-right accumulation in
  * double. Inputs: `ARRAY<FLOAT>` or `ARRAY<DOUBLE>` (mixed allowed).
  */
object VectorExpressions {

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @inline private def getD(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Called from generated code. */
  def dotOf(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getD(a, aFloat, i) * getD(b, bFloat, i); i += 1 }
    s
  }

  /** Called from generated code. */
  def l2NormOf(a: ArrayData, isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = getD(a, isFloat, i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Called from generated code: cosine = dot / (||a|| * ||b||), 0 when
    * either norm is zero. */
  def cosineOf(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = getD(a, aFloat, i)
      val y = getD(b, bFloat, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Sum of element-wise products of two numeric arrays (as double). */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      dotOf(l.asInstanceOf[ArrayData], isFloat(left.dataType),
        r.asInstanceOf[ArrayData], isFloat(right.dataType))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val af = isFloat(left.dataType)
      val bf = isFloat(right.dataType)
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.expr.VectorExpressions.dotOf($a, $af, $b, $bf)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Euclidean (L2) norm of a numeric array. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      l2NormOf(v.asInstanceOf[ArrayData], isFloat(child.dataType))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val f = isFloat(child.dataType)
      defineCodeGen(ctx, ev, a => s"graft.expr.VectorExpressions.l2NormOf($a, $f)")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Cosine similarity of two numeric arrays. */
  case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      cosineOf(l.asInstanceOf[ArrayData], isFloat(left.dataType),
        r.asInstanceOf[ArrayData], isFloat(right.dataType))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val af = isFloat(left.dataType)
      val bf = isFloat(right.dataType)
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.expr.VectorExpressions.cosineOf($a, $af, $b, $bf)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  // ------------------------------------------------- int8 quantization

  /** Called from generated code: max |x| of a numeric array (the
    * symmetric int8 quantization scale). */
  def maxAbsOf(a: ArrayData, isFloat: Boolean): Double = {
    var m = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = math.abs(getD(a, isFloat, i)); if (x > m) m = x; i += 1 }
    m
  }

  /** Called from generated code: symmetric int8 quantization —
    * `round(x / scale * 127)` per element (zero vector → zero bytes). */
  def quantizeOf(a: ArrayData, isFloat: Boolean, scale: Double): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = math.round(getD(a, isFloat, i) / scale * 127.0).toByte
        i += 1
      }
    }
    out
  }

  /** Called from generated code: integer dot product of two signed-int8
    * vectors — the quantized-index scoring kernel (pure int ALU work,
    * 4× less memory traffic than the float path). */
  def byteDotOf(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Max |x| of a numeric array. */
  case class MaxAbs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      maxAbsOf(v.asInstanceOf[ArrayData], isFloat(child.dataType))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val f = isFloat(child.dataType)
      defineCodeGen(ctx, ev, a => s"graft.expr.VectorExpressions.maxAbsOf($a, $f)")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Symmetric int8 quantization of a numeric array at a given scale. */
  case class QuantizeInt8(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def nullSafeEval(v: Any, s: Any): Any =
      quantizeOf(v.asInstanceOf[ArrayData], isFloat(left.dataType),
        s.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val f = isFloat(left.dataType)
      defineCodeGen(ctx, ev, (a, s) =>
        s"graft.expr.VectorExpressions.quantizeOf($a, $f, $s)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  // ------------------------------------------------ product quantization

  /** Called from generated code: asymmetric-distance (ADC) scoring of a
    * PQ code against a per-query lookup table. `table` is the flat
    * m×ksub array of `dot(querySub_i, codebook_i(j))` built once per
    * query on the driver; the per-row work is `m` array lookups — no
    * float multiply at all, and the scanned payload is m bytes/vector
    * (64-d float = 256 B → 8 B at m=8). */
  def adcOf(code: Array[Byte], table: ArrayData, ksub: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < code.length) {
      s += table.getDouble(i * ksub + (code(i) & 0xFF))
      i += 1
    }
    s
  }

  /** ADC lookup-sum of a PQ code (BINARY) against a flat m×ksub double
    * table; `ksub` is the per-subspace codebook size (row stride). */
  case class PqAdc(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      adcOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[ArrayData], ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.expr.VectorExpressions.adcOf($a, $b, $ksub)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Integer dot product of two int8-quantized vectors (BINARY). */
  case class ByteDotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      byteDotOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.expr.VectorExpressions.byteDotOf($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  // ----------------------------------------------------- Column wrappers

  private def e(c: Column): Expression = Bridge.toExpr(c)

  def dot(a: Column, b: Column): Column = Bridge.toColumn(DotProduct(e(a), e(b)))
  def l2Norm(a: Column): Column = Bridge.toColumn(L2Norm(e(a)))
  def cosine(a: Column, b: Column): Column = Bridge.toColumn(CosineSimilarity(e(a), e(b)))
  def maxAbs(a: Column): Column = Bridge.toColumn(MaxAbs(e(a)))
  def quantizeInt8(a: Column, scale: Column): Column =
    Bridge.toColumn(QuantizeInt8(e(a), e(scale)))
  def byteDot(a: Column, b: Column): Column =
    Bridge.toColumn(ByteDotProduct(e(a), e(b)))
  def pqAdc(code: Column, table: Column, ksub: Int): Column =
    Bridge.toColumn(PqAdc(e(code), e(table), ksub))

  /** SQL surface: `dot_product`, `l2_norm`, `cosine_similarity`.
    * SQL literal arrays arrive as ARRAY<DECIMAL>; a cast to
    * ARRAY<DOUBLE> normalizes every numeric input (no-op for float
    * arrays' getFloat path is preserved by the cast being skipped when
    * already float/double — see `castArr`). One builder list feeds both
    * session registration ([[register]]) and config-time injection
    * ([[graft.GraftExtensions]]). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    def castArr(e: Expression): Expression = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => e
      case _ => Cast(e, ArrayType(DoubleType))
    }
    Seq(
      "dot_product" -> (es => DotProduct(castArr(es(0)), castArr(es(1)))),
      "l2_norm" -> (es => L2Norm(castArr(es.head))),
      "cosine_similarity" -> (es => CosineSimilarity(castArr(es(0)), castArr(es(1)))))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
