package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static spatial-curve kernels shared by interpreted eval and
  * generated code. */
object Spatial {

  /** Hilbert xy2d (the standard bit transform): curve position of the
    * clamped point `(x, y)` on the 2^bits × 2^bits grid. Pure integer
    * loop — all intermediates < 2^(2·bits) ≤ 2^62. */
  def hilbert(xIn: Long, yIn: Long, bits: Int): Long = {
    val top = (1L << bits) - 1L
    var x = math.max(0L, math.min(xIn, top))
    var y = math.max(0L, math.min(yIn, top))
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_value(x, y)` — Hilbert curve position as a native
  * codegen'd expression; `bits` is a constructor constant baked into
  * the generated code (the [[TextNormExpr]] pattern). A naive
  * unrolled `when`-chain formulation of the same transform grows the
  * expression tree ~5× per level (no subtree sharing in Catalyst) and
  * OOMs the driver past ~8 levels — the imperative loop is the whole
  * point of the native tier. Inputs clamp into `[0, 2^bits - 1]`. */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits > 0 && 2 * bits <= 62, s"hilbert_value: need 0 < bits <= 31, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).zipWithIndex.collect {
      case (c, i) if c.dataType != LongType => s"arg ${i + 1}: ${c.dataType.simpleString}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_value: coordinates must be BIGINT; got ${bad.mkString(", ")}")
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Spatial.hilbert(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.Spatial.hilbert($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_value"
}
