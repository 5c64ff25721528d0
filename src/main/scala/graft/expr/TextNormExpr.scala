package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object TextNorm {
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    // fast path: pure ASCII (the overwhelming majority of web text) is
    // normalized under every form — skip the Normalizer walk entirely
    if (Normalizer.isNormalized(str, Normalizer.Form.valueOf(form))) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.valueOf(form)))
  }
}

/** Unicode normalization as a native codegen'd Catalyst expression —
  * `normalize_unicode(text, 'NFC' | 'NFD' | 'NFKC' | 'NFKD')`.
  *
  * Why it matters at 100 TB: exact/near dedup, contamination checks and
  * URL/domain keys all hash text — "café" precomposed (U+00E9) and
  * decomposed (e + U+0301) are DIFFERENT byte strings with identical
  * rendering, so an un-normalized corpus under-dedups and splits
  * domain/term statistics. Every published web pipeline normalizes
  * before hashing (C4/CCNet NFC; NFKC for compatibility folds like the
  * ﬁ ligature). A native expression keeps the pass inside whole-stage
  * codegen next to the other scan-local curation columns — no UDF
  * boundary, `isNormalized` fast path for the ASCII majority.
  *
  * The form is a constructor constant (not a child expression), so the
  * generated code bakes it in as a literal.
  */
case class NormalizeUnicode(child: Expression, form: String)
  extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"normalize_unicode: unknown form $form")
  // inputs are cast to STRING at the construction seams (Column API /
  // SQL registration), same pattern as the vector expressions

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.expr.TextNorm.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)

  override def prettyName: String = "normalize_unicode"
}

object TextNormExpr {

  /** Unconditional — a STRING→STRING cast is folded away by Catalyst,
    * and probing `.dataType` here would throw on unresolved columns. */
  private def asString(e: Expression): Expression = Cast(e, StringType)

  /** Column API: `nfc($"text")`, `nfkc($"text")`, or any form. */
  def normalize(c: Column, form: String): Column =
    Bridge.toColumn(NormalizeUnicode(asString(Bridge.toExpr(c)), form))
  def nfc(c: Column): Column = normalize(c, "NFC")
  def nfkc(c: Column): Column = normalize(c, "NFKC")

  /** Register `nfc_normalize(text)` (DuckDB-compatible name) and
    * `nfkc_normalize(text)` in the session function registry. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = {
    def one(name: String, form: String): (String, Seq[Expression] => Expression) =
      name -> (es => {
        require(es.length == 1, s"$name expects 1 argument, got ${es.length}")
        NormalizeUnicode(asString(es.head), form)
      })
    Seq(one("nfc_normalize", "NFC"), one("nfkc_normalize", "NFKC"))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
