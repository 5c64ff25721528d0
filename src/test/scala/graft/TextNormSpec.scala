package graft

import org.apache.spark.sql.functions._

import graft.expr.TextNormExpr

/** [[graft.expr.NormalizeUnicode]] — form semantics, null handling,
  * idempotence, the SQL surface, and whole-stage codegen presence.
  * Fixtures are raw UTF-8 literals (e + U+0301 combining acute vs
  * precomposed U+00E9; the U+FB01 ligature); the first assert proves
  * the two é-forms really are byte-distinct, so a source-encoding
  * normalization would fail loudly instead of hollowing out the test.
  */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "café" // e + combining acute
  private val Precomposed = "café" // é
  private val Ligature = "ﬁle" // ﬁle

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(TextNormExpr.nfc(col("t"))).as[String].head()
  private def nfkc(s: String): String =
    Seq(s).toDF("t").select(TextNormExpr.nfkc(col("t"))).as[String].head()

  test("NFC composes; NFKC additionally folds compatibility forms") {
    assert(Decomposed != Precomposed)
    assert(nfc(Decomposed) == Precomposed)
    assert(nfc(Precomposed) == Precomposed)
    assert(nfc(Ligature) == Ligature) // ligature survives NFC
    assert(nfkc(Ligature) == "file") // …but not NFKC
    assert(nfkc(Decomposed + " " + Ligature) == Precomposed + " file")
    assert(nfc("plain ascii 123") == "plain ascii 123")
  }

  test("idempotent and null-safe") {
    val once = nfc("áb̈ ﬁ")
    assert(nfc(once) == once)
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextNormExpr.nfc(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("collapses byte-distinct equal-rendering strings to one dedup key") {
    val df = Seq((1L, Decomposed), (2L, Precomposed)).toDF("id", "text")
    assert(df.select(col("text")).distinct().count() == 2)
    assert(df.select(TextNormExpr.nfc(col("text"))).distinct().count() == 1)
  }

  test("SQL surface and whole-stage codegen") {
    Seq("é").toDF("t").createOrReplaceTempView("norm_t")
    graft.expr.TextNormExpr.register(spark)
    assert(spark.sql("SELECT nfc_normalize(t) FROM norm_t").as[String].head() == "é")
    assert(spark.sql("SELECT nfkc_normalize(t) FROM norm_t").as[String].head() == "é")
    // a literal relation constant-folds (LocalTableScan), so observe the
    // codegen span over a real parquet scan; "*(n)" prefixes mark
    // WholeStageCodegen spans (ExprSpec convention)
    val q = Tables.documents(spark, sf0001).select(TextNormExpr.nfc(col("text")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(plan.contains("normalize_unicode"), plan)
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(q.queryExecution.executedPlan.exists(_.isInstanceOf[WholeStageCodegenExec]))
  }
}
