package graft

import org.apache.spark.sql.functions._

import graft.expr.{SplitTextGen, VectorExpressions}
import graft.ops.ChunkText

/** Custom Catalyst expressions: vector math (codegen) and the SplitText
  * generator (SQL LATERAL VIEW surface). */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct/L2Norm/CosineSimilarity match the HOF formulation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(-1.5f, 2.5f, 0.5f), Array(2.0f, -1.0f, 4.0f))).toDF("a", "b")
    val got = df.select(
      VectorExpressions.dot(col("a"), col("b")),
      graft.index.VectorIndex.hofDot(col("a"), col("b")),
      VectorExpressions.l2Norm(col("a")),
      VectorExpressions.cosine(col("a"), col("b"))).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "expr dot != HOF dot")
    }
    assert(got(0).getDouble(0) == 32.0)
    assert(math.abs(got(0).getDouble(2) - math.sqrt(14.0)) < 1e-12)
    assert(got(1).getDouble(3) == 0.0) // zero vector → cosine 0 by convention
  }

  test("expressions survive whole-stage codegen (no fallback crash)") {
    // parquet-backed input so the plan is a real scan, not a pre-computed
    // LocalTableScan
    val dir = java.nio.file.Files.createTempDirectory("graft-expr").toString + "/v"
    (1 to 100).map(i => (i.toLong, Array.fill(8)(i.toFloat))).toDF("id", "v")
      .write.parquet(dir)
    val out = spark.read.parquet(dir)
      .withColumn("n", VectorExpressions.l2Norm(col("v")))
      .withColumn("d", VectorExpressions.dot(col("v"), col("v")))
      .filter(col("n") > 0)
    assert(out.count() == 100)
    // "*(n)" prefixes mark WholeStageCodegen spans in the executed plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(out.queryExecution.executedPlan.exists(_.isInstanceOf[WholeStageCodegenExec]))
  }

  test("mixed float/double array inputs work") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("f", "d")
    val got = df.select(VectorExpressions.dot(col("f"), col("d"))).as[Double].head()
    assert(got == 11.0)
  }

  test("split_text generator: SQL LATERAL VIEW matches the Scala splitter") {
    SplitTextGen.register(spark)
    Seq((1L, "ab cd ef"), (2L, ""), (3L, "hello"))
      .toDF("id", "text").createOrReplaceTempView("t_split")
    val got = spark.sql(
      """SELECT id, c.chunk_idx, c.chunk FROM t_split
        |LATERAL VIEW split_text(text, 7, 3) c AS chunk_idx, chunk
        |ORDER BY id, chunk_idx""".stripMargin)
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 0, "ab cd"), (1L, 1, "cd ef"), (3L, 0, "hello")))
    assert(ChunkText.splitText("ab cd ef", 7, 3) == Seq("ab cd", "cd ef"))
  }

  test("registered SQL vector functions evaluate") {
    VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(1.0, 2.0), array(3.0, 4.0)) d, " +
        "l2_norm(array(3.0, 4.0)) n, " +
        "cosine_similarity(array(1.0, 0.0), array(1.0, 0.0)) c")
      .as[(Double, Double, Double)].head()
    assert(got == ((11.0, 5.0, 1.0)))
  }
}
