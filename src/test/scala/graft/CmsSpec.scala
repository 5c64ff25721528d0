package graft

import org.apache.spark.sql.functions._

import graft.expr.{Cms, CmsExpr, CmsState}

/** [[graft.expr.CmsExpr]] — the count-min sketch family member:
  * reference-model parity, one-sided error, canonical bytes under any
  * partitioning, merge ≡ concat, SQL surface, analysis-time type
  * rejection, loud shape mismatch. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val keys: Seq[Long] =
    (1L to 500L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i % 40))

  private def refState(xs: Seq[Long], w: Int, d: Int): CmsState = {
    val st = new CmsState(w, d)
    xs.foreach(st.add(_))
    st
  }

  test("sketch bytes equal the reference model and estimates are one-sided") {
    val df = keys.toDF("k")
    val bytes = df.agg(CmsExpr.cmsAgg(col("k"), 256, 4).as("sk"))
      .head().getAs[Array[Byte]](0)
    val ref = refState(keys, 256, 4)
    assert(bytes.sameElements(ref.serialized), "distributed ≡ reference fold")
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (0L until 40L).foreach { k =>
      val est = CmsState.deserialize(bytes).query(k)
      assert(est >= truth.getOrElse(k, 0L), s"one-sided error violated at $k")
    }
    // 40 distinct keys in a 256x4 sketch: estimates are exact here
    truth.foreach { case (k, n) =>
      assert(CmsState.deserialize(bytes).query(k) == n, s"key $k")
    }
  }

  test("canonical bytes under any partitioning; merge equals the global sketch") {
    val df = keys.toDF("k")
    def bytesOf(d: org.apache.spark.sql.DataFrame): Array[Byte] =
      d.agg(CmsExpr.cmsAgg(col("k"), 128, 3).as("sk")).head().getAs[Array[Byte]](0)
    val a = bytesOf(df.repartition(1))
    val b = bytesOf(df.repartition(7, col("k")))
    assert(a.sameElements(b), "serialized form must be partition-invariant")

    val merged = df.withColumn("g", col("k") % 5)
      .groupBy("g").agg(CmsExpr.cmsAgg(col("k"), 128, 3).as("sk"))
      .agg(CmsExpr.cmsMerge(col("sk")).as("m")).head().getAs[Array[Byte]](0)
    assert(merged.sameElements(a), "union of group sketches ≡ global sketch")
  }

  test("SQL surface + analysis-time rejection + shape mismatch") {
    CmsExpr.register(spark)
    keys.toDF("k").createOrReplaceTempView("cms_in")
    val est = spark.sql(
      "SELECT cms_query(cms_agg(k, 256, 4), CAST(3 AS BIGINT)) FROM cms_in")
      .head().getLong(0)
    assert(est == keys.count(_ == 3L))
    intercept[Exception](
      spark.sql("SELECT cms_agg(CAST('x' AS STRING), 256, 4) FROM cms_in").collect())
    intercept[Exception](
      spark.sql("SELECT cms_query(CAST(1 AS BIGINT), CAST(1 AS BIGINT))").collect())
    intercept[Exception] {
      new CmsState(256, 4).mergeWith(new CmsState(128, 4))
    }
    intercept[Exception](new CmsState(100, 4)) // width must be a power of two
    // bad shapes fail at ANALYSIS (checkInputDataTypes), not per-task:
    // AnalysisException, before any job runs
    import org.apache.spark.sql.AnalysisException
    intercept[AnalysisException](
      spark.sql("SELECT cms_agg(k, 1000, 4) FROM cms_in").queryExecution.analyzed)
    intercept[AnalysisException](
      spark.sql("SELECT cms_agg(k, 256, 0) FROM cms_in").queryExecution.analyzed)
    intercept[AnalysisException](
      spark.sql("SELECT cms_agg(k, 256, 17) FROM cms_in").queryExecution.analyzed)
  }

  test("multiply-shift slots are replayable unsigned arithmetic") {
    // the cross-engine contract the oracle rides: slot computed from
    // the unsigned reinterpretation of the 64-bit wraparound product
    val x = 123456789L
    (0 until 4).foreach { i =>
      val a = BigInt(java.lang.Long.toUnsignedString(Cms.aConst(i)))
      val b = BigInt(java.lang.Long.toUnsignedString(Cms.bConst(i)))
      val u = (BigInt(x) * a + b).mod(BigInt(1) << 64)
      assert((u >> 54).toInt == Cms.slot(x, i, 10), s"row $i")
    }
  }
}
