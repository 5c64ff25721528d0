package graft

import java.nio.file.Files

import graft.pipeline.RagEval

/** §3.4 eval harness: JSON in (D8), deterministic metrics, mean
  * reduction (A3), JSON/CSV out (D9/S10). */
class RagEvalSpec extends SparkSpec {
  import spark.implicits._

  private val goldenJson =
    """[
      |  {"question": "how to install the client",
      |   "answer": "run the installer and follow the setup wizard",
      |   "ground_truth": "run the installer and follow the wizard",
      |   "contexts": ["the installer must be run first", "the setup wizard guides installation"]},
      |  {"question": "what port does the server use",
      |   "answer": "the server listens on port 8080",
      |   "ground_truth": "port 8080",
      |   "contexts": ["configure the server port 8080 in settings"]}
      |]""".stripMargin

  test("load enforces the D8 schema and reads a multiLine JSON array") {
    val p = Files.createTempFile("golden", ".json")
    Files.writeString(p, goldenJson)
    val df = RagEval.load(spark, p.toString)
    assert(df.schema == RagEval.qaSchema)
    assert(df.count() == 2)
    assert(df.select("contexts").as[Seq[String]].collect().map(_.size).toSeq == Seq(2, 1))
  }

  test("metrics are deterministic, bounded, and sensible") {
    val p = Files.createTempFile("golden2", ".json")
    Files.writeString(p, goldenJson)
    val df = RagEval.load(spark, p.toString)
    val scored = RagEval.scoreRecords(df).collect()
    scored.foreach { r =>
      (1 to 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= -1.0 && v <= 1.0, s"metric $i out of range: $v")
      }
    }
    // identical answer/ground-truth overlap is high for record 1
    val f1 = RagEval.scoreRecords(df)
      .filter($"question".startsWith("how")).select("answer_gt_f1").as[Double].head()
    assert(f1 > 0.7)
    // evaluate reduces to one row with the dataset length
    val eval1 = RagEval.evaluate(df).collect().head
    assert(eval1.getLong(0) == 2)
    val eval2 = RagEval.evaluate(df).collect().head
    assert(eval1 == eval2, "evaluation must be deterministic")
  }

  test("write emits score JSON and per-record CSV") {
    val p = Files.createTempFile("golden3", ".json")
    Files.writeString(p, goldenJson)
    val out = Files.createTempDirectory("rag-out").toString
    RagEval.write(RagEval.load(spark, p.toString), out)
    val score = spark.read.json(s"$out/score")
    assert(score.count() == 1 && score.columns.contains("answer_relevancy"))
    val records = spark.read.option("header", true).csv(s"$out/records")
    assert(records.count() == 2)
  }
}
