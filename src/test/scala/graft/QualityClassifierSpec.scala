package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier

/** NB quality classifier — the CCNet/GPT-3 filter stage. The
  * cross-engine pin is the `doc_quality_classifier` oracle; this suite
  * pins the learning behavior (separation, generalization to unlabeled
  * vocabulary, the prior under imbalance) and the engine invariants
  * (determinism under partitioning, empty-text handling, filtering). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: curated prose vs keyword spam
  private def prose(i: Int) =
    s"the quiet library catalogues ancient manuscripts and careful scholarship volume $i"
  private def spam(i: Int) =
    s"buy cheap pills casino bonus click winner jackpot free offer $i"

  private val train = ((0 until 40).map(i => (i.toLong, prose(i), "good")) ++
    (100 until 140).map(i => (i.toLong, spam(i), "bad"))).toDF("doc_id", "text", "label")

  test("separates the classes it was trained on and generalizes to held-out docs") {
    val model = QualityClassifier.train(train, col("label") === "good")
    // held-out docs reusing each vocabulary, ids unseen in training
    val heldOut = Seq(
      (900L, "ancient manuscripts and careful scholarship in the quiet library"),
      (901L, "casino jackpot click free pills winner")).toDF("doc_id", "text")
    val got = QualityClassifier.score(heldOut, model)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(900L) === true, "prose vocabulary must classify positive")
    assert(got(901L) === false, "spam vocabulary must classify negative")
    val trainScores = QualityClassifier.score(train, model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0 until 40).forall(i => trainScores(i.toLong) > 0))
    assert((100 until 140).forall(i => trainScores(i.toLong) < 0))
  }

  test("scores are exact fixed-point longs, invariant under partitioning") {
    val model = QualityClassifier.train(train, col("label") === "good")
    val a = QualityClassifier.score(train, model).orderBy("doc_id").collect().toSeq
    val modelR = QualityClassifier.train(
      train.repartition(7, col("text")), col("label") === "good")
    assert(modelR === model, "training must not depend on layout")
    val b = QualityClassifier.score(train.repartition(5), model)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("a document with no extractable n-grams scores exactly the prior") {
    val model = QualityClassifier.train(train, col("label") === "good")
    val got = QualityClassifier.score(Seq((7L, "∞∞ ☃☃")).toDF("doc_id", "text"), model)
      .head()
    assert(got.getLong(1) === 0L)
    assert(got.getLong(2) === model.priorFp)
  }

  test("vocabulary unseen in training rides the length term, not a dropped join") {
    val model = QualityClassifier.train(train, col("label") === "good")
    val got = QualityClassifier.score(
      Seq((8L, "zzzunseen wordsnever inanytraining")).toDF("doc_id", "text"), model)
      .head()
    // all three unigrams + two bigrams count as features even though no
    // training bucket matches them
    assert(got.getLong(1) === 5L)
    assert(got.getLong(2) === model.priorFp + 5L * model.kkFp)
  }

  test("class imbalance shifts the prior in the majority direction") {
    val balanced = QualityClassifier.train(train, col("label") === "good")
    assert(balanced.priorFp === 0L)
    val imb = ((0 until 90).map(i => (i.toLong, prose(i), "good")) ++
      (100 until 110).map(i => (i.toLong, spam(i), "bad"))).toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(imb, col("label") === "good")
    assert(m.priorFp > 0L, "9:1 positive corpus must carry a positive prior")
  }

  test("null labels train as negatives instead of erroring") {
    val withNull = train.withColumn("label",
      when(col("doc_id") === 0L, lit(null: String)).otherwise(col("label")))
    val m = QualityClassifier.train(withNull, col("label") === "good")
    // doc 0's prose tokens now sit in the negative model too; the model
    // still trains and still separates
    val got = QualityClassifier.score(
      Seq((902L, "casino pills jackpot free")).toDF("doc_id", "text"), m).head()
    assert(!got.getBoolean(3))
  }

  test("filter keeps exactly the above-threshold documents") {
    val model = QualityClassifier.train(train, col("label") === "good")
    val kept = QualityClassifier.filter(train, model)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (0L until 40L).toSet)
  }

  test("training requires both classes") {
    val ex = intercept[IllegalArgumentException] {
      QualityClassifier.train(train, lit(true))
    }
    assert(ex.getMessage.contains("classes"))
  }
}
