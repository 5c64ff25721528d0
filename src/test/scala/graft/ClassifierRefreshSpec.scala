package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier
import graft.pipeline.{ClassifierRefresh, MergeTable}

/** IVM for the NB classifier model: maintained sufficient statistics
  * fold into EXACTLY the model a full retrain of the merged corpus
  * produces — text rewrites, label flips, deletes and inserts
  * included. */
class ClassifierRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def prose(i: Int) =
    s"the quiet library catalogues ancient manuscripts volume unique$i"
  private def spam(i: Int) =
    s"buy cheap pills casino jackpot winner offer unique$i"

  private val pred = col("label") === "good"

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-clf-ivm").toString
    val docs = ((1L to 20L).map(i => (i, prose(i.toInt), "good")) ++
      (101L to 120L).map(i => (i, spam(i.toInt), "bad"))).toDF("doc_id", "text", "label")
    MergeTable.create(spark, dir, docs, "doc_id", nBuckets = 8)
    // the transition: rewrite text (5), FLIP a label good->bad (7),
    // delete (110), insert new docs of both classes
    val changes = Seq(
      (5L, "rewritten scholarship of ancient manuscripts", "good", false),
      (7L, prose(7), "bad", false),
      (110L, spam(110), "bad", true),
      (300L, prose(300), "good", false),
      (301L, spam(301), "bad", false)).toDF("doc_id", "text", "label", "_del")
    MergeTable.merge(spark, dir, changes, "doc_id",
      deleteCol = Some("_del"), validate = false)
    dir
  }

  test("refreshed model == full retrain of the merged corpus, exactly") {
    val dir = fixture()
    val f1 = ClassifierRefresh.featureView(spark, dir, pred, buckets = 256, version = 1)
    val p1 = ClassifierRefresh.priorView(spark, dir, pred, version = 1)
    // sanity: the v1 model equals a train() of the v1 corpus
    val m1 = ClassifierRefresh.model(f1, p1, buckets = 256)
    assert(m1 === QualityClassifier.train(
      MergeTable.read(spark, dir, 1), pred, buckets = 256))

    val f2 = ClassifierRefresh.refreshFeatureView(spark, dir, f1, pred, 1, 2, buckets = 256)
    val p2 = ClassifierRefresh.refreshPriorView(spark, dir, p1, pred, 1, 2)
    val m2 = ClassifierRefresh.model(f2, p2, buckets = 256)
    val retrained = QualityClassifier.train(
      MergeTable.read(spark, dir, 2), pred, buckets = 256)
    assert(m2 === retrained,
      "incremental model must equal the full retrain bit-for-bit")
    assert(m2 !== m1, "the transition must actually move the model")
    // and the maintained model still classifies correctly
    val got = QualityClassifier.score(
      Seq((900L, "ancient manuscripts in the quiet library"),
        (901L, "casino pills jackpot offer")).toDF("doc_id", "text"), m2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(900L) === true && got(901L) === false)
  }

  test("a label flip moves the doc's vocabulary across the class models") {
    val dir = fixture()
    val f2 = ClassifierRefresh.refreshFeatureView(spark, dir,
      ClassifierRefresh.featureView(spark, dir, pred, buckets = 256, version = 1),
      pred, 1, 2, buckets = 256)
    val p2 = ClassifierRefresh.refreshPriorView(spark, dir,
      ClassifierRefresh.priorView(spark, dir, pred, version = 1), pred, 1, 2)
    val m2 = ClassifierRefresh.model(f2, p2, buckets = 256)
    // doc 7's prose tokens now also train the NEGATIVE model: compared
    // to v1, the prose-vs-spam margin narrows but the sign holds
    val m1 = ClassifierRefresh.model(
      ClassifierRefresh.featureView(spark, dir, pred, buckets = 256, version = 1),
      ClassifierRefresh.priorView(spark, dir, pred, version = 1), buckets = 256)
    def margin(m: QualityClassifier.NbModel): Long =
      QualityClassifier.score(
        Seq((1000L, "ancient manuscripts catalogues")).toDF("doc_id", "text"), m)
        .head.getLong(2)
    assert(margin(m2) < margin(m1), "flipping a prose doc negative must narrow the margin")
    assert(margin(m2) > 0L, "one flip must not invert the class")
  }

  test("a value-identical re-merge refreshes to the same model (crash-retry safety)") {
    val dir = fixture()
    val f2 = ClassifierRefresh.refreshFeatureView(spark, dir,
      ClassifierRefresh.featureView(spark, dir, pred, buckets = 256, version = 1),
      pred, 1, 2, buckets = 256)
    val p2 = ClassifierRefresh.refreshPriorView(spark, dir,
      ClassifierRefresh.priorView(spark, dir, pred, version = 1), pred, 1, 2)
    val m2 = ClassifierRefresh.model(f2, p2, buckets = 256)
    // retry the SAME batch: v3 is value-identical to v2 and the v2->v3
    // refresh recomputes the rewritten buckets to identical cells
    val retry = Seq(
      (5L, "rewritten scholarship of ancient manuscripts", "good", false),
      (7L, prose(7), "bad", false),
      (110L, spam(110), "bad", true),
      (300L, prose(300), "good", false),
      (301L, spam(301), "bad", false)).toDF("doc_id", "text", "label", "_del")
    MergeTable.merge(spark, dir, retry, "doc_id",
      deleteCol = Some("_del"), validate = false)
    val f3 = ClassifierRefresh.refreshFeatureView(spark, dir, f2, pred, 2, 3, buckets = 256)
    val p3 = ClassifierRefresh.refreshPriorView(spark, dir, p2, pred, 2, 3)
    assert(ClassifierRefresh.model(f3, p3, buckets = 256) === m2)
  }
}
