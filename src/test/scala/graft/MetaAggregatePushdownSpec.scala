package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** Connector aggregate pushdown ([[graft.plans.GraftMetaAggregate]]):
  * ungrouped COUNT(*)/COUNT(col)/MIN/MAX over a `graft` relation must
  * collapse to a LocalRelation answered from the zone sidecar — ZERO
  * data-scan nodes in the optimized plan — and must NOT fire (falling
  * back to an exact scan) for filters, grouping, DISTINCT, non-numeric
  * columns, expression-wrapped aggregates, or a pending merge-on-read
  * ledger.
  */
class MetaAggregatePushdownSpec extends SparkSpec {
  import spark.implicits._

  Graft.registerAll(spark)

  private def tmpDir(): String =
    Files.createTempDirectory("graft-metaagg").toString

  private def hasScan(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Scan GraftRelation")

  test("COUNT/MIN/MAX over a graft table answer from metadata: no scan node") {
    val dir = tmpDir()
    val base = (0L until 1000L).map(i =>
      (i, if (i % 10 == 0) null else java.lang.Long.valueOf(i % 97), i / 10.0))
      .toDF("id", "x", "score")
    MergeTable.create(spark, dir, base, "id", nBuckets = 4)
    MergeTable.merge(spark, dir,
      Seq((5L, java.lang.Long.valueOf(500L), 199.5)).toDF("id", "x", "score"), "id")
    spark.read.format("graft").option("path", dir).load()
      .createOrReplaceTempView("magg")

    val q = spark.sql(
      """SELECT COUNT(*) AS n, COUNT(x) AS nx, MIN(x) AS mn, MAX(x) AS mx,
        |       MIN(score) AS smn, MAX(score) AS smx
        |FROM magg""".stripMargin)
    assert(!hasScan(q), "metadata aggregates must not scan data files:\n" +
      q.queryExecution.executedPlan)
    assert(q.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    val row = q.as[(Long, Long, Long, Long, Double, Double)].head()
    assert(row == ((1000L, 900L, 0L, 500L, 0.0, 199.5)),
      s"the metadata answer must equal the scan answer: $row")

    // and it matches a genuine scan bit for bit
    val scan = MergeTable.read(spark, dir)
      .agg(count(lit(1)), count($"x"), min($"x"), max($"x"),
        min($"score"), max($"score"))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(row == scan)
  }

  test("guards: filter/grouping/distinct/string/expr aggregates fall back to an exact scan") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      (0L until 200L).map(i => (i, i % 7, s"s$i")).toDF("id", "x", "name"),
      "id", nBuckets = 2)
    spark.read.format("graft").option("path", dir).load()
      .createOrReplaceTempView("magg2")

    val filtered = spark.sql("SELECT COUNT(*) AS n FROM magg2 WHERE x > 3")
    assert(hasScan(filtered), "a filtered aggregate must scan")
    assert(filtered.as[Long].head() == (0L until 200L).count(_ % 7 > 3))

    val grouped = spark.sql("SELECT x, COUNT(*) AS n FROM magg2 GROUP BY x")
    assert(hasScan(grouped), "a grouped aggregate must scan")
    assert(grouped.count() == 7)

    val distinct = spark.sql("SELECT COUNT(DISTINCT x) AS n FROM magg2")
    assert(distinct.as[Long].head() == 7)

    val str = spark.sql("SELECT MIN(name) AS mn FROM magg2")
    assert(hasScan(str), "string min/max must scan (truncated zones)")
    assert(str.as[String].head() == "s0")

    val expr = spark.sql("SELECT COUNT(*) + 1 AS n FROM magg2")
    assert(expr.as[Long].head() == 201L)

    // a pending merge-on-read ledger blocks the metadata path (counts
    // would include deleted rows) — exact scan instead
    MergeTable.deleteKeys(spark, dir, Seq(1L, 2L).toDF("id"), "id")
    spark.read.format("graft").option("path", dir).load()
      .createOrReplaceTempView("magg2")
    val underDv = spark.sql("SELECT COUNT(*) AS n FROM magg2")
    assert(hasScan(underDv), "a pending ledger must force the scan path")
    assert(underDv.as[Long].head() == 198L)
  }

  test("time travel: the pushed answer comes from the relation's pinned version") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      (0L until 100L).map(i => (i, i)).toDF("id", "x"), "id", nBuckets = 2)
    MergeTable.merge(spark, dir,
      Seq((200L, 999L)).toDF("id", "x"), "id")

    val v1 = spark.read.format("graft")
      .option("path", dir).option("version", "1").load()
      .agg(count(lit(1)).as("n"), max($"x").as("mx"))
    assert(!hasScan(v1))
    assert(v1.as[(Long, Long)].head() == ((100L, 99L)))

    val v2 = spark.read.format("graft").option("path", dir).load()
      .agg(count(lit(1)).as("n"), max($"x").as("mx"))
    assert(v2.as[(Long, Long)].head() == ((101L, 999L)))
  }
}
