package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Expectations._
import graft.pipeline.MergeTable

/** [[MergeTable.setConstraints]] — CHECK constraints persisted ON the
  * table: any writer's merge gates its incoming rows, violations abort
  * with no version committed, existing data validates at declaration,
  * clones inherit without a scan, the codec round-trips.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-constraints").toString

  test("declare -> violating merge aborts loudly with NO version committed; clean merge passes") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      (0L until 100L).map(i => (i, s"n$i", (i % 50).toDouble))
        .toDF("id", "name", "score"), "id", nBuckets = 4)
    MergeTable.setConstraints(spark, dir, Seq(
      NotNull("name"), InRange("score", 0.0, 100.0),
      Matches("name", "^n?[a-z0-9]+$"), OneOf("id", (0L until 2000L).toSeq)))

    val before = MergeTable.versions(spark, dir)
    val e = intercept[IllegalStateException] {
      MergeTable.merge(spark, dir,
        Seq((1L, "ok", 5.0), (2L, "bad", 999.0)).toDF("id", "name", "score"),
        "id")
    }
    assert(e.getMessage.contains("in_range:score"), e.getMessage)
    assert(MergeTable.versions(spark, dir) == before,
      "a violating merge must commit nothing")

    val v = MergeTable.merge(spark, dir,
      Seq((1L, "ok", 5.0)).toDF("id", "name", "score"), "id")
    assert(MergeTable.read(spark, dir, v)
      .filter(col("id") === 1L).select("name").as[String].head() == "ok")

    // CDC deletes ride through: the gate sees only the non-delete rows
    MergeTable.merge(spark, dir,
      Seq((3L, null.asInstanceOf[String], 0.0, true))
        .toDF("id", "name", "score", "_del"),
      "id", deleteCol = Some("_del"))
    assert(!MergeTable.read(spark, dir).select("id").as[Long]
      .collect().contains(3L))

    // clear -> the same violating merge now passes
    MergeTable.clearConstraints(spark, dir)
    MergeTable.merge(spark, dir,
      Seq((2L, "bad", 999.0)).toDF("id", "name", "score"), "id")
    assert(MergeTable.constraints(spark, dir).isEmpty)
  }

  test("declaring a constraint the table already breaks refuses; codec round-trips") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      Seq((1L, "with\ttab и unicode", -5.0)).toDF("id", "name", "score"),
      "id", nBuckets = 2)
    intercept[IllegalStateException] {
      MergeTable.setConstraints(spark, dir, Seq(InRange("score", 0.0, 10.0)))
    }
    assert(MergeTable.constraints(spark, dir).isEmpty,
      "a refused declaration must persist nothing")

    val rules = Seq(
      NotNull("name"),
      InRange("score", -10.0, 10.0),
      InRange("id", 0L, 99L),
      Matches("name", "tab|унікод|[\t]"),
      OneOf("name", Seq("with\ttab и unicode", "a,b", "c%20d")))
    MergeTable.setConstraints(spark, dir, rules)
    assert(MergeTable.constraints(spark, dir) == rules,
      "escaped strings, commas and unicode must round-trip exactly")

    // arbitrary Column rules refuse to persist, loudly
    val e = intercept[IllegalArgumentException] {
      MergeTable.setConstraints(spark, dir,
        Seq(Check("custom", col("score") > col("id"))))
    }
    assert(e.getMessage.contains("cannot persist"))
  }

  test("every writer is gated: the connector sink; clones inherit a divergeable copy") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      (0L until 20L).map(i => (i, i * 2)).toDF("id", "v"), "id", nBuckets = 2)
    MergeTable.setConstraints(spark, dir, Seq(InRange("v", 0L, 1000L)))

    // batch write through the connector hits the same gate
    val e = intercept[Exception] {
      Seq((1L, 5000L)).toDF("id", "v").write.format("graft")
        .option("path", dir).option("key", "id").mode("append").save()
    }
    assert(e.getMessage.contains("in_range:v"), e.getMessage)
    Seq((1L, 500L)).toDF("id", "v").write.format("graft")
      .option("path", dir).option("key", "id").mode("append").save()

    // clone inherits (zero-copy: no data dir under the clone), then
    // diverges its own copy
    val c = tmpDir()
    MergeTable.cloneTable(spark, dir, c)
    assert(MergeTable.constraints(spark, c) == Seq(InRange("v", 0L, 1000L)))
    intercept[IllegalStateException] {
      MergeTable.merge(spark, c, Seq((2L, 5000L)).toDF("id", "v"), "id")
    }
    MergeTable.clearConstraints(spark, c)
    MergeTable.merge(spark, c, Seq((2L, 5000L)).toDF("id", "v"), "id")
    // the source keeps ITS constraints
    assert(MergeTable.constraints(spark, dir).nonEmpty)
  }
}
