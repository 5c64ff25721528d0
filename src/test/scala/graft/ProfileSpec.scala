package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("alpha"), Some(10.0)),
    (2L, Some("bee"), None),
    (3L, None, Some(30.0)),
    (4L, Some("alpha"), Some(20.0))
  ).toDF("id", "name", "score")

  test("profiles every column with the right metrics and exact values") {
    val p = Profile.profile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(p(("id", "count")) == 4.0 && p(("id", "nulls")) == 0.0)
    assert(p(("id", "n_distinct")) == 4.0)
    assert(p(("id", "min")) == 1.0 && p(("id", "max")) == 4.0)
    assert(p(("id", "mean")) == 2.5)
    assert(p(("name", "count")) == 3.0 && p(("name", "nulls")) == 1.0)
    assert(p(("name", "n_distinct")) == 2.0)
    assert(p(("name", "min_len")) == 3.0 && p(("name", "max_len")) == 5.0)
    // (5 + 3 + 5) / 3 = 4.333333
    assert(p(("name", "avg_len")) == 4.333333)
    assert(p(("score", "count")) == 3.0 && p(("score", "nulls")) == 1.0)
    assert(p(("score", "mean")) == 20.0)
  }

  test("all metrics ride one scan: a single aggregate over the source") {
    // count the FileSourceScan-free shape: profiling a local frame plans
    // exactly one pass — no per-column re-aggregation of the source
    val plan = Profile.profile(df).queryExecution.optimizedPlan.toString
    val localScans = "LocalRelation".r.findAllIn(plan).length
    assert(localScans == 1, s"expected one source scan, plan:\n$plan")
  }

  test("approximate variant swaps exact distincts for HLL") {
    val p = Profile.profile(df, exact = false).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // HLL on 4 tiny values is exact in practice; the point is it runs
    assert(p(("id", "n_distinct")) == 4.0)
    val plan = Profile.profile(df, exact = false)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"),
      "sketch variant must not expand for multi-distinct")
  }

  test("map columns degrade to count/nulls; hostile names don't corrupt") {
    val hostile = Seq((1L, Map("k" -> 1), "x"), (2L, Map("k" -> 2), "y"))
      .toDF("id", "m", "a||b`c'd")
    val p = Profile.profile(hostile).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(p(("m", "count")) == 2.0 && p(("m", "nulls")) == 0.0)
    assert(!p.contains(("m", "n_distinct")), "maps are not comparable")
    assert(p(("a||b`c'd", "n_distinct")) == 2.0, p.keys.toString)
  }

  test("registered table_profile has the contract shape") {
    val out = SparkEntry.queries("table_profile")(spark, sf0001)
    assert(out.columns.toSeq == Seq("col_name", "metric", "value"))
    val rows = out.collect()
    assert(rows.length == 30, s"5 documents columns x 6 metrics, got ${rows.length}")
  }

  test("cell-maintained profile equals from-scratch (minus n_distinct) across a CDC transition") {
    import spark.implicits._
    import graft.pipeline.{BucketedView, MergeTable}
    import graft.ops.Profile
    val dir = s"${java.nio.file.Files.createTempDirectory("graft-profcells")}/t"
    val docs = (1L to 300L).map(i =>
        (i, if (i % 7 == 0) None else Some(i % 53), s"body $i"))
      .toDF("id", "score", "s")
    MergeTable.create(spark, dir, docs, "id", nBuckets = 8)
    val fields = MergeTable.read(spark, dir, 1).schema.fields
      .filter(f => Seq("id", "score", "s").contains(f.name)).toSeq
    val derive: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.withColumn("g", lit(1))
    def fromScratch(v: Int) =
      Profile.profile(MergeTable.read(spark, dir, v).select("id", "score", "s"))
        .filter(col("metric") =!= "n_distinct")
        .as[(String, String, Double)].collect().toSet
    def folded(cells: org.apache.spark.sql.DataFrame) =
      Profile.profileFromCells(cells.drop("bucket", "g"))
        .as[(String, String, Double)].collect().toSet
    val cells1 = BucketedView.compute(spark, dir, "g",
      Profile.cellPartials(fields), 1, derive)
    assert(folded(cells1) == fromScratch(1))

    // transition: delete the current max score carrier's row, null one
    // score, insert a new extreme — the cases signed-delta IVM cannot
    // maintain and touched-bucket cells must
    val upd = Seq(
      (52L, None: Option[Long], "", true),     // deletes a max carrier
      (3L, None: Option[Long], "now null", false),
      (400L, Some(99L), "new extreme", false))
      .toDF("id", "score", "s", "_del")
    MergeTable.merge(spark, dir, upd, "id", deleteCol = Some("_del"))
    val cells2 = BucketedView.refresh(spark, dir, cells1, "g",
      Profile.cellPartials(fields), 1, 2, derive)
    assert(folded(cells2) == fromScratch(2),
      "maintained profile must equal from-scratch after the merge")
  }

  test("diff attributes adds, removes and per-column changes exactly") {
    import spark.implicits._
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L), (4L, "w", 40L))
      .toDF("id", "s", "v")
    val b = Seq((1L, "x", 10L),        // unchanged
        (2L, "y2", 20L),               // s changed
        (3L, "z", 35L),                // v changed
        (5L, "new", 50L))              // added; 4 removed
      .toDF("id", "s", "v")
    val got = graft.ops.Profile.diff(a, b, "id")
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "added" -> 1L, "removed" -> 1L, "changed" -> 2L, "unchanged" -> 1L,
      "changed:s" -> 1L, "changed:v" -> 1L))
  }

  test("diff of two empty tables reports ZERO (not NULL) for every status") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val got = graft.ops.Profile.diff(empty, empty, "id")
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "added" -> 0L, "removed" -> 0L, "changed" -> 0L, "unchanged" -> 0L,
      "changed:s" -> 0L))
  }

  test("diff is null-safe in values and keys") {
    import spark.implicits._
    val a = Seq((Some(1L), Some("x")), (Some(2L), None), (None, Some("k")))
      .toDF("id", "s")
    val b = Seq((Some(1L), None),      // x -> NULL is a change
        (Some(2L), None),              // NULL -> NULL unchanged
        (None, Some("k2")))            // NULL-keyed row pairs up, s changed
      .toDF("id", "s")
    val got = graft.ops.Profile.diff(a, b, "id")
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "added" -> 0L, "removed" -> 0L, "changed" -> 2L, "unchanged" -> 1L,
      "changed:s" -> 2L))
  }
}
