package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations
import graft.ops.Expectations._

/** [[graft.ops.Expectations]] — declarative quality constraints:
  * exact violation counts (NULL violates), one-scan report for
  * row+unique rules, FK anti-join semantics, the loud gate, and the
  * valid/quarantine split with per-row rule attribution. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("en"), Some(100L), "src1"),
    (2L, Some("en"), Some(100L), "src1"),   // dup of (en, src1)
    (3L, Some("fr"), Some(9000L), "src2"),  // out of range
    (4L, None, Some(50L), "src3"),          // null lang + out of range
    (5L, Some("xx"), Some(200L), "bad src") // bad lang + bad source
  ).toDF("id", "lang", "n", "src")

  private def rules = Seq(
    NotNull("lang"),
    InRange("n", 100L, 2000L),
    OneOf("lang", Seq("en", "fr", "de")),
    Matches("src", "^src[0-9]+$"),
    Unique(Seq("lang", "src")))

  test("report counts violations exactly; NULL violates row rules") {
    val got = Expectations.report(fixture, rules)
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(
      "not_null:lang" -> 1L,       // id 4
      "in_range:n" -> 2L,          // ids 3, 4
      "one_of:lang" -> 2L,         // id 5 (xx) + id 4 (NULL violates)
      "matches:src" -> 1L,         // id 5
      "unique:lang,src" -> 1L))    // ids 1,2 share (en, src1)
  }

  test("empty input reports ZERO violations (not NULL) for every rule shape") {
    val empty = fixture.limit(0)
    val got = Expectations.report(empty, rules).as[(String, Long)].collect()
    assert(got.length == rules.length && got.forall(_._2 == 0L), got.toSeq)
    // and the gate passes an empty (vacuously clean) input through
    assert(Expectations.gate(empty, rules).count() == 0L)
  }

  test("foreign key: unmatched and NULL keys count, matched ones don't") {
    val dim = Seq(10L, 20L).toDF("k")
    val facts = Seq(Some(10L), Some(20L), Some(99L), None).toDF("fk_col")
    val got = Expectations.report(facts,
        Seq(ForeignKey(Seq("fk_col"), dim, Seq("k"))))
      .as[(String, Long)].head()
    assert(got == (("fk:fk_col", 2L)), s"99 and NULL must violate: $got")
  }

  test("row + unique rules ride ONE aggregation over one scan") {
    val plan = Expectations.report(fixture, rules)
      .queryExecution.executedPlan.toString
    val scans = "Scan ".r.findAllIn(plan).length
    assert(scans <= 1, s"expected a single scan, plan:\n$plan")
  }

  test("gate passes clean data through and names every violated rule otherwise") {
    val clean = Seq((1L, "en", 100L, "src1"), (2L, "fr", 200L, "src2"))
      .toDF("id", "lang", "n", "src")
    assert(Expectations.gate(clean, rules).count() == 2)
    val e = intercept[IllegalStateException](Expectations.gate(fixture, rules))
    assert(e.getMessage.contains("in_range:n=2") &&
      e.getMessage.contains("unique:lang,src=1"), e.getMessage)
  }

  test("randomized reference: report + quarantine equal a plain-Scala evaluator on seeded data") {
    val rng = new scala.util.Random(20260814L)
    (1 to 25).foreach { _ =>
      val n = 1 + rng.nextInt(40)
      val rows: Seq[(Long, Option[String], Option[Long], String)] =
        (1L to n).map { i =>
          (i,
            if (rng.nextInt(5) == 0) None
            else Some(Seq("en", "fr", "xx")(rng.nextInt(3))),
            if (rng.nextInt(6) == 0) None else Some(rng.nextInt(300).toLong),
            s"src${rng.nextInt(4)}")
        }
      val df = rows.toDF("id", "lang", "n", "src")
      val lo = rng.nextInt(100).toLong
      val hi = lo + rng.nextInt(200)
      val ruleSeq: Seq[RowRule] = Seq(
        NotNull("lang"), InRange("n", lo, hi), OneOf("lang", Seq("en", "fr")))
      // plain-Scala reference evaluator (NULL violates)
      def holds(r: (Long, Option[String], Option[Long], String)): Seq[Boolean] =
        Seq(r._2.isDefined,
          r._3.exists(v => v >= lo && v <= hi),
          r._2.exists(Set("en", "fr")))
      val refViol = rows.map(holds).transpose.map(_.count(!_).toLong)
      val got = Expectations.report(df, ruleSeq)
        .as[(String, Long)].collect().map(_._2).toSeq
      assert(got == refViol, s"lo=$lo hi=$hi rows=$rows")
      val (valid, bad) = Expectations.quarantine(df, ruleSeq)
      val refValid = rows.filter(r => holds(r).forall(identity)).map(_._1).toSet
      assert(valid.select("id").as[Long].collect().toSet == refValid)
      assert(bad.count() == n - refValid.size)
    }
  }

  test("quarantine splits rows and attributes each failed rule by name") {
    val rowRules = rules.collect { case r: RowRule => r }
    val (valid, bad) = Expectations.quarantine(fixture, rowRules)
    assert(valid.select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(valid.columns.toSeq == fixture.columns.toSeq, "no leftover column")
    val tags = bad.select(col("id"), col("violated"))
      .as[(Long, Seq[String])].collect().toMap
    assert(tags(3L) == Seq("in_range:n"))
    assert(tags(4L).toSet ==
      Set("not_null:lang", "in_range:n", "one_of:lang"))
    assert(tags(5L).toSet == Set("one_of:lang", "matches:src"))
  }
}
