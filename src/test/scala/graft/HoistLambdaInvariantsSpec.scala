package graft

import org.apache.spark.sql.functions._

import graft.plans.HoistLambdaInvariants

/** [[HoistLambdaInvariants]] — must repair the round-6 pathological
  * shape (loop-invariant regex inside a HOF lambda) without changing
  * results, hoist maximal subtrees as ONE column, leave legitimate
  * per-element lambda work alone, and be idempotent.
  */
class HoistLambdaInvariantsSpec extends SparkSpec {
  import org.apache.spark.sql.catalyst.expressions._

  /** PlanGuardSpec's detector, local copy: loop-invariant expensive
    * expressions under HOF lambdas. */
  private def offendersIn(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case h: HigherOrderFunction =>
          h.functions.foreach(_.foreach {
            case e @ (_: RegExpReplace | _: RegExpExtract | _: StringTrim |
                      _: StringSplit | _: Like | _: RLike)
                if !e.exists(_.isInstanceOf[NamedLambdaVariable]) =>
              out += s"${e.prettyName} under ${h.prettyName}"
            case _ =>
          })
        case _ =>
      })
    }
    out.toSeq
  }

  private def pathological = {
    val src = Tables.documents(spark, sf0001)
    val t = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    src
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), transform(sequence(lit(1), length(col("t")) - 15),
        i => ascii(col("t").substr(i, lit(1))).cast("long")).as("h"))
      .select(col("doc_id"), explode(col("h")).as("hv"))
  }

  private def withRule[A](active: Boolean)(body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      if (active) (saved.filterNot(_ == HoistLambdaInvariants) :+ HoistLambdaInvariants)
      else saved.filterNot(_ == HoistLambdaInvariants)
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("repairs the round-6 shape and preserves the result") {
    import spark.implicits._
    val (repairedPlan, withRuleRows) = withRule(active = true) {
      val df = pathological
      (df.queryExecution.optimizedPlan,
        df.as[(Long, Long)].collect().toSeq.sorted)
    }
    assert(offendersIn(repairedPlan).isEmpty,
      s"rule left the hazard in place:\n$repairedPlan")
    assert(repairedPlan.toString.contains("_hoisted"),
      "expected a hoisted projection below the lambda")

    val withoutRuleRows = withRule(active = false) {
      pathological.as[(Long, Long)].collect().toSeq.sorted
    }
    assert(withRuleRows == withoutRuleRows,
      "hoisting must be a pure performance rewrite")
  }

  test("maximal subtrees hoist as a single column") {
    val plan = withRule(active = true)(pathological.queryExecution.optimizedPlan)
    val hoisted = scala.collection.mutable.Buffer.empty[Alias]
    plan.foreach(_.expressions.foreach(_.foreach {
      case a: Alias if a.name == "_hoisted" => hoisted += a
      case _ =>
    }))
    assert(hoisted.size == 1,
      s"trim(regexp_replace(lower(…))) must hoist whole, got ${hoisted.map(_.child.prettyName)}")
    assert(hoisted.head.child.isInstanceOf[StringTrim],
      "the MAXIMAL subtree (trim at the top) is the hoist unit")
  }

  test("extensions-injected sessions keep the repair through the full optimizer") {
    // the config-only deployment path must not lose the hoist to a
    // later batch (RewriteSubquery re-runs CollapseProject after the
    // Pre CBO batch)
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val injected = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_)).getOrCreate()
      val src = injected.read.parquet(s"$sf0001/documents.parquet")
      val t = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val df = src
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"), transform(sequence(lit(1), length(col("t")) - 15),
          i => ascii(col("t").substr(i, lit(1))).cast("long")).as("h"))
        .select(col("doc_id"), explode(col("h")).as("hv"))
      assert(offendersIn(df.queryExecution.optimizedPlan).isEmpty,
        s"injected path lost the repair:\n${df.queryExecution.optimizedPlan}")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("hoists under Aggregate: invariant regex inside an agg expression's HOF lambda") {
    import spark.implicits._
    // sum(aggregate(seq, 0, (acc,i) -> acc + length(regex(text)))) — the
    // invariant regex re-runs per fold ITERATION per row without the rule
    def q = Tables.documents(spark, sf0001)
      .groupBy(col("lang"))
      .agg(sum(org.apache.spark.sql.functions.aggregate(
        sequence(lit(1), lit(4)), lit(0L),
        (acc, _) => acc + length(regexp_replace(col("text"), "\\s+", " ")))).as("s"))
      .select(col("lang"), col("s"))
    val (fixedPlan, withRuleRows) = withRule(active = true) {
      val df = q
      (df.queryExecution.optimizedPlan, df.as[(String, Long)].collect().toSeq.sorted)
    }
    assert(offendersIn(fixedPlan).isEmpty,
      s"rule must fire under Aggregate:\n$fixedPlan")
    assert(fixedPlan.toString.contains("_hoisted"),
      "expected the hoisted projection below the Aggregate")
    val withoutRuleRows = withRule(active = false) {
      q.as[(String, Long)].collect().toSeq.sorted
    }
    assert(withRuleRows == withoutRuleRows,
      "the Aggregate hoist must be a pure performance rewrite")
  }

  test("a data-driven (non-foldable) pattern is NOT hoisted — eager eval could throw") {
    import spark.implicits._
    // per-row pattern column: the lambda never runs on the empty array,
    // so a malformed pattern row must stay unevaluated
    val df = Seq(("a b", "[0-9]+", Seq(1, 2)), ("x", "(((", Seq.empty[Int]))
      .toDF("s", "pat", "arr")
      .select(transform(col("arr"),
        _ => regexp_replace(col("s"), col("pat"), lit("x"))).as("r"))
    val plan = df.queryExecution.optimizedPlan
    assert(HoistLambdaInvariants(plan).sameResult(plan),
      "non-foldable regex pattern must not hoist")
    // and the query still runs: the malformed pattern row has an empty
    // array, so its lambda body is never evaluated
    val rows = withRule(active = true)(df.as[Seq[String]].collect().toSeq)
    assert(rows.map(_.size).sorted == Seq(0, 2))
  }

  test("legitimate per-element lambda work is untouched; rule is idempotent") {
    import spark.implicits._
    val df = Seq((1L, Seq("a1", "b2"))).toDF("id", "arr")
      .select(col("id"), filter(col("arr"), x => x.rlike("[0-9]")).as("kept"))
    val plan = df.queryExecution.optimizedPlan
    val once = HoistLambdaInvariants(plan)
    assert(once.sameResult(plan), "per-element rlike over the lambda variable must not hoist")

    val bad = withRule(active = false)(pathological.queryExecution.optimizedPlan)
    val fixedOnce = HoistLambdaInvariants(bad)
    val fixedTwice = HoistLambdaInvariants(fixedOnce)
    assert(fixedTwice.sameResult(fixedOnce), "second application must be a no-op")
  }
}
