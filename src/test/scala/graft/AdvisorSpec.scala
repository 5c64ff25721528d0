package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.Advisor

/** [[graft.plans.Advisor]] — the 100 TB plan lint: every advisory
  * fires on a crafted offender and stays silent on the clean twin. */
class AdvisorSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed fixtures: LocalRelation plans constant-fold and
  // carry no scans/stats (the PlanGuardSpec lesson)
  private lazy val (factPath, dimPath) = {
    val root = Files.createTempDirectory("graft-advisor").toString
    (1L to 5000L).map(i => (i, i % 97, s"p$i")).toDF("id", "k", "tag")
      .write.parquet(s"$root/fact")
    (0L until 97L).map(i => (i, s"d$i")).toDF("k", "name")
      .write.parquet(s"$root/dim")
    (s"$root/fact", s"$root/dim")
  }
  private def fact = spark.read.parquet(factPath)
  private def dim = spark.read.parquet(dimPath)

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    Advisor.advise(df).filter(_.level == "warn").map(_.rule).toSet

  private def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cartesian: crossJoin flags, equi join of the same tables does not") {
    assert(rules(fact.crossJoin(dim)).contains("cartesian"))
    assert(!rules(fact.join(broadcast(dim), "k")).contains("cartesian"))
  }

  test("broadcastable: a forced shuffle join of a tiny dim suggests broadcast") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "1048576",
      "spark.sql.adaptive.enabled" -> "false") {
      // force the planner past the broadcast it would have picked
      val smj = fact.join(dim.hint("merge"), "k")
      assert(rules(smj).contains("broadcastable"), Advisor.advise(smj).toString)
      val bhj = fact.join(broadcast(dim), "k")
      assert(!rules(bhj).contains("broadcastable"))
    }
  }

  test("udf: a ScalaUDF flags, the codegen twin does not") {
    val f = udf((s: String) => s.length)
    assert(rules(fact.select(f(col("tag")).as("n"))).contains("udf"))
    assert(!rules(fact.select(length(col("tag")).as("n"))).contains("udf"))
  }

  test("global_window: no PARTITION BY flags, a partitioned window does not") {
    import org.apache.spark.sql.expressions.Window
    val global = Window.orderBy("id")
    val byK = Window.partitionBy("k").orderBy("id")
    assert(rules(fact.withColumn("rn", row_number().over(global)))
      .contains("global_window"))
    assert(!rules(fact.withColumn("rn", row_number().over(byK)))
      .contains("global_window"))
  }

  test("unpushed_scan: an expression-wrapped filter flags, a bare-column filter does not") {
    // a filter the parquet reader cannot push (expression over the column)
    val wrapped = fact.filter(length(col("tag")) % 7 === 3)
    assert(rules(wrapped).contains("unpushed_scan"), Advisor.advise(wrapped).toString)
    val pushed = fact.filter(col("k") === 5L)
    assert(!rules(pushed).contains("unpushed_scan"))
  }

  test("meta_scan: a metadata-answerable graft aggregate that did not collapse flags; the injected session stays clean") {
    val dir = Files.createTempDirectory("graft-advisor-meta").toString + "/t"
    graft.pipeline.MergeTable.create(spark, dir,
      (0L until 500L).map(i => (i, i % 7)).toDF("id", "x"), "id", nBuckets = 2)

    // a session WITHOUT the extension: the COUNT/MAX shape survives to
    // execution as a scan — the regression the lint exists to catch
    val bare = spark.newSession()
    val offender = bare.read.format("graft").option("path", dir).load()
      .agg(count(lit(1)).as("n"), max(col("x")).as("mx"))
    assert(rules(offender).contains("meta_scan"),
      s"an un-collapsed metadata aggregate must flag: ${Advisor.advise(offender)}")

    // a shape the rule would NOT answer (an expression-wrapped child —
    // bare-column AVG became answerable in round 15) never flags
    val nonMeta = bare.read.format("graft").option("path", dir).load()
      .agg(avg(col("x") + 1).as("a"))
    assert(!rules(nonMeta).contains("meta_scan"))

    // the properly-registered session collapses the aggregate — the
    // shape is gone from the optimized plan, nothing to flag
    val injected = spark.newSession()
    Graft.registerAll(injected)
    val collapsed = injected.read.format("graft").option("path", dir).load()
      .agg(count(lit(1)).as("n"), max(col("x")).as("mx"))
    assert(!rules(collapsed).contains("meta_scan"),
      "a collapsed pushdown must not flag")
    assert(collapsed.queryExecution.optimizedPlan.toString
      .contains("LocalRelation"))
  }

  test("topk_scan: an unpruned graft top-k flags; the injected session's subset scan does not") {
    val dir = Files.createTempDirectory("graft-advisor-topk").toString + "/t"
    graft.pipeline.MergeTable.create(spark, dir,
      (0L until 4000L).map(i => (i, i / 4)).toDF("id", "x"), "id",
      nBuckets = 2)
    val v = graft.pipeline.MergeTable.clusterBy(spark, dir, "x",
      filesPerBucket = 6)

    // a session WITHOUT the extension: the Limit(Sort) shape survives
    // over the whole relation — every file scans for a top-10
    val bare = spark.newSession()
    val offender = bare.read.format("graft")
      .option("path", dir).option("version", v.toString).load()
      .orderBy(col("x").desc).limit(10)
    assert(rules(offender).contains("topk_scan"),
      s"an unpruned top-k must flag: ${Advisor.advise(offender)}")
    val bareLimit = bare.read.format("graft")
      .option("path", dir).option("version", v.toString).load().limit(10)
    assert(rules(bareLimit).contains("topk_scan"))

    // the injected session prunes to a subset relation — no flag
    val injected = spark.newSession()
    Graft.registerAll(injected)
    val pruned = injected.read.format("graft")
      .option("path", dir).option("version", v.toString).load()
      .orderBy(col("x").desc).limit(10)
    assert(!rules(pruned).contains("topk_scan"),
      "a pruned top-k must not flag")
  }

  test("registry lint: structural warnings fire ONLY on documented exceptions") {
    // `broadcastable` is size-dependent (at sf0.001 every side is under
    // the threshold and AQE broadcasts at runtime) and `unpushed_scan`
    // fires on computed predicates that CANNOT push (hash-threshold
    // sampling, shingle filters) — both are review signals, not
    // registry invariants. The three STRUCTURAL rules below are
    // invariants: a new query tripping one is a regression unless its
    // exception is documented at the query site.
    val deliberateCartesian = Set(
      "emb_neardup_exact",      // documented all-pairs oracle twin
      "q19_fuzzy_levenshtein")  // 25-name broadcast dim, all-pairs by intent
    val deliberateGlobalWindow = Set(
      "doc_hybrid_rrf_top10")   // RRF over two PRE-TRUNCATED top-k lists
    val deliberateUdf = Set(
      // JIT'd closures where interpreted HOFs cost ~3 lambda dispatches
      // per element, or driver-side pipeline steps — each documented
      "chunk_stats", "dedup_contamination", "dedup_contamination_bloom",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
      "dedup_simhash_pairs", "doc_langid", "doc_repetition",
      "doc_trigram_lm", "knn_ivf_top5", "knn_pq_rerank_top5",
      "ragas_testset_candidates")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        Advisor.advise(fn(spark, sf0001))
          .filter(_.level == "warn")
          .collect {
            case a if a.rule == "cartesian" && !deliberateCartesian(name) =>
              s"$name:${a.rule}"
            case a if a.rule == "global_window" && !deliberateGlobalWindow(name) =>
              s"$name:${a.rule}"
            case a if a.rule == "udf" && !deliberateUdf(name) =>
              s"$name:${a.rule}"
          }
    }
    assert(offenders.isEmpty, s"undocumented plan smells: $offenders")
  }

  test("wide_refresh: a session-width refresh over a micro-delta flags; the SizedSession path stays silent (round 17)") {
    import graft.pipeline.MergeTable
    val dir = s"${Files.createTempDirectory("graft-widerf")}/t"
    MergeTable.create(spark, dir,
      (0L until 500L).map(i => (i, s"v$i")).toDF("id", "s"), "id",
      nBuckets = 2)
    MergeTable.merge(spark, dir, Seq((3L, "x")).toDF("id", "s"), "id")

    // offender: a refresher that skips SizedSession — rowDeltas runs
    // on a 64-partition session over a ~handful-of-rows delta
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "64")
    Advisor.clearRuntime()
    MergeTable.rowDeltas(wide, dir, 1, 2, "id").count()
    assert(Advisor.recentRuntime.exists(_.rule == "wide_refresh"),
      s"a 64-wide micro-delta refresh must flag: ${Advisor.recentRuntime}")

    // clean twin: the compliant entry — forDelta hands back a sized
    // session, so the same delta plans at its bound and stays silent
    Advisor.clearRuntime()
    val sized = graft.ops.SizedSession.forDelta(wide, dir, 1, 2)
    MergeTable.rowDeltas(sized, dir, 1, 2, "id").count()
    assert(!Advisor.recentRuntime.exists(_.rule == "wide_refresh"),
      s"the delta-sized path must stay silent: ${Advisor.recentRuntime}")
  }

  test("clean aggregation carries no warnings, info lines report shuffles + codegen") {
    val clean = fact.groupBy("k").agg(sum("id").as("s"))
    val advs = Advisor.advise(clean)
    assert(advs.forall(_.level == "info"), advs.toString)
    assert(advs.exists(_.rule == "shuffles"))
    assert(advs.exists(_.rule == "codegen_gap"))
    // and the DataFrame rendering round-trips
    val df = Advisor.adviseDf(clean)
    assert(df.columns.toSeq == Seq("level", "rule", "node", "message"))
    assert(df.count() == advs.length)
  }
}
