package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The native as-of join (custom logical node + planner strategy +
  * physical operator). Ground truth is an in-memory reference model
  * (per-key sorted scan); the cross-engine pin is the registered
  * `q37_asof_native` oracle against DuckDB's own native ASOF JOIN. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // independent lineages on purpose: each toDF call makes a fresh
  // LocalRelation with fresh attribute ids (the API requires disjoint)
  private def leftDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("id", "k", "lts")
  private def rightDf(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("k", "rts")

  /** Reference: for each left row the greatest rts <= lts of the same
    * key (within tolerance). Returns (id, matched rts or None). */
  private def ref(
      lefts: Seq[(Long, Long, Long)], rights: Seq[(Long, Long)],
      tol: Option[Long]): Seq[(Long, Option[Long])] = {
    val byKey = rights.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted }
    lefts.map { case (id, k, lts) =>
      val m = byKey.getOrElse(k, Nil).takeWhile(_ <= lts).lastOption
        .filter(rts => tol.forall(t => lts - rts <= t))
      id -> m
    }
  }

  private def runJoin(
      l: DataFrame, r: DataFrame, joinType: String,
      tol: Option[Long] = None, direction: String = "backward"): Seq[(Long, Option[Long])] =
    AsOfJoin.join(l, r, Seq("k"), "lts", "rts", joinType, tol, direction)
      .select("id", "rts").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))).toSeq

  /** Forward reference: smallest rts >= lts of the same key. */
  private def refFwd(
      lefts: Seq[(Long, Long, Long)], rights: Seq[(Long, Long)],
      tol: Option[Long]): Seq[(Long, Option[Long])] = {
    val byKey = rights.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted }
    lefts.map { case (id, k, lts) =>
      val m = byKey.getOrElse(k, Nil).dropWhile(_ < lts).headOption
        .filter(rts => tol.forall(t => rts - lts <= t))
      id -> m
    }
  }

  private val rnd = new scala.util.Random(42)
  private val lefts = (0L until 2000L).map(i => (i, rnd.nextInt(16).toLong, rnd.nextInt(1000).toLong))
  private val rights = (0 until 1500).map(_ => (rnd.nextInt(16).toLong, rnd.nextInt(1000).toLong))

  test("left-outer matches the per-key reference scan on random data") {
    val got = runJoin(leftDf(lefts), rightDf(rights), "left_outer")
    assert(got.sortBy(_._1) === ref(lefts, rights, None).sortBy(_._1))
  }

  test("inner drops exactly the unmatched left rows") {
    val got = runJoin(leftDf(lefts), rightDf(rights), "inner")
    val expected = ref(lefts, rights, None).collect { case (id, Some(v)) => (id, Option(v)) }
    assert(got.sortBy(_._1) === expected.sortBy(_._1))
  }

  test("tolerance bounds the lag; equality is within the bound") {
    val got = runJoin(leftDf(lefts), rightDf(rights), "left_outer", Some(50L))
    assert(got.sortBy(_._1) === ref(lefts, rights, Some(50L)).sortBy(_._1))
    // sanity: the bound actually bites on this data
    val unbounded = ref(lefts, rights, None).count(_._2.isDefined)
    val bounded = got.count(_._2.isDefined)
    assert(bounded < unbounded && bounded > 0)
  }

  test("forward direction matches the smallest rts >= lts, with and without tolerance") {
    val gotL = runJoin(leftDf(lefts), rightDf(rights), "left_outer", direction = "forward")
    assert(gotL.sortBy(_._1) === refFwd(lefts, rights, None).sortBy(_._1))
    val gotT = runJoin(leftDf(lefts), rightDf(rights), "left_outer",
      tol = Some(25L), direction = "forward")
    assert(gotT.sortBy(_._1) === refFwd(lefts, rights, Some(25L)).sortBy(_._1))
    val gotI = runJoin(leftDf(lefts), rightDf(rights), "inner", direction = "forward")
    val expI = refFwd(lefts, rights, None).collect { case (id, Some(v)) => (id, Option(v)) }
    assert(gotI.sortBy(_._1) === expI.sortBy(_._1))
    // inclusive equality + shared head: two lefts match the SAME right row
    val l = leftDf(Seq((1L, 7L, 100L), (2L, 7L, 100L), (3L, 7L, 101L)))
    val r = rightDf(Seq((7L, 100L), (7L, 150L)))
    assert(runJoin(l, r, "left_outer", direction = "forward").toSet ===
      Set((1L, Some(100L)), (2L, Some(100L)), (3L, Some(150L))))
    // unknown direction fails fast
    assert(intercept[IllegalArgumentException] {
      runJoin(l, r, "inner", direction = "sideways")
    }.getMessage.contains("direction"))
  }

  test("nearest direction picks the smaller gap, ties to backward") {
    def refNear(tol: Option[Long]): Seq[(Long, Option[Long])] = {
      val byKey = rights.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sorted }
      lefts.map { case (id, k, lts) =>
        val back = byKey.getOrElse(k, Nil).takeWhile(_ <= lts).lastOption
          .filter(r => tol.forall(t => lts - r <= t))
        val fwd = byKey.getOrElse(k, Nil).dropWhile(_ <= lts).headOption
          .filter(r => tol.forall(t => r - lts <= t))
        val m = (back, fwd) match {
          case (Some(b), Some(f)) => Some(if (lts - b <= f - lts) b else f)
          case (b, f) => b.orElse(f)
        }
        id -> m
      }
    }
    val got = runJoin(leftDf(lefts), rightDf(rights), "left_outer", direction = "nearest")
    assert(got.sortBy(_._1) === refNear(None).sortBy(_._1))
    val gotT = runJoin(leftDf(lefts), rightDf(rights), "left_outer",
      tol = Some(10L), direction = "nearest")
    assert(gotT.sortBy(_._1) === refNear(Some(10L)).sortBy(_._1))
    // explicit tie: gaps of 5 on both sides resolve backward
    val l = leftDf(Seq((1L, 3L, 100L)))
    val r = rightDf(Seq((3L, 95L), (3L, 105L)))
    assert(runJoin(l, r, "inner", direction = "nearest") === Seq((1L, Some(95L))))
    // nearest on a non-integer ts axis is rejected at construction
    val lDouble = leftDf(lefts).withColumn("lts", col("lts").cast("double"))
    val rDouble = rightDf(rights).withColumn("rts", col("rts").cast("double"))
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.join(lDouble, rDouble, Seq("k"), "lts", "rts", "inner", None, "nearest")
    }.getMessage.contains("integer-backed"))
  }

  test("equal right timestamps tie without ambiguity in the ts value") {
    val l = leftDf(Seq((1L, 7L, 100L)))
    val r = rightDf(Seq((7L, 90L), (7L, 90L), (7L, 80L)))
    assert(runJoin(l, r, "inner") === Seq((1L, Some(90L))))
  }

  test("an exactly-equal timestamp matches (backward is inclusive)") {
    val l = leftDf(Seq((1L, 7L, 100L), (2L, 7L, 99L)))
    val r = rightDf(Seq((7L, 100L)))
    assert(runJoin(l, r, "left_outer").toSet === Set((1L, Some(100L)), (2L, None)))
  }

  test("null keys and null timestamps never match; left outer keeps the rows") {
    val l = Seq(
      (1L, Option(7L), Option(100L)),
      (2L, Option.empty[Long], Option(100L)),
      (3L, Option(7L), Option.empty[Long])).toDF("id", "k", "lts")
    val r = Seq(
      (Option(7L), Option(90L)),
      (Option.empty[Long], Option(95L)),   // null right key: never a candidate
      (Option(7L), Option.empty[Long]))    // null right ts: never a candidate
      .toDF("k", "rts")
    val got = AsOfJoin.join(l, r, Seq("k"), "lts", "rts", "left_outer")
      .select("id", "rts").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))).toSet
    assert(got === Set((1L, Some(90L)), (2L, None), (3L, None)))
  }

  test("string keys order and match correctly") {
    val l = Seq(("a", 10L, 1L), ("bb", 10L, 2L), ("c", 5L, 3L)).toDF("k", "lts", "id")
    val r = Seq(("bb", 9L), ("a", 10L), ("c", 6L)).toDF("k", "rts")
    val got = AsOfJoin.join(l, r, Seq("k"), "lts", "rts", "left_outer")
      .select("id", "rts").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))).toSet
    assert(got === Set((1L, Some(10L)), (2L, Some(9L)), (3L, None)))
  }

  test("timestamp-typed axis with microsecond tolerance") {
    val l = Seq((1L, 5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
      (2L, 5L, java.sql.Timestamp.valueOf("2024-01-01 00:01:30"))).toDF("id", "k", "lts")
    val r = Seq((5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"))).toDF("k", "rts")
    val got = AsOfJoin.join(l, r, Seq("k"), "lts", "rts", "left_outer",
        tolerance = Some(60L * 1000000L)) // 60s in micros
      .select("id", "rts").collect()
      .map(row => (row.getLong(0), Option(row.get(1)))).toSet
    assert(got === Set(
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:05"))),
      (2L, None))) // 85s lag > 60s tolerance
  }

  test("arbitrary pre-partitioning and pre-ordering of the inputs changes nothing") {
    val base = runJoin(leftDf(lefts), rightDf(rights), "left_outer")
    val got = runJoin(
      leftDf(lefts).repartition(7, col("id")).sortWithinPartitions(col("lts").desc),
      rightDf(rights).repartition(3).sortWithinPartitions(col("rts").desc),
      "left_outer")
    assert(got.sortBy(_._1) === base.sortBy(_._1))
  }

  test("plan: AsOfJoinExec fed by one exchange per side, no window operator") {
    val df = AsOfJoin.join(
      leftDf(lefts), rightDf(rights),
      Seq("k"), "lts", "rts", "left_outer")
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), "native exec node missing from the plan")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]), "as-of must not buffer key groups in a window")
    // the join costs exactly one key exchange per side — the same
    // exchange budget as a sort-merge equi-join of the two sides
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) === 2)
    val exec = nodes.collectFirst { case e: AsOfJoinExec => e }.get
    assert(exec.metrics("numOutputRows").value === lefts.size)
  }

  test("a shared-lineage self-join is rejected with a clear error") {
    val e = leftDf(lefts)
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.join(e.filter(col("k") > 3), e.filter(col("k") <= 3),
        Seq("k"), "lts", "lts")
    }
    assert(ex.getMessage.contains("independent"))
  }

  test("key/ts type validation fails fast at construction") {
    val l = leftDf(lefts)
    val r = Seq(("x", 1.5)).toDF("k", "rts")
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.join(l, r, Seq("k"), "lts", "rts")
    }.getMessage.contains("type mismatch"))
    // double ts axes are orderable (join is fine) but not tolerance-capable
    val l2 = l.withColumn("lts", col("lts").cast("double"))
    val r2 = Seq((1L, 1.5)).toDF("k", "rts")
    assert(intercept[IllegalArgumentException] {
      AsOfJoin.join(l2, r2, Seq("k"), "lts", "rts", "inner", tolerance = Some(5L))
    }.getMessage.toLowerCase.contains("tolerance"))
  }
}
