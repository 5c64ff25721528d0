package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.expr.{HeavyHitters, HeavyHittersExpr, MGState}

/** [[MGState]] / `heavy_hitters` — the Misra–Gries guarantees, checked
  * directly on the buffer (TopKStateSpec pattern) and end-to-end through
  * the aggregate: bracketing (`est ≤ true ≤ est + rounds`), the
  * ε = N/(k+1) error ceiling surviving arbitrary merge trees, guaranteed
  * presence of true heavy hitters, exactness (and therefore partitioning
  * determinism) when k exceeds the distinct cardinality, and serde.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int = 60): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def build(items: Seq[String], k: Int): MGState = {
    val st = new MGState(k)
    items.foreach(st.add)
    st
  }

  private def merged(items: Seq[String], k: Int, cuts: Seq[Int]): MGState = {
    val parts = (cuts.sorted.distinct :+ items.length).foldLeft((Seq.empty[Seq[String]], 0)) {
      case ((acc, prev), cut) =>
        val c = math.min(math.max(cut, prev), items.length)
        (acc :+ items.slice(prev, c), c)
    }._1.filter(_.nonEmpty)
    if (parts.isEmpty) new MGState(k)
    else parts.map(build(_, k)).reduce(_ mergeWith _)
  }

  private def trueCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }

  // zipfian-ish item stream: a few heavy hitters over a long tail
  private val streamGen: Gen[List[String]] = Gen.listOfN(300, Gen.frequency(
    (8, Gen.const("hh1")), (5, Gen.const("hh2")), (3, Gen.const("hh3")),
    (12, Gen.chooseNum(0, 200).map(i => s"t$i"))))
  private val kGen: Gen[Int] = Gen.oneOf(1, 2, 4, 8, 16, 64)
  private val cutsGen: Gen[List[Int]] = Gen.listOfN(5, Gen.chooseNum(0, 300))

  test("bracketing and N/(k+1) ceiling hold for arbitrary streams and merge splits") {
    samples(Gen.zip(streamGen, kGen, cutsGen)).foreach { case (items, k, cuts) =>
      val st = merged(items, k, cuts)
      val n = items.length.toLong
      assert(st.rounds <= n / (k + 1), s"k=$k rounds=${st.rounds} n=$n")
      val exact = trueCounts(items)
      exact.foreach { case (item, t) =>
        val est = st.counts.getOrDefault(item, 0L)
        assert(est <= t && t <= est + st.rounds, s"k=$k item=$item est=$est true=$t")
      }
      // no phantom items
      st.counts.keySet().forEach(it => assert(exact.contains(it)))
    }
  }

  test("any item with true count > N/(k+1) is guaranteed present") {
    samples(Gen.zip(streamGen, kGen, cutsGen)).foreach { case (items, k, cuts) =>
      val st = merged(items, k, cuts)
      val n = items.length.toLong
      trueCounts(items).foreach { case (item, t) =>
        if (t > n / (k + 1)) assert(st.counts.containsKey(item), s"k=$k lost $item (true=$t)")
      }
    }
  }

  test("k ≥ distinct cardinality ⇒ exact counts and zero rounds under any split") {
    samples(Gen.zip(streamGen, cutsGen), n = 40).foreach { case (items, cuts) =>
      val k = trueCounts(items).size + 1
      val st = merged(items, k, cuts)
      assert(st.rounds == 0L)
      val got = {
        val m = scala.collection.mutable.Map.empty[String, Long]
        st.counts.forEach((i, c) => m(i) = c)
        m.toMap
      }
      assert(got == trueCounts(items))
    }
  }

  test("serialize/deserialize round-trips counts and rounds") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    samples(Gen.zip(streamGen, kGen), n = 20).foreach { case (items, k) =>
      val st = build(items, k)
      val agg = HeavyHitters(Literal("x"), Literal(k))
      val back = agg.deserialize(agg.serialize(st))
      assert(back.rounds == st.rounds && back.counts == st.counts)
    }
  }

  test("exact regime end-to-end: aggregate == groupBy counts, invariant to partitioning") {
    val df = Tables.events(spark, sf0001)
    def run(parts: Int) = df.repartition(parts)
      .groupBy("event_type")
      .agg(HeavyHittersExpr.heavyHitters(col("user_id"), 256).as("hh"))
      .select(col("event_type"), explode(col("hh")).as("e"))
      .select(col("event_type"), col("e.item"), col("e.count_lo"), col("e.count_hi"))
      .orderBy("event_type", "item")
      .as[(String, String, Long, Long)].collect().toSeq
    val exact = df.groupBy("event_type", "user_id").count()
      .select(col("event_type"), col("user_id").cast("string"), col("count"), col("count"))
      .orderBy("event_type", "user_id")
      .as[(String, String, Long, Long)].collect().toSeq
    val a = run(1)
    assert(a == exact, "sketch must be exact when k ≥ distinct users per type")
    assert(run(7) == a, "exact regime is partitioning-invariant")
  }

  test("streaming state: the sketch aggregates incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("grp", "item")
      .groupBy("grp")
      .agg(HeavyHittersExpr.heavyHitters(col("item"), 16).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    try {
      mem.addData(("a", "x"), ("a", "x"), ("a", "y"))
      q.processAllAvailable()
      mem.addData(("a", "x"), ("b", "z")) // buffer restored from state, then updated
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT grp, e.item, e.count_lo FROM hh_stream LATERAL VIEW explode(hh) t AS e")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("a", "x", 3L), ("a", "y", 1L), ("b", "z", 1L)))
    } finally q.stop()
  }

  test("SQL surface: heavy_hitters registered and usable with GROUP BY") {
    HeavyHittersExpr.register(spark)
    Tables.events(spark, sf0001).createOrReplaceTempView("hh_events")
    val rows = spark.sql(
      """SELECT event_type, size(heavy_hitters(user_id, 8)) AS n
        |FROM hh_events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .as[(String, Int)].collect()
    // k=8 < the 15 distinct users per type: the sketch is capacity-bounded
    // (decrement rounds may leave fewer than k live counters)
    assert(rows.length == 5 && rows.forall(r => r._2 > 0 && r._2 <= 8))
  }
}
