package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)

  test("hashSample is deterministic, key-stable and ~fraction sized") {
    val a = Sampling.hashSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same key, same fraction → identical sample")
    val n = docs.count().toDouble
    assert(a.size > n * 0.1 && a.size < n * 0.45,
      s"~25% of $n expected, got ${a.size}")
    // nested property: a smaller fraction selects a subset
    val small = Sampling.hashSample(docs, "doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a), "hash thresholds nest")
  }

  test("stratifiedTake draws exactly perStratum per stratum, stable") {
    val out = Sampling.stratifiedTake(docs, "lang", "doc_id", 7)
    val sizes = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(7L, n), s"$lang: ${sizes(lang)}")
    }
    // not a "first N by id" draw: some selected id exceeds the N-th id
    val en = out.filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    val firstN = docs.filter(col("lang") === "en").orderBy("doc_id")
      .limit(7).select("doc_id").as[Long].collect().toSet
    assert(en != firstN, "hash priority must differ from id order")
  }

  test("registered sampling queries run and respect their shapes") {
    val strat = SparkEntry.queries("doc_sample_stratified")(spark, sf0001)
    assert(strat.columns.toSeq == Seq("lang", "doc_id"))
    assert(strat.groupBy("lang").count().as[(String, Long)]
      .collect().forall(_._2 <= 10))
    val hash = SparkEntry.queries("doc_sample_hash")(spark, sf0001)
    assert(hash.count() > 0)
  }

  test("temperatureMixture flattens toward uniform as alpha drops") {
    val rows =
      (1 to 1600).map(i => (s"w$i", "web")) ++
      (1 to 400).map(i => (s"c$i", "code")) ++
      (1 to 100).map(i => (s"p$i", "papers"))
    val df = rows.toDF("id", "source")
    def shares(alpha: Double): Map[String, Double] = {
      val out = Sampling.temperatureMixture(df, "source", "id", alpha)
        .groupBy("source").count().as[(String, Long)].collect().toMap
      val tot = out.values.sum.toDouble
      out.map { case (s, n) => s -> n / tot }
    }
    // alpha=1 keeps the natural 16:4:1 mix intact (no subsampling)
    val natural = shares(1.0)
    assert(math.abs(natural("web") - 1600.0 / 2100) < 0.01, natural.toString)
    // alpha=0.5 moves proportions toward sqrt-counts 4:2:1
    val flat = shares(0.5)
    assert(flat("web") < natural("web") && flat("papers") > natural("papers"),
      s"natural=$natural flat=$flat")
    assert(math.abs(flat("web") - 4.0 / 7) < 0.05, flat.toString)
    // deterministic
    assert(shares(0.5) == flat)
  }

  test("mixture hits target proportions at the largest feasible size") {
    val rows =
      (1 to 1000).map(i => (s"w$i", "web")) ++
      (1 to 500).map(i => (s"c$i", "code")) ++
      (1 to 100).map(i => (s"p$i", "papers")) ++
      (1 to 50).map(i => (s"x$i", "untargeted"))
    val df = rows.toDF("id", "source")
    val targets = Map("web" -> 0.5, "code" -> 0.3, "papers" -> 0.2)
    val out = Sampling.mixture(df, "source", "id", targets).cache()

    // papers is the scarcest source: 100 / 0.2 caps the mix at ~500
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!bySource.contains("untargeted"))
    assert(bySource("papers") == 100, s"scarce source kept whole: $bySource")
    val total = bySource.values.sum.toDouble
    targets.foreach { case (s, t) =>
      val got = bySource(s) / total
      assert(math.abs(got - t) < 0.06, s"$s: got $got, want $t ($bySource)")
    }
    // deterministic: identical selection on a second run
    val again = Sampling.mixture(df, "source", "id", targets)
      .select("id").as[String].collect().toSet
    assert(again == out.select("id").as[String].collect().toSet)
  }

  test("capPerGroup caps each group at n and matches the window twin") {
    val out = Sampling.capPerGroup(docs, "source", "doc_id", 5)
    val sizes = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    full.foreach { case (src, n) =>
      assert(sizes(src) == math.min(5L, n), s"$src: ${sizes.get(src)}")
    }
    // the bounded-aggregate path must pick the exact rows (and ranks)
    // the row_number window formulation picks under the same priority
    val pri = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(pri.desc, col("doc_id"))
    val twin = docs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("source", "rn", "doc_id")
      .as[(String, Long, Long)].collect().toSet
    val got = out.select("source", "rn", "doc_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == twin)
  }

  test("hashSplit: total partition, ~fractions, stable under growth and repartition") {
    val df = spark.range(2000).toDF("id")
    val split = Sampling.hashSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000, "every row gets exactly one split")
    assert(counts("train") > 1500 && counts("train") < 1700, s"$counts")
    assert(counts("val") > 130 && counts("val") < 270, s"$counts")
    assert(counts("test") > 130 && counts("test") < 270, s"$counts")

    def assignment(d: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(d, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("id", "split").as[(Long, String)].collect().toMap
    val small = assignment(spark.range(500).toDF("id"))
    val grown = assignment(spark.range(2000).repartition(7).toDF("id"))
    // corpus growth and physical layout never move a key across splits
    small.foreach { case (k, s) => assert(grown(k) == s, s"key $k moved splits") }

    intercept[IllegalArgumentException](
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("hashSplit: a cumulative fraction rounding to 65536 cannot collapse a split") {
    // train's cumulative fraction rounds to 65536, which used to format
    // as the 5-char "10000" and lexicographically fail against most
    // 4-char buckets — silently reassigning nearly everything to the
    // tiny tail split. The always-true arm must absorb it instead.
    val df = spark.range(2000).toDF("id")
    val counts = Sampling
      .hashSplit(df, "id", Seq("train" -> (1.0 - 1e-9), "val" -> 1e-9))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("train", 0L) == 2000, s"collapsed: $counts")
  }

  test("clusterAwareSplit: clusters move as one unit; singletons match hashSplit; growth-stable") {
    import graft.ops.Sampling
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,2,3} (chained), {10,11}, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.clusterAwareSplit(docs, pairs, splits)
      .select("doc_id", "comp", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every cluster member carries the min-id representative and ONE split
    assert(Seq(1L, 2L, 3L).map(got(_)).distinct.size === 1)
    assert(got(1L)._1 === 1L)
    assert(Seq(10L, 11L).map(got(_)).distinct.size === 1)
    assert(got(10L)._1 === 10L)
    // singletons: identical to the plain per-doc hashSplit
    val plain = Sampling.hashSplit(docs, "doc_id", splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 200L).filterNot(Set(2L, 3L, 11L)).foreach { i =>
      assert(got(i)._2 === plain(i), s"singleton $i must match hashSplit") }
    // growth stability: doubling the corpus moves no existing assignment
    val grown = docs.unionByName((201L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text"))
    val got2 = Sampling.clusterAwareSplit(grown, pairs, splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 200L).foreach(i => assert(got2(i) === got(i)._2, s"doc $i moved on growth"))
    // cluster merge: a new pair joining {1,2,3} and {10,11} re-keys the
    // merged cluster to ONE representative and ONE split
    val merged = Sampling.clusterAwareSplit(docs,
      pairs.unionByName(Seq((3L, 10L)).toDF("id_a", "id_b")), splits)
      .select("doc_id", "comp", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L).map(merged(_)).distinct.size === 1)
    assert(merged(11L)._1 === 1L)
  }

  test("tokenMixture fills per-source TOKEN budgets with <= 1 doc overrun, deterministically") {
    import graft.ops.Sampling
    // en: 40 docs x 10 tokens = 400; zh: 10 docs x 6 tokens = 60 (scarce)
    val docs = ((1 to 40).map(i => (i.toLong, Seq.fill(10)(s"w$i").mkString(" "), "en")) ++
      (101 to 110).map(i => (i.toLong, Seq.fill(6)(s"z$i").mkString(" "), "zh")) ++
      Seq((900L, "dropped outside targets", "fr"))).toDF("doc_id", "text", "lang")
    val targets = Map("en" -> 0.7, "zh" -> 0.3)
    val got = Sampling.tokenMixture(docs, "lang", "doc_id", targets)
    val byLang = got.groupBy("lang").agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh is the scarcest source: feasible total = 60/0.3 = 200 tokens,
    // budgets en = 140, zh = 60 — zh fully consumed, en within one doc
    assert(byLang("zh") === 60L)
    assert(byLang("en") >= 140L && byLang("en") < 140L + 10L, s"$byLang")
    assert(!byLang.contains("fr"), "sources outside the targets are dropped")
    // layout invariance + determinism
    val again = Sampling.tokenMixture(docs.repartition(7), "lang", "doc_id", targets)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.select("doc_id").as[Long].collect().toSet)
  }

  test("weightedTake matches a driver-side A-ES reference; weight<=0 never wins; layout-invariant") {
    import graft.ops.Sampling
    val rows = (1 to 300).map(i =>
      (i.toLong, if (i % 50 == 0) 0L else (i % 7 + 1).toLong)) :+ ((301L, -3L))
    val df = rows.toDF("doc_id", "w")
    val got = Sampling.weightedTake(df, "doc_id", "w", 25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side reference: identical key algebra on the JVM
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = rows.filter(_._2 > 0).map { case (id, w) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(13), 16).toDouble
      val u = (h + 0.5) / 4503599627370496.0
      (id, math.log(u) / w)
    }.sortBy { case (id, pri) => (-pri, id) }.take(25).map(_._1)
    assert(got.map(_._2).toSeq == want, "selection must replay the A-ES keys exactly")
    assert(got.map(_._1).toSeq == (1 to 25).map(_.toLong), "rn is 1-based draw order")
    val zeroIds = rows.filter(_._2 <= 0).map(_._1).toSet
    assert(got.map(_._2).forall(!zeroIds.contains(_)), "weight<=0 rows can never win")
    // layout invariance (bounded top_k partials merge associatively)
    val again = Sampling.weightedTake(df.repartition(11), "doc_id", "w", 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(again == got.toSeq)
    // heavier keys win more often: weight-7 ids should out-represent weight-1
    val byW = got.map(_._2).map(id => rows.find(_._1 == id).get._2)
    assert(byW.count(_ >= 6) > byW.count(_ == 1),
      s"weighted draw should favor heavy rows, got ${byW.mkString(",")}")
  }

  test("weightedTakePerGroup draws independently per stratum, <= n each, layout-invariant") {
    import graft.ops.Sampling
    val rows = (1 to 200).map(i => (s"g${i % 4}", i.toLong, (i % 5 + 1).toLong))
    val df = rows.toDF("g", "doc_id", "w")
    val got = Sampling.weightedTakePerGroup(df, "g", "doc_id", "w", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.groupBy(_._1).forall(_._2.length == 7), "each stratum draws exactly n")
    assert(got.groupBy(_._1).keySet == Set("g0", "g1", "g2", "g3"))
    // per-group selection equals a global weightedTake over that group alone
    for (g <- Seq("g0", "g3")) {
      val solo = Sampling.weightedTake(df.filter($"g" === g), "doc_id", "w", 7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val grp = got.filter(_._1 == g).sortBy(_._2).map(t => (t._2, t._3)).toSeq
      assert(grp == solo, s"stratum $g must match its solo draw")
    }
    val again = Sampling.weightedTakePerGroup(df.repartition(9), "g", "doc_id", "w", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }
}
