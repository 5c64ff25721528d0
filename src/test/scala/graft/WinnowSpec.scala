package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Winnow

/** [[Winnow]] — the distributed winnowing fingerprints must agree with
  * an in-memory reference of the same integer algorithm, guarantee
  * detection of any shared run ≥ k+w−1 chars, be invariant to
  * partitioning, and zero-count documents too short to fingerprint.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** In-memory reference: identical base-31 mod-2³¹ fold + windowed min. */
  private def refFingerprints(text: String): Set[Long] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (t.length < K + W - 1) return Set.empty
    val hs = (0 to t.length - K).map { i =>
      (0 until K).foldLeft(0L)((h, j) => (h * 31L + t.charAt(i + j).toLong) % Winnow.Mod)
    }
    (W - 1 until hs.length).map(i => hs.slice(i - W + 1, i + 1).min).toSet
  }

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "completely unrelated words xylophone quartz vivid jackdaws zephyr",
    // 3 shares a long passage with 1 (boilerplate case)
    3L -> "INTRO TEXT the quick brown fox jumps over the lazy dog OUTRO",
    4L -> "short doc", // < K+W-1 = 11 normalized chars
    5L -> "another fully distinct document about winnowing guarantees here")

  private def df: DataFrame = docs.toDF("doc_id", "text")

  test("fingerprints match the in-memory reference per document") {
    val got = Winnow.fingerprints(df, k = K, w = W)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (d, fs) => d -> fs.map(_._2).toSet }
    docs.foreach { case (id, text) =>
      val want = refFingerprints(text)
      assert(got.getOrElse(id, Set.empty[Long]) == want, s"doc $id")
    }
  }

  test("a shared run of at least k+w-1 chars yields a common fingerprint") {
    val fps = Winnow.fingerprints(df, k = K, w = W)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (d, fs) => d -> fs.map(_._2).toSet }
    assert((fps(1L) & fps(3L)).nonEmpty, "boilerplate passage must be caught")
    assert((fps(1L) & fps(2L)).isEmpty, "unrelated docs must not collide")
  }

  test("dupPassageStats flags exactly the boilerplate pair and keeps short docs") {
    val stats = Winnow.dupPassageStats(df, k = K, w = W)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats.keySet == docs.map(_._1).toSet, "every doc present")
    assert(stats(4L) == ((0L, 0L)), "short doc has zero counts")
    assert(stats(1L)._2 > 0 && stats(3L)._2 > 0, "shared passage counted on both sides")
    assert(stats(2L)._2 == 0 && stats(5L)._2 == 0, "distinct docs share nothing")
    stats.values.foreach { case (nFp, nShared) => assert(nShared <= nFp) }
  }

  test("invariant to input partitioning") {
    val a = Winnow.dupPassageStats(df, k = K, w = W).as[(Long, Long, Long)].collect().toSet
    val b = Winnow.dupPassageStats(df.repartition(7), k = K, w = W)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("scan-local rolling-hash twin emits the identical fingerprint set") {
    val win = Winnow.fingerprints(df, k = K, w = W).as[(Long, Long)].collect().toSet
    val scan = Winnow.fingerprintsScan(df, k = K, w = W).as[(Long, Long)].collect().toSet
    assert(scan == win)
    val statsWin = Winnow.dupPassageStats(df, k = K, w = W)
      .as[(Long, Long, Long)].collect().toSet
    val statsScan = Winnow.dupPassageStats(df, k = K, w = W, scanLocal = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(statsScan == statsWin)
  }

  test("long documents terminate fast and twins agree at default k=16 w=8") {
    // The round-6 implementation was O(L³·k) at runtime and hung on 50
    // documents of ~300 chars; 200 docs × ~2000 chars would take hours
    // under that pathology and finishes in seconds under either current
    // shape. Deterministic word soup with planted shared passages.
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    val boiler = "this shared boilerplate passage recurs across many documents verbatim"
    val rng = new scala.util.Random(42)
    val longDocs = (1L to 200L).map { id =>
      val body = Seq.fill(300)(words(rng.nextInt(words.length))).mkString(" ")
      val text = if (id % 3 == 0) s"$boiler $body" else body
      id -> text
    }
    val ldf = longDocs.toDF("doc_id", "text")
    val win = Winnow.dupPassageStats(ldf).as[(Long, Long, Long)].collect().toSet
    val scan = Winnow.dupPassageStats(ldf, scanLocal = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(scan == win)
    // every boilerplate-carrying doc must show shared fingerprints
    val shared = win.map(r => r._1 -> r._3).toMap
    (1L to 200L).filter(_ % 3 == 0).foreach(id => assert(shared(id) > 0, s"doc $id"))
  }

  test("winnowing selects at most one fingerprint per window position") {
    // density sanity: selected ≤ n-w+1 windows, and ≥ 1 for any doc long enough
    val fps = Winnow.fingerprints(df, k = K, w = W)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.length).toMap
    docs.filter(_._2.length >= K + W - 1).foreach { case (id, text) =>
      val n = text.toLowerCase.replaceAll("\\s+", " ").trim.length - K + 1
      assert(fps(id) >= 1 && fps(id) <= n - W + 1, s"doc $id density")
    }
  }
}
