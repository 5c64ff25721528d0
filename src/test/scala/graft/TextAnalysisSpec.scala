package graft

import org.apache.spark.sql.functions._

import graft.ops.{Functions, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is happy for a while"),
      (2L, "el gato y la casa de los perros en un día por la mañana"),
      (3L, "der hund und die katze ist ein tier von dem haus")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).getField("lang"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de"))
  }

  test("token and subword counts") {
    val df = Seq((1L, "hello world, this is sparkly!")).toDF("id", "text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.subwordCount(col("text"))).as[(Int, Int)].head()
    assert(got._1 == 5)
    // hell+o wor+ld , this is spar+kly ! → 10
    assert(got._2 == 10)
  }

  test("quality score favors diverse natural text over degenerate text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (2L, "spam spam spam spam spam spam spam spam spam spam")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.qualityScore(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L))
    assert(got.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("scalar function pack P1-P11 behaviors") {
    val df = Seq(("  ", "Heading 1", "Таблица 1 — размеры", "my file:name.png"))
      .toDF("blank", "style", "caption", "fname")
    val row = df.select(
      Functions.nonEmptyText(col("blank")),
      Functions.isHeading(col("style")),
      Functions.isCaption(lit("Normal"), col("caption")),
      Functions.captionKind(col("caption")),
      Functions.sanitizeName(col("fname")),
      Functions.normalizeWs(lit("a   b\t c")),
      Functions.embedKey(lit("T"), lit("x")),
      Functions.fileExt(col("fname"), lit("image/png"))).head()
    assert(row.getBoolean(0) == false)
    assert(row.getBoolean(1) == true)
    assert(row.getBoolean(2) == true)
    assert(row.getString(3) == "table")
    assert(row.getString(4) == "my_file_name.png")
    assert(row.getString(5) == "a b c")
    assert(row.getString(6) == "T: x")
    assert(row.getString(7) == ".png")
  }

  test("contentId is deterministic and distinct") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val ids = df.select(Functions.contentId(col("k"), col("v"))).as[String].collect()
    assert(ids(0) == ids(1) && ids(0) != ids(2))
  }

  test("fuzzyRatio: identical 1.0, nothing shared near 0") {
    val df = Seq(("kitten", "kitten"), ("kitten", "sitting")).toDF("a", "b")
    val got = df.select(Functions.fuzzyRatio(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1.0)
    assert(got(1) > 0.5 && got(1) < 0.7) // lev 3 / len 7 → ~0.571
  }

  test("soundsLike matches phonetic variants") {
    val df = Seq(("Robert", "Rupert"), ("Robert", "Alice")).toDF("a", "b")
    val got = df.select(Functions.soundsLike(col("a"), col("b"))).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false))
  }

  test("repetitionProfile: template spam scores high, prose scores low") {
    import spark.implicits._
    val df = Seq(
      (1L, "buy now " * 30), // one trigram dominates
      (2L, "the quick brown fox jumps over a lazy dog near the riverbank today"),
      (3L, "a b")) // <3 tokens: no row
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.repetitionProfile(df)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 > 0.4, s"spam top-trigram: ${out(1L)}")
    assert(out(1L)._2 < 0.1, s"spam uniq ratio: ${out(1L)}")
    assert(out(2L)._1 < 0.15 && out(2L)._2 == 1.0, s"prose: ${out(2L)}")
  }

  test("gopherRules gates each heuristic independently") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog sat in a warm home today"), // all rules pass
      (2L, "a b"),                                          // too few words
      (3L, "zz xx qq ww rr tt yy uu ii oo"),                // zero stopword hits
      (4L, "12345 67890 11111 22222 33333 44444 55555 66666")) // alpha_frac 0
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.ops.TextAnalysis.gopherRules(col("text"),
          minWords = 5, minMeanLen = 2.0).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
        col("g.alpha_frac"), col("g.stop_hits"), col("g.passes"))
      .as[(Long, Int, Double, Double, Int, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._6, s"doc 1 should pass: ${got(1L)}")
    assert(got(1L)._2 === 11 && got(1L)._5 === 5)
    assert(got(1L)._3 === math.rint(34.0 / 11 * 1e4) / 1e4)
    assert(!got(2L)._6 && got(2L)._2 === 2)
    assert(!got(3L)._6 && got(3L)._5 === 0)
    assert(!got(4L)._6 && got(4L)._4 === 0.0)
  }

  test("charTrigramLm scores in-distribution text above junk") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the cat  sat on the hat"), // double space → normalized
      (3L, "en", "zqxj vkpw qqzz xjvk"),
      (4L, "de", "der hund und der mond"))
      .toDF("doc_id", "lang", "text")
    val got = graft.ops.TextAnalysis.charTrigramLm(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 4)
    assert(got(1L)._2 == "the cat sat on the mat".length - 2L)
    assert(got(2L)._2 == "the cat sat on the hat".length - 2L)
    assert(got.values.forall(_._3 < 0.0), "log-probs are negative")
    // docs sharing the corpus's frequent trigrams outscore unique junk
    assert(got(1L)._3 > got(3L)._3, s"$got")
    assert(got(2L)._3 > got(3L)._3)
  }

  test("charEntropy: hand-computed values, repetition ranks low, empty text drops") {
    val df = Seq(
      (1L, "aaaa"),           // single symbol: H = 0
      (2L, "abab"),           // two equiprobable symbols: H = ln 2
      (3L, "abcd"),           // four equiprobable: H = ln 4
      (4L, "spam spam spam spam spam"),
      (5L, "the quick brown fox jumps over the lazy dog"),
      (6L, ""))               // no distribution to measure
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.charEntropy(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got.contains(6L), "empty text must produce no row")
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L)._2 == math.rint(math.log(2) * 1e4) / 1e4)
    assert(got(3L)._2 == math.rint(math.log(4) * 1e4) / 1e4)
    assert(got(4L)._1 == 24L)
    assert(got(4L)._2 < got(5L)._2, "repetitive spam must rank below prose")
    // invariant to physical layout
    val re = graft.ops.TextAnalysis.charEntropy(df.repartition(7))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(re == got)
  }

  test("topKeywords: hand-computed tf-idf ranks, lexicographic tie-break, layout invariance") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val toksCol = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.topKeywords(d, toksCol, k = 2)
        .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // N=3; df: apple 1, date 1 → idf_fp floor(ln(2)·1e6) = 693147;
    //          banana 2, cherry 2 → floor(ln(4/3)·1e6) = 287682
    val ln2 = math.floor(math.log(4.0 / 2.0) * 1e6).toLong
    val ln43 = math.floor(math.log(4.0 / 3.0) * 1e6).toLong
    val want = Seq(
      (1L, 1L, "apple", 2 * ln2), (1L, 2L, "banana", ln43),
      (2L, 1L, "banana", ln43), (2L, 2L, "cherry", ln43), // tie → term ASC
      (3L, 1L, "cherry", 3 * ln43), (3L, 2L, "date", ln2))
    assert(run(df) == want)
    assert(run(df.repartition(7)) == want, "layout must not move the ranks")
  }
}
