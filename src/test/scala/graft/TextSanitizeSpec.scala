package graft

import org.apache.spark.sql.functions._

import graft.ops.TextSanitize

class TextSanitizeSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextSanitize.maskPii(col("t"))).head().getString(0)

  test("maskPii masks emails, urls, ipv4 and phones with typed tokens") {
    assert(clean("write to bob.smith+x@corp.example.co today") ==
      "write to <EMAIL> today")
    assert(clean("see https://ex.org/a?b=1#c and http://plain.io") ==
      "see <URL> and <URL>")
    assert(clean("host 192.168.10.254 is up") == "host <IP> is up")
    assert(clean("call +1 (555) 123-4567 now") == "call <PHONE> now")
  }

  test("masking order: URLs with userinfo/dots don't half-mask") {
    // the @ and dotted digits inside a URL belong to the URL token
    assert(clean("go to https://user@host.example.com/10.0.0.1/x end") ==
      "go to <URL> end")
    // all four kinds in one string
    assert(clean("a@b.io https://c.d 1.2.3.4 +12 345 678 90") ==
      "<EMAIL> <URL> <IP> <PHONE>")
  }

  test("maskPii is idempotent and leaves clean text untouched") {
    val dirty = "mail a@b.co at 10.1.1.1 via https://x.y call +1 234-567-8901"
    assert(clean(clean(dirty)) == clean(dirty))
    val plain = "the quick brown fox, 42 times."
    assert(clean(plain) == plain)
  }

  test("stripBoilerplate drops marker lines, keeps order and content") {
    val doc = Seq(
      "Real paragraph one.",
      "Copyright 2024 MegaCorp. All rights reserved.",
      "Real paragraph two.",
      "This site uses a Cookie Policy.",
      "Real paragraph three.").mkString("\n")
    val out = Seq(doc).toDF("t")
      .select(TextSanitize.stripBoilerplate(col("t"))).head().getString(0)
    assert(out == Seq("Real paragraph one.", "Real paragraph two.",
      "Real paragraph three.").mkString("\n"))
  }

  test("sanitize composes strip + mask") {
    val doc = "Contact a@b.co\nall rights reserved\nvisit https://x.y"
    val out = Seq(doc).toDF("t")
      .select(TextSanitize.sanitize(col("t"))).head().getString(0)
    assert(out == "Contact <EMAIL>\nvisit <URL>")
  }

  test("doc_pii_scrub query masks every planted span at sf0.001") {
    val df = SparkEntry.queries("doc_pii_scrub")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val t = r.getString(1)
      assert(t.contains("<EMAIL>") && t.contains("<URL>") &&
        t.contains("<IP>") && t.contains("<PHONE>"), s"unmasked: $t")
      assert(!t.contains("@example.com") && !t.contains("https://"), s"leak: $t")
    }
  }
}
