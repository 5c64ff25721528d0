package graft

import org.apache.spark.sql.functions._

import graft.ops.Privacy

/** [[graft.ops.Privacy]] — k-anonymity suppression, l-diversity and
  * the audit profile: exact suppression semantics incl. NULL quasi
  * groups, the l=1 degrade, and schema preservation. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (id, zip, age-band, diagnosis): a classic quasi-identifier fixture
  private def fixture = Seq(
    (1L, "02139", "30s", "flu"), (2L, "02139", "30s", "cold"),
    (3L, "02139", "30s", "flu"), (4L, "02139", "40s", "flu"),
    (5L, "94110", "20s", "flu"), (6L, "94110", "20s", "flu"),
    (7L, "94110", "20s", "flu"), (8L, null, "30s", "cold"),
    (9L, null, "30s", "flu"), (10L, null, "30s", "flu"))
    .toDF("id", "zip", "band", "dx")

  test("kAnonymize keeps only combinations of size >= k, including the NULL group") {
    val got = Privacy.kAnonymize(fixture, Seq("zip", "band"), k = 3)
      .select("id").as[Long].collect().toSet
    // (02139,30s)=3, (94110,20s)=3, (null,30s)=3 survive; (02139,40s)=1 out.
    // NULL zip is a shared (missing) value — its group must count, not drop.
    assert(got == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L, 10L))
  }

  test("lDiversify additionally requires l distinct sensitive values") {
    val got = Privacy.lDiversify(fixture, Seq("zip", "band"), "dx", k = 3, l = 2)
      .select("id").as[Long].collect().toSet
    // (94110,20s) is 3-anonymous but all-flu → leaks dx, suppressed
    assert(got == Set(1L, 2L, 3L, 8L, 9L, 10L))
  }

  test("l = 1 degrades lDiversify to plain kAnonymize") {
    val a = Privacy.lDiversify(fixture, Seq("zip", "band"), "dx", k = 3, l = 1)
      .select("id").as[Long].collect().toSet
    val b = Privacy.kAnonymize(fixture, Seq("zip", "band"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("anonymityProfile reports size, diversity and the policy verdict per combination") {
    val prof = Privacy.anonymityProfile(
        fixture, Seq("zip", "band"), k = 3, sensitiveCol = Some("dx"), l = 2)
      .select("zip", "band", "n", "n_sensitive", "suppressed")
      .as[(Option[String], String, Long, Long, Boolean)].collect().toSet
    assert(prof == Set(
      (Some("02139"), "30s", 3L, 2L, false),
      (Some("02139"), "40s", 1L, 1L, true),
      (Some("94110"), "20s", 3L, 1L, true),
      (None, "30s", 3L, 2L, false)))
  }

  test("suppression preserves schema and row content") {
    val out = Privacy.kAnonymize(fixture, Seq("zip", "band"), k = 3)
    assert(out.columns.toSeq == fixture.columns.toSeq)
    val row = out.filter(col("id") === 5L)
      .as[(Long, String, String, String)].head()
    assert(row == ((5L, "94110", "20s", "flu")))
  }

  test("forgottenAudit counts residuals per artifact, in declaration order, and is sensitive") {
    val corpus = Seq((1L, "a"), (3L, "c")).toDF("doc_id", "text")
    val cleanIdx = Seq((1L, "t1"), (3L, "t3")).toDF("doc_id", "term")
    // a leaking artifact: the deleted ids 2 and 4 both survive here
    val leaky = Seq((2L, "x"), (4L, "y"), (4L, "z")).toDF("doc_id", "fp")
    val got = Privacy.forgottenAudit(Seq(2L, 4L), Seq(
        ("corpus", corpus, "doc_id"),
        ("index", cleanIdx, "doc_id"),
        ("fingerprints", leaky, "doc_id")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("corpus", 0L), ("index", 0L), ("fingerprints", 3L)))
    intercept[IllegalArgumentException](
      Privacy.forgottenAudit(Nil, Seq(("corpus", corpus, "doc_id"))))
    intercept[IllegalArgumentException](
      Privacy.forgottenAudit(Seq(1L), Seq(
        ("a", corpus, "doc_id"), ("a", cleanIdx, "doc_id"))))
  }
}
