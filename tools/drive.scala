// Round-11 library-surface drive: entry, SQL registration, and the
// round's new admin/maintained surfaces, end-to-end in a plain
// spark-shell session against the packaged jar.
import org.apache.spark.sql.functions._

val sf = "/root/testdata/sf0.001"

// 1. driver smoke: flagship entry returns rows
val entryRows = graft.SparkEntry.entry(spark).count()
assert(entryRows > 0, s"entry empty: $entryRows")

// 2. SQL surface
graft.Graft.registerAll(spark)
graft.Graft.registerTables(spark, sf)
val chunks = spark.sql(
  "SELECT doc_id, chunk FROM documents LATERAL VIEW split_text(text, 700, 200) t AS idx, chunk LIMIT 5").count()
assert(chunks > 0, "split_text SQL surface")
val masked = spark.sql(
  "SELECT mask_pii('mail me at a@b.com') AS m").head().getString(0)
assert(!masked.contains("a@b.com"), s"mask_pii: $masked")

// 3. lakehouse admin loop: create -> merge -> clusterByZ ->
//    readWhereAll -> optimize -> advise -> maintain -> history ->
//    forget (one call, maintained artifacts)
import graft.pipeline.MergeTable
import graft.streaming.{CorpusViews, Maintained}
val root = java.nio.file.Files.createTempDirectory("graft-drive").toString
val t = s"$root/t"
val docs = spark.range(1, 2001).select(
  col("id").as("doc_id"),
  concat(lit("document body number "), col("id")).as("text"),
  (col("id") % 5).cast("long").as("a"),
  ((col("id") * 31) % 89).cast("long").as("b"))
MergeTable.create(spark, t, docs, "doc_id", 4)
MergeTable.merge(spark, t,
  spark.range(1, 11).select(col("id").as("doc_id"),
    lit("rewritten").as("text"), lit(0L).as("a"), lit(0L).as("b")),
  "doc_id")
val vz = MergeTable.clusterByZ(spark, t, Seq("a", "b"), filesPerBucket = 8)
val got = MergeTable.readWhereAll(spark, t,
  Seq(("a", BigDecimal(1), BigDecimal(2)), ("b", BigDecimal(0), BigDecimal(40)))).count()
// rewritten rows 1..10 have a=0, excluded by the a-filter
val want = spark.range(1, 2001).filter((col("id") % 5).between(1, 2) && ((col("id") * 31) % 89).between(0, 40) && col("id") > 10).count()
assert(got == want, s"zorder scan $got != $want")
val (vo, compacted) = MergeTable.optimize(spark, t, targetFilesPerBucket = 2)
assert(compacted.nonEmpty, "optimize must coalesce the clustered layout")
// advise -> apply -> history: the optimize pass coalesced but
// UN-ORDERED its buckets, so the advisor flags exactly those for a
// layout repair; one maintain() quiets the table again
val advice = MergeTable.advise(spark, t)
assert(advice.map(_.action) == Seq("recluster"), advice.toString)
assert(advice.head.buckets.sorted == compacted.sorted,
  s"advice ${advice.head.buckets} != compacted $compacted")
val maintained = MergeTable.maintain(spark, t)
assert(maintained.size == 1 && MergeTable.advise(spark, t).isEmpty,
  "maintain must quiet the table")
val hist = MergeTable.history(spark, t).select("op").as[String].collect().toSeq
assert(hist == Seq("create", "merge", "cluster_z", "compact_buckets",
  "cluster_z"), hist.toString)

// 4. maintained family + one-call erasure
val stats = CorpusViews.StatsView(s"$root/stats", "a", "b")
val prof = CorpusViews.ProfileView(s"$root/prof", Seq("doc_id", "text", "a", "b"))
val card = CorpusViews.CardView(s"$root/card",
  filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0), langCol = "a")
val vHead = MergeTable.latestVersion(spark, t)
Seq(stats, prof, card).foreach(_.advance(spark, t, vHead))
assert(prof.latest(spark).count() > 0, "maintained profile")
assert(card.latest(spark).count() > 0, "maintained card")
val audit = Maintained.forget(spark, t, "doc_id", Seq(42L),
  Seq(stats, prof, card)).as[(String, Long)].collect()
assert(audit.forall(_._2 == 0L), s"forget residuals: ${audit.toSeq}")
assert(MergeTable.read(spark, t).filter(col("doc_id") === 42L).count() == 0)

// 5. expectations gate + quarantine string shape
import graft.ops.Expectations._
val (ok, bad) = quarantine(
  Seq((1L, Some("en")), (2L, None)).toDF("id", "lang"), Seq(NotNull("lang")))
assert(ok.count() == 1 && bad.count() == 1, "quarantine split")

println("DRIVE_OK")
sys.exit(0)
