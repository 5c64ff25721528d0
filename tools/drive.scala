// Round-11 library-surface drive: entry, SQL registration, and the
// round's new admin/maintained surfaces, end-to-end in a plain
// spark-shell session against the packaged jar.
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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

// 6. merge-on-read delete -> advisor purge; shallow clone; the graft
//    DataSource (planner-pruned SQL read + CDC relation)
val nBefore = MergeTable.read(spark, t).count()
val filesBefore = MergeTable.fileIndex(spark, t)
val vDel = MergeTable.deleteKeys(spark, t,
  spark.range(100, 200).select(col("id").as("doc_id")), "doc_id")
assert(MergeTable.fileIndex(spark, t, vDel) == filesBefore,
  "MoR delete rewrote data files")
assert(MergeTable.read(spark, t).count() == nBefore - 100,
  "ledger not applied on read")
// on a LAID table, ledger debt routes to recluster (the repair both
// re-curves and materializes); the layout-less purge arm is
// DeleteVectorSpec's
val purgeAdvice = MergeTable.advise(spark, t, maxPendingDeleteKeys = 10L)
assert(purgeAdvice.map(_.action) == Seq("recluster"), purgeAdvice.toString)
val c = s"$root/clone"
MergeTable.cloneTable(spark, t, c)
assert(MergeTable.read(spark, c).count() == nBefore - 100,
  "clone must read like its source (ledger included)")
MergeTable.merge(spark, c,
  spark.range(1, 2).select(col("id").as("doc_id"), lit("fork").as("text"),
    lit(9L).as("a"), lit(9L).as("b")), "doc_id")
assert(MergeTable.read(spark, t).filter(col("text") === "fork").count() == 0,
  "clone write leaked into the source")
spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gt USING graft OPTIONS (path '$t')")
val sqlN = spark.sql("SELECT count(*) FROM gt WHERE a >= 1 AND a <= 2 AND doc_id > 10").as[Long].head()
val sqlWant = spark.range(1, 2001).filter((col("id") % 5).between(1, 2) && col("id") > 10 && !col("id").between(100, 199) && col("id") =!= 42).count()
assert(sqlN == sqlWant, s"graft SQL read $sqlN != $sqlWant")
spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gch USING graft OPTIONS (path '$t', changesFrom '$vz', key 'doc_id')")
val cdcDeletes = spark.sql("SELECT count(*) FROM gch WHERE _change = 'delete'").as[Long].head()
assert(cdcDeletes >= 100, s"CDC relation must surface the ledger deletes: $cdcDeletes")

// 7. persisted CHECK constraints gate every writer
import graft.ops.Expectations.InRange
MergeTable.setConstraints(spark, t, Seq(InRange("a", 0L, 100L)))
val gateErr = try {
  MergeTable.merge(spark, t, spark.range(1, 2).select(col("id").as("doc_id"), lit("x").as("text"), lit(999L).as("a"), lit(0L).as("b")), "doc_id"); ""
} catch { case e: IllegalStateException => e.getMessage }
assert(gateErr.contains("in_range:a"), s"constraint gate missing: $gateErr")
MergeTable.clearConstraints(spark, t)

// 8. round-13: aggregate pushdown, Or-pruned reads, merge-key guard,
//    sink replay dedup
val t2 = s"$root/metaagg"
MergeTable.create(spark, t2, spark.range(500).select(col("id").as("doc_id"), (col("id") % 97).as("x")), "doc_id", 4)
spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g13 USING graft OPTIONS (path '$t2')")
val aggQ = spark.sql("SELECT count(*) AS n, count(x) AS nx, min(x) AS mn, max(x) AS mx FROM g13")
assert(!aggQ.queryExecution.executedPlan.toString.contains("Scan GraftRelation"), "metadata aggregate must not scan")
assert(aggQ.as[(Long, Long, Long, Long)].head() == ((500L, 500L, 0L, 96L)), "pushed aggregate values")
val orN = spark.sql("SELECT count(*) FROM g13 WHERE (x >= 0 AND x <= 4) OR (x >= 90 AND x <= 96)").as[Long].head()
assert(orN == spark.range(500).filter((col("id") % 97 <= 4) || (col("id") % 97 >= 90)).count(), "Or-pruned read")
val decQ = spark.sql("SELECT count(*) AS n FROM g13 WHERE doc_id < 1000")
assert(!decQ.queryExecution.executedPlan.toString.contains("Scan GraftRelation"), "a fully-decided filtered count must answer from metadata")
assert(decQ.as[Long].head() == 500L, "decided filtered count value")
val keyErr = try { MergeTable.merge(spark, t2, spark.range(1).select(col("id").as("doc_id"), col("id").as("x")), "x"); "" } catch { case e: IllegalArgumentException => e.getMessage }
assert(keyErr.contains("bucketed on merge key"), s"merge-key guard missing: $keyErr")
val sinkDir = s"$root/sink13"
val sink13 = new graft.sources.GraftSource().createSink(spark.sqlContext, Map("path" -> sinkDir, "key" -> "doc_id", "txnAppId" -> "drive13"), Seq.empty, org.apache.spark.sql.streaming.OutputMode.Update())
sink13.addBatch(0L, spark.range(3).select(col("id").as("doc_id")))
sink13.addBatch(0L, spark.range(9).select(col("id").as("doc_id")))
assert(MergeTable.versions(spark, sinkDir) == Seq(1), "replayed sink batch must not re-commit")
assert(MergeTable.read(spark, sinkDir).count() == 3, "replayed batch content must not land")

// 9. round-15: SUM/AVG pushdown, zone-pruned top-k, bare-limit subset,
//    and the streaming graft SOURCE tailing an independent writer
val sumQ = spark.sql("SELECT sum(x) AS sx, avg(x) AS ax FROM g13")
assert(!sumQ.queryExecution.executedPlan.toString.contains("Scan GraftRelation"), "SUM/AVG must answer from format-4 sum lines")
val (sx, ax) = sumQ.as[(Long, Double)].head()
val wantSx = spark.range(500).select(sum(col("id") % 97)).as[Long].head()
assert(sx == wantSx && math.abs(ax - wantSx.toDouble / 500.0) < 1e-12, s"pushed sum/avg values: $sx $ax")
val topQ = spark.read.format("graft").option("path", t2).load().orderBy(col("doc_id").desc).limit(3)
assert(topQ.as[(Long, Long)].collect().map(_._1).toSeq == Seq(499L, 498L, 497L), "zone-pruned top-k rows")
assert(topQ.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"), "top-k must keep TakeOrderedAndProject")
assert(spark.read.format("graft").option("path", t2).load().limit(7).count() == 7L, "bare-limit subset")
val streamSink = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
val sq = spark.readStream.format("graft").option("path", t2).load().writeStream.option("checkpointLocation", s"$root/ckpt15").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.collect().foreach(r => streamSink.add((r.getString(0), r.getLong(1)))); () }.start()
sq.awaitTermination(120000L)
assert(streamSink.size == 500 && streamSink.asScala.forall(_._1 == "insert"), s"stream snapshot: ${streamSink.size}")
MergeTable.merge(spark, t2, spark.range(1).select(lit(9999L).as("doc_id"), lit(1L).as("x")), "doc_id")
val sq2 = spark.readStream.format("graft").option("path", t2).load().writeStream.option("checkpointLocation", s"$root/ckpt15").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.collect().foreach(r => streamSink.add((r.getString(0), r.getLong(1)))); () }.start()
sq2.awaitTermination(120000L)
assert(streamSink.size == 501 && streamSink.asScala.exists(e => e._1 == "insert" && e._2 == 9999L), s"stream delta: ${streamSink.size}")

println("DRIVE_OK")
sys.exit(0)
