package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** [[MergeTable.deleteKeys]] — merge-on-read deletes (the Iceberg-v2
  * equality-delete / Delta deletion-vector shape): a delete commit
  * rewrites NO data file; every read path applies the ledger; rewrites
  * materialize exactly their buckets' pending deletes and carry the
  * rest by reference; the change feed sees ledger-only commits.
  */
class DeleteVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-dv").toString

  private def rows(df: DataFrame): Map[Long, (String, Double)] =
    df.select("id", "name", "score").as[(Long, String, Double)]
      .collect().map { case (i, n, s) => i -> (n, s) }.toMap

  private def df(m: Map[Long, (String, Double)]): DataFrame =
    m.toSeq.map { case (i, (n, s)) => (i, n, s) }.toDF("id", "name", "score")

  private val base: Map[Long, (String, Double)] =
    (0L until 100L).map(i => i -> (s"name$i", i * 1.5)).toMap

  private def crc(dir: String, rel: String): Long = {
    val c = new java.util.zip.CRC32
    c.update(Files.readAllBytes(new java.io.File(dir, rel).toPath))
    c.getValue
  }

  test("deleteKeys commits with ZERO data rewrite; reads apply the ledger; time travel intact") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    val filesV1 = MergeTable.fileIndex(spark, dir, 1).values.flatten.toSeq.sorted
    val crcV1 = filesV1.map(r => r -> crc(dir, r)).toMap

    val dropped = (0L until 100L).filter(_ % 7 == 2)
    val v2 = MergeTable.deleteKeys(spark, dir, dropped.toDF("id"), "id")
    assert(v2 == 2)

    // the data file set is IDENTICAL, byte for byte — the whole point
    val filesV2 = MergeTable.fileIndex(spark, dir, 2).values.flatten.toSeq.sorted
    assert(filesV2 == filesV1, "delete must not touch data entries")
    filesV1.foreach(r => assert(crc(dir, r) == crcV1(r), s"$r rewritten"))

    // logical read excludes the keys; time travel to v1 sees them
    assert(rows(MergeTable.read(spark, dir)) ==
      base.filter { case (k, _) => k % 7 != 2 })
    assert(rows(MergeTable.read(spark, dir, 1)) == base)

    // ledger is visible, bucketed, counted
    val dv = MergeTable.pendingDeletes(spark, dir)
    assert(dv.nonEmpty && dv.map(_.rows).sum == dropped.size)
    assert(dv.forall(d => d.rel.startsWith("d2/")))

    // absent keys and re-deletes dedup away: a pure-duplicate batch
    // no-ops at the current version
    assert(MergeTable.deleteKeys(spark, dir, dropped.toDF("id"), "id") == 2)
    // a batch of absent keys still commits (they are unverifiable
    // without a scan) but the live read is unchanged
    val v3 = MergeTable.deleteKeys(spark, dir, Seq(100000L).toDF("id"), "id")
    assert(v3 == 3)
    assert(rows(MergeTable.read(spark, dir)) ==
      base.filter { case (k, _) => k % 7 != 2 })

    // key type is table-normalized: deleting with INT keys hits LONG rows
    val v4 = MergeTable.deleteKeys(spark, dir, Seq(5, 6).toDF("id"), "id")
    assert(rows(MergeTable.read(spark, dir, v4)) ==
      base.filter { case (k, _) => k % 7 != 2 && k != 5 && k != 6 })

    // a ledger on a different key column refuses loudly — it would sit
    // in buckets unrelated to the rows it deletes (the recorded merge
    // key is the table's bucketing)
    val e = intercept[IllegalArgumentException] {
      MergeTable.deleteKeys(spark, dir, Seq("x").toDF("name"), "name")
    }
    assert(e.getMessage.contains("bucketed on merge key"))
  }

  test("merge materializes touched buckets' pending deletes and carries the rest by reference") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    val dropped = (0L until 100L).filter(_ % 5 == 1)
    MergeTable.deleteKeys(spark, dir, dropped.toDF("id"), "id")
    val dvBefore = MergeTable.pendingDeletes(spark, dir)
    val dvCrc = dvBefore.map(d => d.rel -> crc(dir, d.rel)).toMap

    // one upsert key: exactly one touched bucket. 11 was dv-deleted;
    // upserting it resurrects it with the new image.
    val v = MergeTable.merge(spark, dir,
      Seq((11L, "back", 9.9, false)).toDF("id", "name", "score", "_del"),
      "id", deleteCol = Some("_del"))
    val touched = MergeTable.changedBucketIds(spark, dir, 2, v)

    val dvAfter = MergeTable.pendingDeletes(spark, dir)
    // touched buckets' ledger entries are GONE (materialized by the
    // rewrite); untouched buckets' ledger files carry byte-identical
    assert(dvAfter.forall(d => !touched.contains(d.bucket)))
    val carried = dvBefore.filterNot(d => touched.contains(d.bucket))
    assert(dvAfter.map(_.rel).sorted == carried.map(_.rel).sorted)
    dvAfter.foreach(d => assert(crc(dir, d.rel) == dvCrc(d.rel)))

    // logical content: base minus dropped, 11 resurrected
    val want = base.filter { case (k, _) => k % 5 != 1 } + (11L -> ("back", 9.9))
    assert(rows(MergeTable.read(spark, dir)) == want)

    // dv-deleted keys in the TOUCHED bucket that were NOT upserted
    // stay deleted after materialization
    val touchedSet = touched.toSet
    val bucketOf = df(base).select(col("id"),
        pmod(hash(col("id")), lit(4)).as("b"))
      .as[(Long, Int)].collect().toMap
    val sameBucketDropped = dropped.filter(k => touchedSet.contains(bucketOf(k)))
    assert(sameBucketDropped.nonEmpty, "fixture must cover this arm")
    assert(sameBucketDropped.filterNot(_ == 11L)
      .forall(k => !rows(MergeTable.read(spark, dir)).contains(k)))
  }

  test("purgeDeletes materializes ∝ dv buckets; compact clears everything; content invariant") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 8)
    // a handful of keys → only their buckets have ledger entries
    MergeTable.deleteKeys(spark, dir, Seq(3L, 4L).toDF("id"), "id")
    val before = rows(MergeTable.read(spark, dir))
    val dvBuckets = MergeTable.pendingDeletes(spark, dir).map(_.bucket).distinct
    val untouched = MergeTable.fileIndex(spark, dir)
      .filterNot { case (b, _) => dvBuckets.contains(b) }

    val v = MergeTable.purgeDeletes(spark, dir)
    assert(MergeTable.pendingDeletes(spark, dir).isEmpty)
    assert(rows(MergeTable.read(spark, dir, v)) == before, "purge is content-invariant")
    // only the dv buckets were rewritten
    val after = MergeTable.fileIndex(spark, dir, v)
    untouched.foreach { case (b, fs) => assert(after(b) == fs, s"bucket $b rewritten") }
    // physical rows actually shrank (the deleted rows are gone from disk)
    assert(MergeTable.history(spark, dir)
      .filter(col("version") === v).select("n_rows").as[Long].head() == 98L)
    // idempotent: nothing pending → no-op at the current version
    assert(MergeTable.purgeDeletes(spark, dir) == v)

    // metaAggregate refuses under pending deletes, works after purge
    MergeTable.deleteKeys(spark, dir, Seq(10L).toDF("id"), "id")
    val e = intercept[IllegalArgumentException] {
      MergeTable.metaAggregate(spark, dir, Seq("score"))
    }
    assert(e.getMessage.contains("pending merge-on-read"))
    MergeTable.compact(spark, dir)
    assert(MergeTable.pendingDeletes(spark, dir).isEmpty)
    assert(MergeTable.metaAggregate(spark, dir, Seq("score"))
      .select("n_rows").as[Long].head() == 97L)
  }

  test("change feed sees a ledger-only commit: deletes of present keys, nothing else") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    MergeTable.deleteKeys(spark, dir,
      Seq(7L, 8L, 100000L).toDF("id"), "id") // 100000 absent
    val ch = MergeTable.changes(spark, dir, 1, 2, "id")
      .select("_change", "id").as[(String, Long)].collect().toSeq.sorted
    assert(ch == Seq(("delete", 7L), ("delete", 8L)))
    // signed deltas: two -1 pre-images
    val rd = MergeTable.rowDeltas(spark, dir, 1, 2, "id")
      .select("_sign", "id").as[(Int, Long)].collect().toSeq.sorted
    assert(rd == Seq((-1, 7L), (-1, 8L)))
    // changedBucketIds flags exactly the ledgered buckets — the absent
    // key's bucket included (its ledger file changed that bucket's
    // metadata, even though no row matched)
    val want = Seq(7L, 8L, 100000L).toDF("id")
      .select(pmod(hash(col("id")), lit(4))).as[Int].collect().toSet
    assert(MergeTable.changedBucketIds(spark, dir, 1, 2).toSet == want)
  }

  test("pruned reads stay exact under a pending ledger; vacuum respects carried ledger files") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    MergeTable.clusterBy(spark, dir, "score", filesPerBucket = 2)
    MergeTable.deleteKeys(spark, dir,
      (0L until 100L).filter(_ % 3 == 0).toDF("id"), "id")
    val live = base.filter { case (k, _) => k % 3 != 0 }

    // zone-pruned range scan applies the ledger
    val got = MergeTable.readWhere(spark, dir, "score",
        BigDecimal(30), BigDecimal(90))
      .select("id").as[Long].collect().toSet
    assert(got == live.keySet.filter(k => k * 1.5 >= 30 && k * 1.5 <= 90))

    // bucket-pruned key lookup applies the ledger
    val lookup = MergeTable.readForKeys(spark, dir,
        Seq(3L, 4L, 5L).toDF("id"), "id")
      .select("id").as[Long].collect().toSet
    assert(lookup == Set(4L, 5L))

    // readBuckets applies the ledger for its buckets
    val all = MergeTable.readBuckets(spark, dir, 0 until 4)
      .select("id").as[Long].collect().toSet
    assert(all == live.keySet)

    // merge one key (materializes ITS bucket), then vacuum to the
    // latest version only: carried ledger files survive, the rest of
    // the reclaimable surface goes — and the table still reads right
    val v = MergeTable.merge(spark, dir,
      Seq((200L, "n", 1.0, false)).toDF("id", "name", "score", "_del"),
      "id", deleteCol = Some("_del"))
    val carried = MergeTable.pendingDeletes(spark, dir, v).map(_.rel)
    assert(carried.nonEmpty)
    MergeTable.vacuum(spark, dir, keepVersions = 1)
    carried.foreach(r =>
      assert(new java.io.File(dir, r).exists(), s"carried ledger $r vacuumed"))
    assert(rows(MergeTable.read(spark, dir)) == live + (200L -> ("n", 1.0)))

    // now materialize everything; vacuum reclaims every d*/ ledger file
    MergeTable.compact(spark, dir)
    MergeTable.vacuum(spark, dir, keepVersions = 1)
    val leftover = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isDirectory && f.getName.matches("d\\d+"))
      .flatMap(d => d.listFiles().flatMap(b =>
        Option(b.listFiles()).getOrElse(Array.empty)))
    assert(leftover.isEmpty, s"unreclaimed ledger files: ${leftover.toSeq}")
  }

  test("advisor flags ledger debt past the threshold; maintain purges and quiets the table") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    MergeTable.deleteKeys(spark, dir, (0L until 20L).toDF("id"), "id")
    // below the threshold: ledger debt tolerated, no advice
    assert(MergeTable.advise(spark, dir, maxPendingDeleteKeys = 100L).isEmpty)
    // past it: ONE purge naming exactly the ledgered data buckets
    val advice = MergeTable.advise(spark, dir, maxPendingDeleteKeys = 10L)
    val want = MergeTable.pendingDeletes(spark, dir).map(_.bucket).distinct.sorted
    assert(advice.map(a => (a.action, a.buckets)) == Seq("purge" -> want))
    val applied = MergeTable.maintain(spark, dir, maxPendingDeleteKeys = 10L)
    assert(applied.map(_._1.action) == Seq("purge"))
    assert(MergeTable.pendingDeletes(spark, dir).isEmpty)
    assert(MergeTable.advise(spark, dir, maxPendingDeleteKeys = 10L).isEmpty)
    assert(rows(MergeTable.read(spark, dir)) ==
      base.filter { case (k, _) => k >= 20L })
  }

  test("recluster under a ledger: targets materialize, layout repairs, scan exact") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      (0L until 4000L).map(i => (i, i % 64, (i * 37) % 64))
        .toDF("id", "x", "y"), "id", nBuckets = 4)
    MergeTable.clusterByZ(spark, dir, Seq("x", "y"), filesPerBucket = 4)
    MergeTable.deleteKeys(spark, dir,
      (0L until 4000L).filter(_ % 11 == 0).toDF("id"), "id")
    val dvBuckets = MergeTable.pendingDeletes(spark, dir).map(_.bucket).distinct
    MergeTable.reclusterBuckets(spark, dir, Seq("x", "y"), dvBuckets)
    assert(MergeTable.pendingDeletes(spark, dir).isEmpty)
    val got = MergeTable.readWhereAll(spark, dir, Seq(
        ("x", BigDecimal(8), BigDecimal(23)),
        ("y", BigDecimal(8), BigDecimal(23))))
      .select("id").as[Long].collect().toSet
    val want = (0L until 4000L).filter(i => i % 11 != 0 &&
      (i % 64) >= 8 && (i % 64) <= 23 &&
      ((i * 37) % 64) >= 8 && ((i * 37) % 64) <= 23).toSet
    assert(got == want)
  }
}
