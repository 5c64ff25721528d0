package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** [[MergeTable]] — upsert/delete semantics against an in-memory
  * reference, the copy-on-write contract (untouched buckets carried by
  * reference), time travel, compaction invariance, dead-writer orphans,
  * and vacuum reclamation.
  */
class MergeTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-mergetable").toString

  private def rows(df: DataFrame): Map[Long, (String, Double)] =
    df.select("id", "name", "score").as[(Long, String, Double)]
      .collect().map { case (i, n, s) => i -> (n, s) }.toMap

  private def df(m: Map[Long, (String, Double)]): DataFrame =
    m.toSeq.map { case (i, (n, s)) => (i, n, s) }.toDF("id", "name", "score")

  private val base: Map[Long, (String, Double)] =
    (0L until 100L).map(i => i -> (s"name$i", i * 1.5)).toMap

  test("history: one row per version with its op, footprint and deltas — from metadata only") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    // +5 inserts, -3 deletes → rows_delta = +2
    val upd = ((100L until 105L).map(i => (i, s"new$i", 9.0, false)) ++
      Seq(1L, 2L, 3L).map(i => (i, "", 0.0, true)))
      .toDF("id", "name", "score", "_del")
    MergeTable.merge(spark, dir, upd, "id", deleteCol = Some("_del"))
    MergeTable.compact(spark, dir)
    MergeTable.rebucket(spark, dir, "id", 8)
    MergeTable.clusterBy(spark, dir, "score", filesPerBucket = 2)
    val h = MergeTable.history(spark, dir)
      .select("version", "op", "n_buckets", "n_files", "n_rows",
        "files_added", "files_removed", "rows_delta")
      .as[(Int, String, Int, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(h.map(r => (r._1, r._2)) == Seq(
      1 -> "create", 2 -> "merge", 3 -> "compact",
      4 -> "rebucket", 5 -> "cluster"))
    assert(h.map(_._5) == Seq(100L, 102L, 102L, 102L, 102L), "n_rows")
    assert(h.map(_._8) == Seq(100L, 2L, 0L, 0L, 0L), "rows_delta")
    assert(h.map(_._3) == Seq(4, 4, 4, 8, 8), "n_buckets")
    // merge is CoW: untouched buckets carry by reference, so not every
    // file is replaced; compact/rebucket/cluster rewrite everything
    val v2 = h(1)
    assert(v2._6 > 0 && v2._6 < v2._4 + v2._7,
      s"merge must add files without replacing all: $v2")
    val v3 = h(2)
    assert(v3._7 > 0 && v3._6 == v3._4, s"compact replaces the layout: $v3")
    // ts is a real commit timestamp, non-decreasing across versions
    val ts = MergeTable.history(spark, dir)
      .select("ts_millis").as[Long].collect().toSeq
    assert(ts == ts.sorted && ts.head > 0L)
    // legacy manifests (no #op header) read back op = "unknown"
    val mf = new java.io.File(dir, "_v1.manifest")
    val stripped = scala.io.Source.fromFile(mf).getLines()
      .filterNot(_.startsWith("#op")).mkString("", "\n", "\n")
    Files.write(mf.toPath, stripped.getBytes("UTF-8"))
    new java.io.File(dir, "._v1.manifest.crc").delete()
    val ops = MergeTable.history(spark, dir)
      .select("op").as[String].collect().toSeq
    assert(ops == Seq("unknown", "merge", "compact", "rebucket", "cluster"))
  }

  test("optimize: coalesces only fragmented buckets, no-ops when defragmented") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    // a clustered layout fragments every bucket by design
    val vc = MergeTable.clusterBy(spark, dir, "score", filesPerBucket = 6)
    val before = MergeTable.fileIndex(spark, dir, vc)
    assert(before.values.exists(_.size > 2), "clusterBy must fragment")
    val (vo, compacted) = MergeTable.optimize(spark, dir, targetFilesPerBucket = 2)
    assert(vo == vc + 1)
    assert(compacted == before.filter(_._2.size > 2).keys.toSeq.sorted)
    val after = MergeTable.fileIndex(spark, dir, vo)
    assert(after.values.forall(_.size <= 2),
      s"optimize must defragment: ${after.view.mapValues(_.size).toMap}")
    // untouched buckets carry by reference
    before.filter(_._2.size <= 2).foreach { case (b, files) =>
      assert(after(b) == files, s"bucket $b must carry by reference")
    }
    assert(rows(MergeTable.read(spark, dir, vo)) == base, "content identical")
    // history records the pass; a defragmented table no-ops
    val ops = MergeTable.history(spark, dir)
      .select("op").as[String].collect().toSeq
    assert(ops == Seq("create", "cluster", "compact_buckets"))
    assert(MergeTable.optimize(spark, dir, targetFilesPerBucket = 2) == ((vo, Nil)))
  }

  test("create + read round-trips; merge == in-memory upsert/delete reference") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 8)
    assert(rows(MergeTable.read(spark, dir)) == base)

    // batch 1: update 10 keys, insert 5 new, delete 7
    val upd1 = ((0L until 10L).map(i => (i * 7, s"upd$i", -1.0, false)) ++
      (100L until 105L).map(i => (i, s"new$i", 9.0, false)) ++
      (0L until 7L).map(i => (i * 13 + 5, "", 0.0, true)))
      .toDF("id", "name", "score", "_del")
    val v2 = MergeTable.merge(spark, dir, upd1, "id", deleteCol = Some("_del"))
    // reference: drop deleted keys, apply updates for surviving keys,
    // add inserts — computed with plain Scala collections
    val delKeys = (0L until 7L).map(_ * 13 + 5).toSet
    val updKeys = (0L until 10L).map(i => (i * 7) -> (s"upd$i", -1.0)).toMap
    val expect1 = (base -- delKeys -- updKeys.keys) ++
      updKeys.filterNot { case (k, _) => delKeys.contains(k) } ++
      (100L until 105L).map(i => i -> (s"new$i", 9.0))
    assert(rows(MergeTable.read(spark, dir)) == expect1)
    assert(v2 == 2)

    // batch 2 on top: re-insert a deleted key, update an inserted one
    val upd2 = Seq((1L, "back", 5.0, false), (100L, "new100b", 10.0, false))
      .toDF("id", "name", "score", "_del")
    MergeTable.merge(spark, dir, upd2, "id", deleteCol = Some("_del"))
    val expect2 = expect1 ++ Map(1L -> (("back", 5.0)), 100L -> (("new100b", 10.0)))
    assert(rows(MergeTable.read(spark, dir)) == expect2)

    // time travel: v1 and v2 unchanged
    assert(rows(MergeTable.read(spark, dir, version = 1)) == base)
    assert(rows(MergeTable.read(spark, dir, version = 2)) == expect1)
  }

  test("copy-on-write: only buckets containing update keys are rewritten") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 8)
    val idx1 = MergeTable.fileIndex(spark, dir, 1)
    // single-key update touches exactly one bucket
    val upd = Seq((42L, "touched", 0.0)).toDF("id", "name", "score")
    MergeTable.merge(spark, dir, upd, "id")
    val idx2 = MergeTable.fileIndex(spark, dir, 2)
    val changed = idx1.keySet.union(idx2.keySet)
      .filter(b => idx1.get(b) != idx2.get(b))
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
    val untouched = idx1.keySet - changed.head
    untouched.foreach(b => assert(idx1(b) == idx2(b),
      s"bucket $b was rewritten without containing an update key"))
    // and the carried entries still point at v1 files (by reference)
    assert(untouched.forall(b => idx2(b).forall(_.startsWith("v1/"))))
  }

  test("compaction leaves content identical and one file per bucket") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      df(base).repartition(6), "id", nBuckets = 4)
    MergeTable.merge(spark, dir, Seq((3L, "x", 1.0)).toDF("id", "name", "score"), "id")
    val before = rows(MergeTable.read(spark, dir))
    val cv = MergeTable.compact(spark, dir)
    assert(rows(MergeTable.read(spark, dir)) == before)
    assert(MergeTable.fileIndex(spark, dir, cv).values.forall(_.size == 1))
  }

  test("compactBuckets: targeted coalesce rewrites only listed buckets, the rest carry by reference") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    // clusterBy lays each bucket range-split into multiple files — the
    // layout a write-heavy phase wants coalesced back
    val cv = MergeTable.clusterBy(spark, dir, "score", filesPerBucket = 4)
    val before = rows(MergeTable.read(spark, dir, cv))
    val idx1 = MergeTable.fileIndex(spark, dir, cv)
    assert(idx1.values.exists(_.size > 1), "clustered fixture must be multi-file")

    val targets = idx1.filter(_._2.size > 1).keys.toSeq.sorted.take(2)
    val nv = MergeTable.compactBuckets(spark, dir, targets)
    assert(rows(MergeTable.read(spark, dir, nv)) == before,
      "targeted compaction must be content-identical")
    val idx2 = MergeTable.fileIndex(spark, dir, nv)
    idx1.foreach { case (b, files) =>
      if (targets.contains(b))
        assert(idx2(b).size == 1 && idx2(b).forall(_.startsWith(s"v$nv/")),
          s"listed bucket $b must coalesce: ${idx2(b)}")
      else assert(idx2(b) == files, s"bucket $b must carry by reference")
    }
    // carried files keep their zone lines verbatim; compacted buckets'
    // new files get fresh lines — and the metadata-only aggregate
    // still answers exactly over the mixed sidecar
    val z1 = graft.pipeline.ZoneMaps.read(spark, dir, cv).get
    val z2 = graft.pipeline.ZoneMaps.read(spark, dir, nv).get
    idx1.filterNot { case (b, _) => targets.contains(b) }.values.flatten
      .foreach(rel => assert(z2(rel) == z1(rel)))
    val meta = MergeTable.metaAggregate(spark, dir, Seq("id"), version = nv)
      .as[(String, Long, Long, String, String)].head()
    assert(meta == (("id", 100L, 100L, "0", "99")))
    intercept[IllegalArgumentException](
      MergeTable.compactBuckets(spark, dir, Seq(99)))
  }

  test("rebucket: content-identical re-hash; key pruning works at the new count; IVM fails loudly across the boundary") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    MergeTable.merge(spark, dir, Seq((42L, "pre", 1.0)).toDF("id", "name", "score"), "id")
    val before = rows(MergeTable.read(spark, dir))

    val rv = MergeTable.rebucket(spark, dir, "id", newNBuckets = 16)
    assert(MergeTable.bucketCount(spark, dir, rv) == 16)
    assert(rows(MergeTable.read(spark, dir, rv)) == before)
    // time travel across the boundary still works
    assert(rows(MergeTable.read(spark, dir, version = 2)) == before)

    // key-pruned read resolves through the NEW modulus
    val hit = MergeTable.readForKeys(spark, dir, Seq(42L).toDF("id"), "id")
    assert(rows(hit) == Map(42L -> (("pre", 1.0))))

    // merging after the rebucket touches ≤ 1 of the 16 buckets
    val idxBefore = MergeTable.fileIndex(spark, dir, rv)
    val mv = MergeTable.merge(spark, dir,
      Seq((7L, "post", 2.0)).toDF("id", "name", "score"), "id")
    val idxAfter = MergeTable.fileIndex(spark, dir, mv)
    val changed = idxBefore.keySet.union(idxAfter.keySet)
      .filter(b => idxBefore.get(b) != idxAfter.get(b))
    assert(changed.size == 1, s"one key must touch one bucket: $changed")
    assert(rows(MergeTable.read(spark, dir)) == before + (7L -> (("post", 2.0))))

    // a bucket-keyed incremental consumer cannot silently span the
    // renumbering — it must fail loudly and rebuild
    val e = intercept[IllegalArgumentException](
      MergeTable.changedBucketIds(spark, dir, 2, rv))
    assert(e.getMessage.contains("bucket count mismatch"))
  }

  test("a dead writer's orphan data dir is invisible and never collides") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    // simulate a writer that died after writing v2 data, before commit
    df(Map(999L -> (("ghost", 0.0)))).write.parquet(s"$dir/v2/__graft_bucket=0")
    assert(rows(MergeTable.read(spark, dir)) == base, "orphan must be invisible")
    // the commit CAS (round 13) pins the next merge to base+1: the
    // orphan at v2 — provably dead, no manifest points at it — is
    // CLEARED under the new claim and the number is safely reused
    // (skipping past it would open the lost-update gap the 4-writer
    // stress test caught)
    val v = MergeTable.merge(spark, dir, Seq((5L, "y", 2.0)).toDF("id", "name", "score"), "id")
    assert(v == 2, "the orphan number is reclaimed, not skipped")
    val got = rows(MergeTable.read(spark, dir))
    assert(got == base + (5L -> (("y", 2.0))))
    assert(!got.contains(999L), "the ghost rows must be gone with the orphan")
  }

  test("vacuum reclaims unreferenced files and old manifests; latest survives") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    MergeTable.merge(spark, dir, Seq((1L, "a", 1.0)).toDF("id", "name", "score"), "id")
    MergeTable.merge(spark, dir, Seq((2L, "b", 2.0)).toDF("id", "name", "score"), "id")
    val latest = rows(MergeTable.read(spark, dir))
    val deleted = MergeTable.vacuum(spark, dir, keepVersions = 1)
    assert(deleted.nonEmpty)
    assert(rows(MergeTable.read(spark, dir)) == latest)
    assert(MergeTable.versions(spark, dir) == Seq(3))
    intercept[Exception](MergeTable.read(spark, dir, version = 1))
  }

  test("schema evolution: updates may add columns; old files are not rewritten") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    val idx1 = MergeTable.fileIndex(spark, dir, 1)
    val upd = Seq((1L, "tagged", 1.0, "gold")).toDF("id", "name", "score", "tag")
    // without the flag: loud failure, no silent null-fill
    intercept[Exception](MergeTable.merge(spark, dir, upd, "id"))
    MergeTable.merge(spark, dir, upd, "id", allowSchemaEvolution = true)
    val got = MergeTable.read(spark, dir)
      .select("id", "name", "tag").as[(Long, String, Option[String])]
      .collect().map { case (k, n, t) => k -> ((n, t)) }.toMap
    assert(got(1L) == (("tagged", Some("gold"))))
    assert(got(2L) == (("name2", None)), "pre-evolution rows read with null tag")
    // untouched buckets still reference v1 files (never rewritten for schema)
    val idx2 = MergeTable.fileIndex(spark, dir, 2)
    assert(idx1.keySet.exists(b => idx2.get(b) == idx1.get(b)))
    // compaction aligns all buckets onto the evolved schema
    val cv = MergeTable.compact(spark, dir)
    val after = MergeTable.read(spark, dir, cv)
      .select("id", "name", "tag").as[(Long, String, Option[String])]
      .collect().map { case (k, n, t) => k -> ((n, t)) }.toMap
    assert(after == got)
  }

  test("re-merging the same batch is idempotent by value (crash-retry safety)") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    val upd = Seq((1L, "a", 1.0, false), (200L, "ins", 2.0, false), (3L, "", 0.0, true))
      .toDF("id", "name", "score", "_del")
    MergeTable.merge(spark, dir, upd, "id", deleteCol = Some("_del"))
    val once = rows(MergeTable.read(spark, dir))
    MergeTable.merge(spark, dir, upd, "id", deleteCol = Some("_del"))
    assert(rows(MergeTable.read(spark, dir)) == once)
  }

  test("readForKeys prunes to the keys' buckets and returns exact matches") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 8)
    val keys = Seq(7L, 42L, 9999L).toDF("id") // 9999 is absent
    val looked = MergeTable.readForKeys(spark, dir, keys, "id")
    assert(rows(looked) == Map(7L -> base(7L), 42L -> base(42L)))
    // the scan actually touched only the wanted buckets' files
    looked.collect()
    val scans = looked.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = MergeTable.fileIndex(spark, dir, 1).values.map(_.size).sum
    assert(filesRead < totalFiles,
      s"lookup read $filesRead of $totalFiles files — no pruning happened")
  }

  test("changes() is the net row-level diff; compaction yields an empty feed") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 8)
    // v2: update 5, insert 200, delete 9
    val upd = Seq((5L, "upd5", -1.0, false), (200L, "ins", 9.0, false), (9L, "", 0.0, true))
      .toDF("id", "name", "score", "_del")
    MergeTable.merge(spark, dir, upd, "id", deleteCol = Some("_del"))
    def feed(from: Int, to: Int): Set[(String, Long, String)] =
      MergeTable.changes(spark, dir, from, to, "id")
        .select("_change", "id", "name").as[(String, Long, String)].collect().toSet
    assert(feed(1, 2) == Set(
      ("update", 5L, "upd5"), ("insert", 200L, "ins"), ("delete", 9L, "name9")))

    // v3: delete the v2 insert — net 1→3 shows NO trace of key 200
    MergeTable.merge(spark, dir,
      Seq((200L, "", 0.0, true)).toDF("id", "name", "score", "_del"),
      "id", deleteCol = Some("_del"))
    assert(feed(2, 3) == Set(("delete", 200L, "ins")))
    assert(feed(1, 3) == Set(
      ("update", 5L, "upd5"), ("delete", 9L, "name9")))

    // compaction rewrites every bucket but changes nothing
    val cv = MergeTable.compact(spark, dir)
    assert(feed(3, cv).isEmpty)
  }

  test("changes() across a schema-evolution boundary null-fills pre-evolution rows") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    val upd = Seq((1L, "tagged", 1.0, "gold")).toDF("id", "name", "score", "tag")
    MergeTable.merge(spark, dir, upd, "id", allowSchemaEvolution = true)
    val feed = MergeTable.changes(spark, dir, 1, 2, "id")
      .select("_change", "id", "name", "tag")
      .as[(String, Long, String, Option[String])].collect().toSet
    // key 1's pre-image (no tag column) aligns to the evolved schema;
    // the post-image carries the tag — an update, not insert+delete
    assert(feed == Set(("update", 1L, "tagged", Some("gold"))))
  }

  test("advise/maintain: churned buckets get exactly a recluster, fresh layouts get nothing") {
    val dir = tmpDir()
    val mk = (i: Long) => (i, i % 97, (i * 31) % 89, s"p$i")
    MergeTable.create(spark, dir,
      (1L to 8000L).map(mk).toDF("id", "a", "b", "tag"), "id", nBuckets = 8)

    // no recorded layout → nothing to repair, nothing fragmented
    assert(MergeTable.advise(spark, dir).isEmpty)
    assert(MergeTable.layout(spark, dir).isEmpty)

    val vz = MergeTable.clusterByZ(spark, dir, Seq("a", "b"), filesPerBucket = 4)
    // fresh layout → no advice; intent recorded
    assert(MergeTable.advise(spark, dir).isEmpty)
    assert(MergeTable.layout(spark, dir) ==
      Some(MergeTable.TableLayout("z", Seq("a", "b"), 4, 16)))

    // churn a couple of buckets; intent survives the merge
    val vm = MergeTable.merge(spark, dir,
      Seq(5L, 1005L).map(mk).toDF("id", "a", "b", "tag"), "id")
    val touched = MergeTable.changedBucketIds(spark, dir, vz, vm)
    assert(MergeTable.layout(spark, dir).isDefined)
    val advice = MergeTable.advise(spark, dir)
    assert(advice.map(a => (a.action, a.buckets)) ==
      Seq(("recluster", touched)), s"got $advice")

    // apply → layout repaired as ONE cluster_z commit over exactly the
    // churned buckets; a repaired table advises nothing
    val applied = MergeTable.maintain(spark, dir)
    assert(applied.size == 1 && applied.head._1.action == "recluster")
    assert(MergeTable.advise(spark, dir).isEmpty)
    // content identity through the repair
    val got = MergeTable.read(spark, dir)
      .select("id", "a", "b", "tag").as[(Long, Long, Long, String)]
      .collect().toSet
    assert(got == (1L to 8000L).map(mk).toSet)
    // history shows the full advise→apply chain
    val ops = MergeTable.history(spark, dir)
      .select("version", "op").as[(Int, String)].collect().sortBy(_._1).map(_._2)
    assert(ops sameElements
      Array("create", "cluster_z", "merge", "cluster_z"), ops.mkString(","))

    // rebucket clears the intent → no recluster advice despite rewrites
    MergeTable.rebucket(spark, dir, "id", 4)
    assert(MergeTable.layout(spark, dir).isEmpty)
    assert(MergeTable.advise(spark, dir).isEmpty)
  }

  test("advise/maintain: 1-D range layouts repair via the same machinery; explicit target flags fragmentation") {
    val dir = tmpDir()
    MergeTable.create(spark, dir,
      (1L to 6000L).map(i => (i, i % 97, s"p$i")).toDF("id", "score", "tag"),
      "id", nBuckets = 4)
    val vc = MergeTable.clusterBy(spark, dir, "score", filesPerBucket = 6)
    assert(MergeTable.layout(spark, dir) ==
      Some(MergeTable.TableLayout("range", Seq("score"), 6, 0)))

    val vm = MergeTable.merge(spark, dir,
      Seq((7L, 1000L, "x")).toDF("id", "score", "tag"), "id")
    val touched = MergeTable.changedBucketIds(spark, dir, vc, vm)
    assert(MergeTable.advise(spark, dir).map(_.action) == Seq("recluster"))
    val applied = MergeTable.maintain(spark, dir)
    assert(applied.map(_._1.buckets) == Seq(touched))
    assert(MergeTable.advise(spark, dir).isEmpty)
    // the repaired bucket prunes again on the 1-D column
    val (kept, total) = MergeTable.prunedFiles(
      spark, dir, "score", BigDecimal(10), BigDecimal(12))
    assert(kept.size <= total / 2, s"${kept.size}/$total")
    val got = MergeTable.readWhere(spark, dir, "score",
      BigDecimal(999), BigDecimal(2000)).select("id").as[Long].collect().toSet
    assert(got == Set(7L))

    // an explicit tighter target flags the buckets for compaction
    val adv = MergeTable.advise(spark, dir, targetFilesPerBucket = 1)
    assert(adv.map(_.action) == Seq("compact") && adv.head.buckets.nonEmpty)
    val applied2 = MergeTable.maintain(spark, dir, targetFilesPerBucket = 1)
    assert(applied2.map(_._1.action) == Seq("compact"))
    // that compaction coalesced but UN-ORDERED those buckets — the
    // advisor now correctly flags them for a layout repair, and one
    // more maintain round restores a quiet table
    assert(MergeTable.advise(spark, dir).map(_.action) == Seq("recluster"))
    MergeTable.maintain(spark, dir)
    assert(MergeTable.advise(spark, dir).isEmpty)
  }

  test("update batches must be unique on the merge key") {
    val dir = tmpDir()
    MergeTable.create(spark, dir, df(base), "id", nBuckets = 4)
    val dup = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("id", "name", "score")
    intercept[IllegalArgumentException](MergeTable.merge(spark, dir, dup, "id"))
  }
}
