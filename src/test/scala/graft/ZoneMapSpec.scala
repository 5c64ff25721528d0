package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{MergeTable, ZoneMaps}

/** [[graft.pipeline.ZoneMaps]] + [[MergeTable.clusterBy]] +
  * [[MergeTable.readWhere]] — footer-harvested file stats, the
  * range-clustered layout that makes them prunable, and the
  * zone-pruned scan: kept ≪ total on a clustered table, exact result
  * regardless of layout, sidecar maintenance ∝ delta through merges. */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String): Unit =
    MergeTable.create(spark,
      dir,
      (1L to 4000L).map(i => (i, i % 97, s"p$i")).toDF("id", "score", "tag"),
      "id", nBuckets = 4)

  test("clusterBy + readWhere: narrow range skips most files, result is exact") {
    val dir = s"${Files.createTempDirectory("graft-zones")}/t"
    mkTable(dir)

    // pre-cluster: hash layout scatters `score` — zones exist but a
    // narrow predicate can skip (almost) nothing
    val (keptBefore, totalBefore) = MergeTable.prunedFiles(
      spark, dir, "score", BigDecimal(10), BigDecimal(12))
    assert(totalBefore > 0 && keptBefore.size == totalBefore,
      s"hash layout should be unprunable on score: ${keptBefore.size}/$totalBefore")

    val v = MergeTable.clusterBy(spark, dir, "score", filesPerBucket = 8)
    val (kept, total) = MergeTable.prunedFiles(
      spark, dir, "score", BigDecimal(10), BigDecimal(12), version = v)
    assert(total >= 16, s"expected a multi-file clustered layout, got $total")
    assert(kept.size <= total / 2,
      s"a ~3% range must skip most files on the clustered layout: ${kept.size}/$total")

    val got = MergeTable.readWhere(spark, dir, "score",
        BigDecimal(10), BigDecimal(12), version = v)
      .select("id").as[Long].collect().toSet
    val want = (1L to 4000L).filter(i => i % 97 >= 10 && i % 97 <= 12).toSet
    assert(got == want && want.nonEmpty)

    // clusterBy preserved content exactly
    val all = MergeTable.read(spark, dir, v)
      .select("id", "score", "tag").as[(Long, Long, String)].collect().toSet
    assert(all == (1L to 4000L).map(i => (i, i % 97, s"p$i")).toSet)
  }

  test("merge carries unchanged files' zones by reference and harvests only rewritten ones") {
    val dir = s"${Files.createTempDirectory("graft-zones2")}/t"
    mkTable(dir)
    val z1 = ZoneMaps.read(spark, dir, 1).get
    assert(z1.nonEmpty && z1.values.forall(_.contains("score")))

    // touch ONE key → one bucket rewritten; other buckets' files (and
    // their zone lines) must carry forward verbatim
    MergeTable.merge(spark, dir,
      Seq((42L, 1000L, "rewritten")).toDF("id", "score", "tag"), "id")
    val z2 = ZoneMaps.read(spark, dir, 2).get
    val idx1 = MergeTable.fileIndex(spark, dir, 1)
    val idx2 = MergeTable.fileIndex(spark, dir, 2)
    val carried = idx2.values.flatten.toSet.intersect(idx1.values.flatten.toSet)
    assert(carried.nonEmpty, "a one-key merge must carry most buckets forward")
    carried.foreach { rel =>
      assert(z2(rel) == z1(rel), s"carried file $rel must keep its zone lines")
    }
    // the rewritten bucket's new file reflects the new extreme value
    val newFiles = idx2.values.flatten.toSet -- idx1.values.flatten.toSet
    assert(newFiles.exists(rel =>
      BigDecimal(z2(rel)("score").max) == BigDecimal(1000)),
      s"rewritten bucket's zone must see score=1000: ${newFiles.map(z2(_)("score"))}")

    // readWhere still exact across the merge (no clustering — superset
    // pass + exact predicate)
    val got = MergeTable.readWhere(spark, dir, "score",
      BigDecimal(999), BigDecimal(2000)).select("id").as[Long].collect().toSet
    assert(got == Set(42L))
  }

  test("format-5 string exactness markers: short values exact, truncated bounds marked inexact, sidecar round-trips, old formats degrade") {
    val dir = s"${Files.createTempDirectory("graft-strex")}/t"
    // > StrBoundCp code points → truncation fires; sorts ABOVE every
    // w-prefixed value so it is the file's MAX, not its min
    val long = "z" * 40
    MergeTable.create(spark, dir,
      (0L until 100L).map(i =>
        (i, f"v$i%03d", if (i == 99) long else f"w$i%03d"))
        .toDF("id", "short", "mixed"),
      "id", nBuckets = 1)
    val files = MergeTable.fileIndex(spark, dir, 1).values.flatten.toSeq
    val zones = ZoneMaps.read(spark, dir, 1).get
    files.foreach { rel =>
      val zShort = zones(rel)("short")
      assert(zShort.minExact && zShort.maxExact,
        s"short string bounds are the values themselves: $zShort")
      val zMixed = zones(rel)("mixed")
      assert(zMixed.minExact, "the min (w000) fits: exact")
      assert(!zMixed.maxExact,
        s"the 40-cp max truncates: marked inexact: $zMixed")
      assert(zMixed.max.length < long.length,
        "the stored bound is the incremented prefix, not the value")
      // and the fresh in-memory harvest agrees with the sidecar read
      val h = ZoneMaps.harvest(spark, dir, Seq(rel))(rel)("mixed")
      assert(h.minExact == zMixed.minExact && h.maxExact == zMixed.maxExact)
    }
    // an old-format sidecar (strip the format-5 field, stamp format 4)
    // reads back with BOTH flags false — pruning keeps working, the
    // min/max pushdown degrades to the scan, never a fabricated answer
    val sidecar = new java.io.File(dir, "_v1.zones")
    val downgraded = scala.io.Source.fromFile(sidecar).getLines().map { l =>
      if (l.startsWith("#format")) "#format\t4"
      else {
        val a = l.split("\t", -1)
        if (a(2) == "str") a.take(7).mkString("\t") else l
      }
    }.mkString("", "\n", "\n")
    Files.write(sidecar.toPath, downgraded.getBytes("UTF-8"))
    new java.io.File(dir, "._v1.zones.crc").delete()
    val old = ZoneMaps.read(spark, dir, 1).get
    files.foreach { rel =>
      val z = old(rel)("short")
      assert(!z.minExact && !z.maxExact,
        s"pre-format-5 str bounds must read back inexact: $z")
      assert(z.min != null && z.max != null, "bounds themselves survive")
    }
  }

  test("metaAggregate: exact counts/min/max incl. planted nulls, vs a real scan") {
    val dir = s"${Files.createTempDirectory("graft-meta")}/t"
    // nulls planted on ~1/3 of score; one value pushed to a long > 2^53
    // (a double roundtrip would corrupt it — the plain-decimal string
    // path must not)
    val big = (1L << 53) + 3L
    val rows = (1L to 999L).map { i =>
      (i, if (i % 3 == 0) None else Some(if (i == 500) big else i % 97), s"p$i")
    }
    MergeTable.create(spark, dir, rows.toDF("id", "score", "tag"), "id", nBuckets = 4)
    val got = MergeTable.metaAggregate(spark, dir, Seq("id", "score"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("id") == ((999L, 999L, "1", "999")))
    val nonNull = rows.count(_._2.isDefined).toLong
    assert(got("score") == ((999L, nonNull, "0", big.toString)))
  }

  test("metaAggregate randomized reference: equals the real aggregation on seeded data incl. all-null and post-merge states") {
    val rng = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val dir = s"${Files.createTempDirectory(s"graft-meta-rnd$trial")}/t"
      val n = 50 + rng.nextInt(400)
      val allNull = rng.nextInt(4) == 0
      val rows = (1L to n).map { i =>
        (i,
          if (allNull || rng.nextInt(3) == 0) None
          else Some(rng.nextLong() % 1000000L), s"p$i")
      }
      MergeTable.create(spark, dir, rows.toDF("id", "score", "tag"),
        "id", nBuckets = 1 + rng.nextInt(6))
      if (rng.nextBoolean()) // half the trials audit a post-merge state
        MergeTable.merge(spark, dir,
          Seq((1L + rng.nextInt(n).toLong, Some(rng.nextLong() % 1000L), "upd"))
            .toDF("id", "score", "tag"), "id")
      val want = MergeTable.read(spark, dir)
        .agg(count(lit(1)), count(col("score")),
          min(col("score")).cast("string"), max(col("score")).cast("string"))
        .as[(Long, Long, Option[String], Option[String])].head()
      val got = MergeTable.metaAggregate(spark, dir, Seq("score"))
        .as[(String, Long, Long, Option[String], Option[String])].head()
      assert((got._2, got._3, got._4, got._5) == want,
        s"trial $trial (n=$n, allNull=$allNull): $got vs $want")
    }
  }

  test("metaAggregate answers with ZERO data scan: exact even after every data file is corrupted") {
    val dir = s"${Files.createTempDirectory("graft-meta2")}/t"
    mkTable(dir)
    MergeTable.merge(spark, dir, Seq((42L, 1000L, "x")).toDF("id", "score", "tag"), "id")
    // clobber every parquet file — any code path that opens one (scan
    // OR footer harvest) now fails loudly, so a correct answer proves
    // the sidecar alone carried it
    val root = new java.io.File(dir)
    def clobber(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(clobber)
      else if (f.getName.endsWith(".parquet"))
        Files.write(f.toPath, Array[Byte](0, 1, 2, 3))
    clobber(root)
    val got = MergeTable.metaAggregate(spark, dir, Seq("score"))
      .as[(String, Long, Long, String, String)].head()
    assert(got == (("score", 4000L, 4000L, "0", "1000")))
    intercept[Exception] { // the corruption itself is real
      MergeTable.read(spark, dir).count()
    }
  }

  test("metaAggregate: legacy 6-field sidecar degrades to a footer re-harvest, not a wrong answer") {
    val dir = s"${Files.createTempDirectory("graft-meta3")}/t"
    mkTable(dir)
    // rewrite the sidecar in the legacy format: drop nullCount and the
    // #rows pseudo-lines
    val sidecar = new java.io.File(dir, "_v1.zones")
    val legacy = scala.io.Source.fromFile(sidecar).getLines()
      .filterNot(_.split("\t")(1) == graft.pipeline.ZoneMaps.RowsKey)
      .map(_.split("\t").take(6).mkString("\t"))
      .mkString("", "\n", "\n")
    Files.write(sidecar.toPath, legacy.getBytes("UTF-8"))
    // drop the local-FS checksum shadow or Hadoop rejects the rewrite
    new java.io.File(dir, "._v1.zones.crc").delete()
    assert(graft.pipeline.ZoneMaps.read(spark, dir, 1).get
      .values.forall(m => graft.pipeline.ZoneMaps.rowCount(m).isEmpty))
    val got = MergeTable.metaAggregate(spark, dir, Seq("score"))
      .as[(String, Long, Long, String, String)].head()
    assert(got == (("score", 4000L, 4000L, "0", "96")))
  }

  test("metaAggregate refuses non-numeric columns loudly") {
    val dir = s"${Files.createTempDirectory("graft-meta4")}/t"
    mkTable(dir)
    val e = intercept[IllegalArgumentException] {
      MergeTable.metaAggregate(spark, dir, Seq("tag")).collect()
    }
    assert(e.getMessage.contains("tag"), e.getMessage)
  }

  test("clusterByZ: BOTH dimensions prune; 1-D clustering only ever prunes its own") {
    // two decorrelated dimensions: a 1-D layout on `a` leaves every
    // file spanning all of `b`, while the z-curve localizes both
    val dir = s"${Files.createTempDirectory("graft-zorder")}/t"
    val df = (1L to 8000L)
      .map(i => (i, i % 97, (i * 31) % 89, s"p$i"))
      .toDF("id", "a", "b", "tag")
    MergeTable.create(spark, dir, df, "id", nBuckets = 2)

    // 1-D control: clusterBy(a) — `a` prunes, `b` cannot
    val v1d = MergeTable.clusterBy(spark, dir, "a", filesPerBucket = 16)
    val (aKept1, total1) = MergeTable.prunedFiles(
      spark, dir, "a", BigDecimal(10), BigDecimal(15), version = v1d)
    val (bKept1, _) = MergeTable.prunedFiles(
      spark, dir, "b", BigDecimal(10), BigDecimal(15), version = v1d)
    assert(aKept1.size <= total1 / 2, s"control: a must prune: ${aKept1.size}/$total1")
    assert(bKept1.size == total1,
      s"control: a-only layout must NOT prune b: ${bKept1.size}/$total1")

    // the curve: clusterByZ(a, b) — BOTH dimensions prune. With 16
    // curve segments per bucket each file covers a ~quarter-width box
    // per dimension, so a narrow (6%) range must skip a meaningful
    // share of files on EITHER column — the thing no 1-D layout can do
    val vz = MergeTable.clusterByZ(spark, dir, Seq("a", "b"),
      filesPerBucket = 16)
    val (aKept, total) = MergeTable.prunedFiles(
      spark, dir, "a", BigDecimal(10), BigDecimal(15), version = vz)
    val (bKept, _) = MergeTable.prunedFiles(
      spark, dir, "b", BigDecimal(10), BigDecimal(15), version = vz)
    assert(aKept.size <= total * 6 / 10, s"z layout: a must prune: ${aKept.size}/$total")
    assert(bKept.size <= total * 6 / 10, s"z layout: b must prune: ${bKept.size}/$total")

    // conjunctive pruned scan intersects the survivors and stays exact
    val got = MergeTable.readWhereAll(spark, dir, Seq(
        ("a", BigDecimal(10), BigDecimal(15)),
        ("b", BigDecimal(20), BigDecimal(60))), version = vz)
      .select("id").as[Long].collect().toSet
    val want = (1L to 8000L).filter(i =>
      i % 97 >= 10 && i % 97 <= 15 &&
        (i * 31) % 89 >= 20 && (i * 31) % 89 <= 60).toSet
    assert(got == want && want.nonEmpty)

    // layout-only: content identical through the z rewrite
    val all = MergeTable.read(spark, dir, vz)
      .select("id", "a", "b", "tag").as[(Long, Long, Long, String)]
      .collect().toSet
    assert(all == (1L to 8000L).map(i => (i, i % 97, (i * 31) % 89, s"p$i")).toSet)

    // hilbert variant: the native codegen curve gives the same
    // both-dimension pruning contract (tighter boxes, never looser
    // than correctness requires) with identical content
    val vh = MergeTable.clusterByZ(spark, dir, Seq("a", "b"),
      filesPerBucket = 16, bits = 7, curve = "hilbert")
    val (aKeptH, totalH) = MergeTable.prunedFiles(
      spark, dir, "a", BigDecimal(10), BigDecimal(15), version = vh)
    val (bKeptH, _) = MergeTable.prunedFiles(
      spark, dir, "b", BigDecimal(10), BigDecimal(15), version = vh)
    assert(aKeptH.size <= totalH * 6 / 10,
      s"hilbert: a must prune: ${aKeptH.size}/$totalH")
    assert(bKeptH.size <= totalH * 6 / 10,
      s"hilbert: b must prune: ${bKeptH.size}/$totalH")
    val allH = MergeTable.read(spark, dir, vh)
      .select("id", "a", "b", "tag").as[(Long, Long, Long, String)]
      .collect().toSet
    assert(allH == all, "hilbert re-layout must be content-identical")
    intercept[IllegalArgumentException] { // hilbert is 2-D only
      MergeTable.clusterByZ(spark, dir, Seq("a", "b", "id"), curve = "hilbert")
    }
  }

  test("reclusterBuckets: repairs churned buckets, carries untouched buckets by reference, content exact") {
    val dir = s"${Files.createTempDirectory("graft-recluster")}/t"
    val mk = (i: Long) => (i, i % 97, (i * 31) % 89, s"p$i")
    MergeTable.create(spark, dir,
      (1L to 16000L).map(mk).toDF("id", "a", "b", "tag"), "id", nBuckets = 8)
    val vz = MergeTable.clusterByZ(spark, dir, Seq("a", "b"), filesPerBucket = 8)

    // rows the pruned scan actually reads — the metric layout quality
    // is ABOUT (file counts mislead when merge packs a bucket into
    // fewer, bigger files)
    def scannedRows(colName: String, lo: Int, hi: Int, v: Int): Long = {
      val (kept, _) = MergeTable.prunedFiles(
        spark, dir, colName, BigDecimal(lo), BigDecimal(hi), version = v)
      if (kept.isEmpty) 0L
      else spark.read.parquet(kept.map(p => s"$dir/$p"): _*).count()
    }
    val freshA = scannedRows("a", 10, 15, vz)
    val freshB = scannedRows("b", 20, 40, vz)
    assert(freshA < 16000 && freshB < 16000, "fresh z layout must prune")

    // decay: a merge rewrites its touched buckets WITHOUT curve order
    val upd = Seq(5L, 1005L).map(i => (i, i % 97, (i * 31) % 89, s"u$i"))
      .toDF("id", "a", "b", "tag")
    val vm = MergeTable.merge(spark, dir, upd, "id")
    val touched = MergeTable.changedBucketIds(spark, dir, vz, vm)
    val untouched = (0 until 8).filterNot(touched.contains)
    assert(touched.nonEmpty && untouched.nonEmpty,
      s"need a partial churn: touched=$touched")
    val decayedA = scannedRows("a", 10, 15, vm)
    assert(decayedA > freshA,
      s"merge must decay pruning on touched buckets: $decayedA vs fresh $freshA")

    // the repair: re-curve ONLY the touched buckets
    val vr = MergeTable.reclusterBuckets(spark, dir, Seq("a", "b"),
      touched, filesPerBucket = 8)

    // (a) content identity through the repair
    val before = MergeTable.read(spark, dir, vm)
      .select("id", "a", "b", "tag").as[(Long, Long, Long, String)].collect().toSet
    val after = MergeTable.read(spark, dir, vr)
      .select("id", "a", "b", "tag").as[(Long, Long, Long, String)].collect().toSet
    assert(after == before, "reclusterBuckets must be layout-only")

    // (b) untouched buckets: same physical files (by-reference carry —
    // identical relative paths, so byte-identity is structural), and
    // their zone lines carried verbatim
    val idxM = MergeTable.fileIndex(spark, dir, vm)
    val idxR = MergeTable.fileIndex(spark, dir, vr)
    untouched.foreach { bkt =>
      assert(idxR(bkt) == idxM(bkt),
        s"untouched bucket $bkt must carry its files by reference")
    }
    val zM = ZoneMaps.read(spark, dir, vm).get
    val zR = ZoneMaps.read(spark, dir, vr).get
    untouched.flatMap(idxM(_)).foreach { rel =>
      assert(zR(rel) == zM(rel), s"carried file $rel must keep its zone lines")
    }
    // touched buckets WERE rewritten
    touched.foreach { bkt =>
      assert(idxR(bkt).toSet.intersect(idxM(bkt).toSet).isEmpty,
        s"touched bucket $bkt must be rewritten")
    }

    // (c) pruning restored to ~the fresh clusterByZ level on BOTH dims
    val repairedA = scannedRows("a", 10, 15, vr)
    val repairedB = scannedRows("b", 20, 40, vr)
    assert(repairedA <= freshA * 13 / 10,
      s"repair must restore a-pruning: $repairedA vs fresh $freshA")
    assert(repairedB <= freshB * 13 / 10,
      s"repair must restore b-pruning: $repairedB vs fresh $freshB")
    assert(decayedA > repairedA, s"repair must beat the decayed layout")

    // scans stay exact on the repaired layout
    val got = MergeTable.readWhereAll(spark, dir, Seq(
        ("a", BigDecimal(10), BigDecimal(15)),
        ("b", BigDecimal(20), BigDecimal(60))), version = vr)
      .select("id").as[Long].collect().toSet
    val want = before.collect {
      case (id, a, b, _) if a >= 10 && a <= 15 && b >= 20 && b <= 60 => id }
    assert(got == want && want.nonEmpty)

    // guards: unknown bucket ids refuse loudly
    intercept[IllegalArgumentException] {
      MergeTable.reclusterBuckets(spark, dir, Seq("a", "b"), Seq(99))
    }
  }

  test("annotated int columns: decimal poisoned; date/timestamp zoned as exact epoch values (round 16)") {
    // parquet stores DECIMAL-backed INT32/64 stats as raw UNSCALED
    // values — zones speak LOGICAL values, so harvest refuses those.
    // DATE/TIMESTAMP(MICROS) physical stats ARE the logical epoch
    // numbers Spark's internal values use, so since round 16 they zone
    // as exact "long" lines (millis scale ×1000; nanos/INT96 poison).
    val dir = s"${Files.createTempDirectory("graft-zones-log")}/t"
    val df = (1L to 100L).toDF("id")
      .withColumn("dec", (col("id") * 7).cast("decimal(10,2)"))
      .withColumn("dt", date_add(lit(java.sql.Date.valueOf("2026-01-01")),
        col("id").cast("int")))
      .withColumn("ts", to_timestamp(col("dt")))
      .withColumn("f", col("id").cast("double") / 3.0)
    MergeTable.create(spark, dir, df, "id", nBuckets = 2)
    val zones = ZoneMaps.read(spark, dir, 1).get
    val daysBase = java.time.LocalDate.of(2026, 1, 1).toEpochDay
    zones.foreach { case (rel, cols) =>
      assert(cols.contains("id") && cols.contains("f"),
        s"$rel: plain long + double must stay zoned: ${cols.keySet}")
      assert(!cols.contains("dec"), s"$rel: decimal column must be poisoned")
      // date zones carry epoch DAYS, timestamp zones epoch MICROS —
      // exact and inside the generated range
      val dz = cols("dt"); val tz = cols("ts")
      assert(dz.kind == "long" && tz.kind == "long")
      assert(dz.min.toLong >= daysBase + 1 && dz.max.toLong <= daysBase + 100,
        s"$rel: date zone must hold epoch days: ${dz.min}..${dz.max}")
      assert(tz.min.toLong == dz.min.toLong * 86400000000L,
        s"$rel: midnight ts zone must be its date's epoch micros")
    }
    // unzoned columns are never skipped on — the scan stays exact
    val got = MergeTable.readWhere(spark, dir, "dec",
      BigDecimal(70), BigDecimal(140)).select("id").as[Long].collect().toSet
    assert(got == (10L to 20L).toSet)
    // decimal metadata aggregates still refuse loudly instead of
    // reporting raw unscaled numbers
    intercept[IllegalArgumentException] {
      MergeTable.metaAggregate(spark, dir, Seq("dec")).collect()
    }
    // date/timestamp metadata aggregates now ANSWER (round 16)
    val ma = MergeTable.metaAggregate(spark, dir, Seq("dt", "ts")).collect()
      .map(r => r.getString(0) -> (r.getString(3), r.getString(4))).toMap
    assert(ma("dt")._1.toLong == daysBase + 1 &&
      ma("dt")._2.toLong == daysBase + 100)
    assert(ma("ts")._1.toLong == (daysBase + 1) * 86400000000L)
  }

  test("double zones prune against the doubles the filter actually compares (ULP boundary)") {
    // the filter coerces decimal bounds to DOUBLE: a bound just above a
    // stored double still matches it after coercion, so pruning must
    // not drop the file holding it
    val dir = s"${Files.createTempDirectory("graft-zones-ulp")}/t"
    val df = Seq((1L, 0.3), (2L, 0.1)).toDF("id", "x")
    MergeTable.create(spark, dir, df, "id", nBuckets = 2)
    // lo sits strictly between double(0.3) and the decimal 0.3's
    // upper neighborhood: nearest double of lo IS 0.3, so the filter
    // keeps the row — pruning must too
    val lo = BigDecimal("0.30000000000000001")
    assert(lo.toDouble == 0.3)
    val got = MergeTable.readWhere(spark, dir, "x", lo, BigDecimal(1))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L),
      "file holding double 0.3 was pruned at the representation boundary")
  }

  test("NaN-bearing double blocks poison the zone, never mark a live file all-null") {
    // parquet-java drops double/float min/max for NaN-bearing blocks
    // while the block holds real rows; trusting the absence used to
    // mark the file all-null, and every range scan (readWhere, the
    // connector, the hybrid count) silently skipped it
    val dir = s"${Files.createTempDirectory("graft-nanzone")}/t"
    MergeTable.create(spark, dir,
      (0L until 300L).map(i =>
        (i, if (i % 41 == 0) Double.NaN else (i % 250) / 2.0))
        .toDF("id", "d"),
      "id", nBuckets = 2)
    val files = MergeTable.fileIndex(spark, dir, 1).values.flatten.toSeq
    val zones = ZoneMaps.forVersion(spark, dir, 1, files)
    assert(zones.values.forall(z => !z.contains("d")),
      s"NaN-bearing d must have NO zone (poisoned): ${zones.values.map(_.get("d"))}")
    assert(zones.values.forall(z => z.get("id").exists(_.nullCount == 0L)),
      "the clean id column must still zone normally")

    // a range scan keeps every file (no zone → no pruning) and is exact;
    // Spark's NaN-largest semantics make NaN rows satisfy d > 19.8
    val want = (0L until 300L)
      .filter(i => i % 41 == 0 || (i % 250) / 2.0 > 19.8).toSet
    val got = MergeTable.readWhere(spark, dir, "d",
        BigDecimal("19.9"), BigDecimal("1e9"))
      .select("id").as[Long].collect().toSet
    assert(got == (0L until 300L)
      .filter(i => i % 41 != 0 && (i % 250) / 2.0 >= 19.9).toSet)
    val conn = spark.read.format("graft").option("path", dir).load()
      .filter($"d" > 19.8).select("id").as[Long].collect().toSet
    assert(conn == want, s"connector must keep NaN-bearing files: ${conn.size} vs ${want.size}")
  }

  test("pre-fix (format-2) all-null zones are NOT trusted: they degrade to re-harvest, never a silent skip") {
    // sidecars written before the proven-absence harvest can carry
    // wrong all-null double/str zones for NaN-bearing (or oversized-
    // binary) files; the format-3 bump makes read() drop those lines
    // so every consumer degrades conservatively (round-14 ADVICE)
    val dir = s"${Files.createTempDirectory("graft-fmt2")}/t"
    MergeTable.create(spark, dir,
      (0L until 200L).map(i => (i, (i % 50).toDouble, s"tag$i"))
        .toDF("id", "d", "s"),
      "id", nBuckets = 2)
    val files = MergeTable.fileIndex(spark, dir, 1).values.flatten.toSeq.sorted
    val rows = ZoneMaps.forVersion(spark, dir, 1, files)

    // fabricate what a pre-fix build would have written: a format-2
    // sidecar claiming file #0's d and s columns are ALL NULL (the
    // NaN/oversized stats-drop misread) while the file holds live rows
    val victim = files.head
    val body = ("#format\t2" +: rows.toSeq.sortBy(_._1).flatMap {
      case (rel, cols) => cols.toSeq.sortBy(_._1).map { case (c, z) =>
        val (mn, mx) =
          if (rel == victim && c == "d") ("", "")
          else if (rel == victim && c == "s") ("%none", "%none")
          else if (z.kind == "str")
            (if (z.min == null) "%none" else z.min,
              if (z.max == null) "%inf" else z.max)
          else (z.min, z.max)
        s"$rel\t$c\t${z.kind}\t$mn\t$mx\t${z.hasNulls}\t${z.nullCount}"
      }
    }).mkString("", "\n", "\n")
    // through the Hadoop FS (not java.nio), so the LocalFileSystem's
    // .crc sidecar matches the fabricated bytes
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(new org.apache.hadoop.fs.Path(s"$dir/_v1.zones"), true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()

    // the poisoned claims are dropped on read (other zones survive)
    val reread = ZoneMaps.read(spark, dir, 1).get
    assert(!reread(victim).contains("d") && !reread(victim).contains("s"),
      "untrusted format-2 all-null zones must be dropped")
    assert(reread(victim).contains("id"), "trusted zones must survive")

    // range scan / null probe keep the victim file (no zone → keep):
    // under the old trust, d >= 0 silently skipped its every row
    val got = MergeTable.readWhere(spark, dir, "d",
        BigDecimal(0), BigDecimal(1000))
      .select("id").as[Long].collect().toSet
    assert(got == (0L until 200L).toSet,
      s"no live row may be skipped on an untrusted zone: ${got.size}/200")
    val (keptNN, _) = MergeTable.prunedFilesNull(spark, dir, "s", isNull = false)
    assert(keptNN.contains(victim),
      "IS NOT NULL must keep the file whose all-null claim is untrusted")

    // metadata aggregates re-harvest the dropped column exactly
    val agg = MergeTable.metaAggregate(spark, dir, Seq("d")).collect().head
    assert(agg.getLong(1) == 200L && agg.getLong(2) == 200L &&
      agg.getString(3) == "0.0" && agg.getString(4) == "49.0",
      s"re-harvest must restore exact stats: $agg")

    // a FRESH sidecar (format 3+) trusts its own proven all-null
    // zones; formats 4 (sum lines) and 5 (str exactness markers) only
    // ADD information, the trust ladder is intact
    assert(ZoneMaps.FormatVersion == 5)
  }

  test("randomized reference: zone-pruned scans equal plain filters under random layouts and bounds") {
    // the pruning contract, fuzzed: for ANY layout (unclustered, 1-D
    // clustered, z-ordered) and ANY bounds — including non-binary
    // decimals probing the double ULP boundary — readWhere/readWhereAll
    // must equal the plain filter. A pruning bug shows as lost rows.
    val rng = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val dir = s"${Files.createTempDirectory(s"graft-zrnd$trial")}/t"
      val n = 500 + rng.nextInt(2500)
      val rows = (1L to n).map { i =>
        (i, rng.nextInt(1000).toLong, rng.nextInt(10000) / 10.0)
      }
      val df = rows.toDF("id", "a", "x")
      MergeTable.create(spark, dir, df, "id", nBuckets = 1 + rng.nextInt(4))
      rng.nextInt(4) match {
        case 0 => // unclustered
        case 1 => MergeTable.clusterBy(spark, dir, "a", filesPerBucket = 4); ()
        case 2 =>
          MergeTable.clusterByZ(spark, dir, Seq("a", "id"),
            filesPerBucket = 4,
            curve = if (rng.nextBoolean()) "z" else "hilbert"); ()
        case 3 => // churned-then-repaired layout: z, decay merge, recluster
          val vz = MergeTable.clusterByZ(spark, dir, Seq("a", "id"),
            filesPerBucket = 4)
          val keys = (1 to 1 + rng.nextInt(5))
            .map(_ => 1L + rng.nextInt(n)).distinct
          val vm = MergeTable.merge(spark, dir,
            keys.map(k => (k, rng.nextInt(1000).toLong,
              rng.nextInt(10000) / 10.0)).toDF("id", "a", "x"), "id")
          val touched = MergeTable.changedBucketIds(spark, dir, vz, vm)
          if (touched.nonEmpty)
            MergeTable.reclusterBuckets(spark, dir, Seq("a", "id"),
              touched, filesPerBucket = 4)
          ()
      }
      // tenths-precision decimal bounds: the nearest double is usually
      // NOT the decimal, so every trial probes the representation edge
      val aLo = BigDecimal(rng.nextInt(900))
      val aHi = aLo + 1 + rng.nextInt(200)
      val xLo = BigDecimal(rng.nextInt(9000)) / 10
      val xHi = xLo + BigDecimal(1 + rng.nextInt(2000)) / 10
      def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
        d.select("id").as[Long].collect().toSet
      val wantX = ids(MergeTable.read(spark, dir).filter(
        col("x") >= lit(xLo.bigDecimal) && col("x") <= lit(xHi.bigDecimal)))
      assert(ids(MergeTable.readWhere(spark, dir, "x", xLo, xHi)) == wantX,
        s"trial $trial: readWhere(x in [$xLo,$xHi]) lost rows")
      val wantBoth = ids(MergeTable.read(spark, dir).filter(
        col("a") >= lit(aLo.bigDecimal) && col("a") <= lit(aHi.bigDecimal) &&
          col("x") >= lit(xLo.bigDecimal) && col("x") <= lit(xHi.bigDecimal)))
      assert(ids(MergeTable.readWhereAll(spark, dir, Seq(
          ("a", aLo, aHi), ("x", xLo, xHi)))) == wantBoth,
        s"trial $trial: readWhereAll lost rows")
    }
  }

  test("string zones: clusterBy(lang) + readWhereStr prunes files, equality and range scans exact") {
    val dir = s"${Files.createTempDirectory("graft-zstr")}/t"
    val langs = Vector("de", "en", "es", "fr", "xx", "zh")
    val rows = (1L to 6000L).map(i => (i, langs((i % 6).toInt), s"body $i"))
    MergeTable.create(spark, dir, rows.toDF("id", "lang", "text"), "id", nBuckets = 2)

    // hash layout: zones exist but every file spans all langs
    val (k0, t0) = MergeTable.prunedFilesStr(spark, dir, "lang", "de", "de")
    assert(t0 > 0 && k0.size == t0, s"hash layout unprunable: ${k0.size}/$t0")

    val v = MergeTable.clusterBy(spark, dir, "lang", filesPerBucket = 6)
    val (k1, t1) = MergeTable.prunedFilesStr(
      spark, dir, "lang", "de", "de", version = v)
    assert(t1 >= 8, s"expected multi-file clustered layout, got $t1")
    assert(k1.size <= t1 / 2,
      s"one of six langs must skip most files: ${k1.size}/$t1")

    val eq = MergeTable.readWhereStr(spark, dir, "lang", "de", "de", version = v)
      .select("id").as[Long].collect().toSet
    assert(eq == (1L to 6000L).filter(_ % 6 == 0).toSet)
    val range = MergeTable
      .readWhereStr(spark, dir, "lang", "de", "es", version = v)
      .select("id").as[Long].collect().toSet
    assert(range == (1L to 6000L).filter(i => (i % 6) <= 2).toSet)

    // mixed numeric + string conjunction: both bounds exact, string
    // side prunes on this layout
    val mixed = MergeTable.readWhereBounds(spark, dir, Seq(
        MergeTable.StrBound("lang", "de", "en"),
        MergeTable.NumBound("id", BigDecimal(100), BigDecimal(4000))),
      version = v).select("id").as[Long].collect().toSet
    assert(mixed == (100L to 4000L).filter(i => (i % 6) <= 1).toSet)
  }

  test("string zone truncation: bounds valid at multi-byte code points, surrogate gap, increment overflow") {
    import graft.pipeline.ZoneMaps.{cpCompare, truncLower, truncUpper}
    // short values carry exact bounds
    assert(truncLower("short") == "short" && truncUpper("short") == Some("short"))
    // ascii past the bound: prefix lower, incremented upper
    assert(truncLower("a" * 17) == "a" * 16)
    assert(truncUpper("a" * 17) == Some("a" * 15 + "b"))
    // multi-byte code points count as ONE: 16 emoji survive whole
    val emoji = new String(Character.toChars(0x1F600))
    assert(truncLower(emoji * 16 + "tail") == emoji * 16)
    assert(truncUpper(emoji * 16 + "tail") ==
      Some(emoji * 15 + new String(Character.toChars(0x1F601))))
    // incrementing into the surrogate gap lands at U+E000
    assert(truncUpper("x" * 15 + "\uD7FF" + "tail") == Some("x" * 15 + "\uE000"))
    // U+10FFFF carries left; an all-top prefix has NO finite upper bound
    val top = new String(Character.toChars(0x10FFFF))
    assert(truncUpper("a" + top * 15 + "tail") == Some("b"))
    assert(truncUpper(top * 16 + "tail").isEmpty)
    // cpCompare is code-point (= UTF-8 byte) order, NOT Java's UTF-16
    // order: U+FFFF sorts BELOW a supplementary char
    assert(cpCompare("\uFFFF", emoji) < 0 && "\uFFFF".compareTo(emoji) > 0)
  }

  test("string zones: scans exact under truncation, supplementary chars, empty and null values") {
    val dir = s"${Files.createTempDirectory("graft-zstr2")}/t"
    val emoji = new String(Character.toChars(0x1F600))
    val rows: Seq[(Long, String)] = Seq(
      1L -> "prefixprefixprefix-AAAA", // > 16 cps, shared prefix
      2L -> "prefixprefixprefix-BBBB",
      3L -> (emoji * 20),              // long multi-byte value
      4L -> "\uFFFF",                  // BMP top vs supplementary order
      5L -> "",                        // empty string IS a value
      6L -> null)
    MergeTable.create(spark, dir, rows.toDF("id", "s"), "id", nBuckets = 3)
    def want(lo: String, hi: String): Set[Long] = rows.collect {
      case (id, v)
          if v != null && graft.pipeline.ZoneMaps.cpCompare(v, lo) >= 0 &&
            graft.pipeline.ZoneMaps.cpCompare(v, hi) <= 0 => id }.toSet
    def got(lo: String, hi: String): Set[Long] =
      MergeTable.readWhereStr(spark, dir, "s", lo, hi)
        .select("id").as[Long].collect().toSet
    val probes = Seq(
      ("", "\uFFFF"),                     // wide: everything but emoji row
      ("", emoji * 25),                   // wide incl. supplementary
      ("prefixprefixprefix-AAAA", "prefixprefixprefix-AAAA"), // truncated eq
      ("prefixprefixprefix-AAAA!", "prefixprefixprefix-BBBA"), // between twins
      ("\uFFFF", "\uFFFF"),               // eq at the BMP top
      ("", ""),                           // eq on the empty string
      ("zz", "zzz"))                      // above all ascii, below U+FFFF
    probes.foreach { case (lo, hi) =>
      assert(got(lo, hi) == want(lo, hi), s"bounds [$lo, $hi]")
    }
  }

  test("vacuum reclaims old zone sidecars with their manifests") {
    val dir = s"${Files.createTempDirectory("graft-zones3")}/t"
    mkTable(dir)
    MergeTable.merge(spark, dir, Seq((1L, 5L, "x")).toDF("id", "score", "tag"), "id")
    assert(ZoneMaps.read(spark, dir, 1).isDefined)
    MergeTable.vacuum(spark, dir, keepVersions = 1)
    assert(ZoneMaps.read(spark, dir, 1).isEmpty, "v1 zones must be reclaimed")
    assert(ZoneMaps.read(spark, dir, 2).isDefined, "latest zones must survive")
  }
}
