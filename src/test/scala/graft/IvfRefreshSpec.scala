package graft

import org.apache.spark.sql.functions._

import graft.index.{IvfRefresh, VectorIndex}
import graft.pipeline.MergeTable

/** [[IvfRefresh]] — frozen-centroid IVF maintenance must equal a full
  * reassignment of the merged corpus, touch only the affected cell
  * directories on disk, handle deletes (including a cell emptied of
  * its last vector), keep search exact in the exhaustive
  * configuration, and raise the occupancy-PSI retrain signal on a
  * skewed insert wave.
  */
class IvfRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val nlist = 4

  /** Deterministic embedding: unit-ish vector in one of four obvious
    * directions plus a small id-dependent wobble, so KMeans recovers
    * the directions as cells. */
  private def emb(group: Int, i: Long): Seq[Double] = {
    val base = Array.fill(dim)(0.05)
    base(group) = 1.0
    base(4 + (i % 4).toInt) += 0.01 * ((i % 7) + 1)
    base.toSeq
  }

  private def mkCorpus(dir: String, n: Long): Unit = {
    val rows = (1L to n).map(i => (i, emb((i % 4).toInt, i)))
    MergeTable.create(spark, dir, rows.toDF("vec_id", "embedding"),
      "vec_id", nBuckets = 8)
  }

  private def freshDirs(): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfr")
    d.toFile.deleteOnExit()
    (d.resolve("corpus").toString, d.resolve("index").toString)
  }

  private def cellsOf(indexPath: String): Map[Long, (Int, Seq[Double])] =
    spark.read.parquet(indexPath + "/cells")
      .select(col("vec_id"), col("cell"), col("embedding"))
      .as[(Long, Int, Seq[Double])].collect()
      .map { case (id, c, e) => (id, (c, e)) }.toMap

  /** The truth: every live corpus row assigned under the index's own
    * frozen centers. */
  private def fullReassign(corpusDir: String, indexPath: String): Map[Long, (Int, Seq[Double])] = {
    val centers = VectorIndex.loadIvf(spark, indexPath).centers
    IvfRefresh.assignToCenters(
        MergeTable.read(spark, corpusDir).select("vec_id", "embedding"), centers)
      .as[(Long, Seq[Double], Int)].collect()
      .map { case (id, e, c) => (id, (c, e)) }.toMap
  }

  test("refresh equals a full reassignment under frozen centers, deletes included") {
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 200L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    assert(cellsOf(index) == fullReassign(corpus, index))

    // v2: move vectors across cells (direction change), delete a slab,
    // insert new ids
    val moves = (1L to 40L).filter(_ % 4 == 1)
      .map(i => (i, emb(2, i), false)) // group 1 → direction 2
    val dels = (41L to 80L).filter(_ % 4 == 2).map(i => (i, emb(0, i), true))
    val ins = (1001L to 1020L).map(i => (i, emb(3, i), false))
    MergeTable.merge(spark, corpus,
      (moves ++ dels ++ ins).toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)

    val (affected, nUp, nDel) = IvfRefresh.refresh(spark, corpus, index, 1, 2)
    assert(nUp == moves.size + ins.size)
    assert(nDel == dels.size)
    assert(affected.nonEmpty && affected.size <= nlist)
    assert(cellsOf(index) == fullReassign(corpus, index),
      "maintained cells must equal a from-scratch reassignment")
  }

  test("only affected cell directories are rewritten on disk") {
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 200L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)

    def listing(cell: Int): Set[String] = {
      val d = new java.io.File(s"$index/cells/cell=$cell")
      Option(d.listFiles()).map(_.map(f => f.getName + ":" + f.length).toSet)
        .getOrElse(Set.empty)
    }
    val before = (0 until nlist).map(c => c -> listing(c)).toMap

    // touch ONE vector without changing its direction (stays in its cell)
    val v = MergeTable.read(spark, corpus).filter(col("vec_id") === 5L)
      .select("embedding").head.getSeq[Double](0)
    MergeTable.merge(spark, corpus,
      Seq((5L, v.updated(7, v(7) + 1e-4), false)).toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    val (affected, _, _) = IvfRefresh.refresh(spark, corpus, index, 1, 2)
    assert(affected.size == 1, s"one same-cell edit must touch one cell: $affected")

    val after = (0 until nlist).map(c => c -> listing(c)).toMap
    (0 until nlist).filterNot(affected.contains).foreach { c =>
      assert(after(c) == before(c), s"unaffected cell $c was rewritten")
    }
    assert(after(affected.head) != before(affected.head),
      "the affected cell must actually have been rewritten")
    assert(cellsOf(index) == fullReassign(corpus, index))
  }

  test("a cell emptied of its last vector disappears and search never returns stale rows") {
    val (corpus, index) = freshDirs()
    // direction 3 is a tight 10-vector cluster that will own ≥1 cell;
    // deleting ALL of it must empty (and remove) those cell dirs
    val d3Ids = (991L to 1000L)
    val rows = (1L to 30L).map(i => (i, emb((i % 3).toInt, i))) ++
      d3Ids.map(i => (i, emb(3, i)))
    MergeTable.create(spark, corpus, rows.toDF("vec_id", "embedding"),
      "vec_id", nBuckets = 4)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    val d3Cells = cellsOf(index).filter(kv => d3Ids.contains(kv._1)).values.map(_._1).toSet
    val otherCells = cellsOf(index).filterNot(kv => d3Ids.contains(kv._1)).values.map(_._1).toSet
    assume(d3Cells.intersect(otherCells).isEmpty,
      "fixture: the d3 cluster must own its cells outright")

    MergeTable.merge(spark, corpus,
      d3Ids.map(i => (i, emb(3, i), true)).toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    IvfRefresh.refresh(spark, corpus, index, 1, 2)

    d3Cells.foreach { c =>
      assert(!new java.io.File(s"$index/cells/cell=$c").exists(),
        s"emptied cell $c's directory must be removed")
    }
    assert(cellsOf(index) == fullReassign(corpus, index))
    // exhaustive search over the maintained index must not see deleted rows
    val ivf = VectorIndex.loadIvf(spark, index)
    val got = VectorIndex
      .searchIvf(ivf, emb(3, 991L).toArray, k = 5, threshold = -1.0, nprobe = nlist,
        normalizedInput = false)
      .select("vec_id").as[Long].collect()
    assert(got.toSet.intersect(d3Ids.toSet).isEmpty)
    assert(got.nonEmpty)
  }

  test("after maintenance, a moved vector is found through its NEW cell at nprobe=1") {
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 200L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)

    // vector 42 changes direction 2 → 0; a probe near direction 0 with
    // nprobe=1 reads ONLY the best cell, so finding 42 proves the
    // assignment actually moved on disk (stale assignment would leave
    // it in the old cell, invisible to the probe)
    val moved = 42L
    assume(moved % 4 == 2)
    MergeTable.merge(spark, corpus,
      Seq((moved, emb(0, moved), false)).toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    IvfRefresh.refresh(spark, corpus, index, 1, 2)

    val ivf = VectorIndex.loadIvf(spark, index)
    val got = VectorIndex
      .searchIvf(ivf, emb(0, moved).toArray, k = 3, threshold = -1.0, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(got.contains(moved),
      s"moved vector must surface through its new cell at nprobe=1: got ${got.toSeq}")
  }

  test("a crashed swap is redone from the marker: staged, already-renamed, and emptied cells all converge") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 200L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    val truth = cellsOf(index)
    val byCell = truth.groupBy(_._2._1)
    val Seq(cx, cy, cz) = byCell.keys.toSeq.sorted.take(3)

    // forge the moment just after the commit point of a refresh whose
    // outcome is: cell cx gets the staged content, cy was already
    // renamed in (stage lost it), cz emptied
    val stage = Paths.get(index, "cells_stage")
    JFiles.createDirectories(stage.resolve(s"cell=$cx"))
    // staged content for cx := cy's current files (recognizably different)
    val cyDir = Paths.get(index, "cells", s"cell=$cy")
    JFiles.list(cyDir).forEach { f =>
      JFiles.copy(f, stage.resolve(s"cell=$cx").resolve(f.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    JFiles.writeString(Paths.get(index, "_swap_pending"),
      s"$cx staged\n$cy staged\n$cz empty")

    // readers must refuse mid-swap state rather than repair it
    // (recovery is writer-path-only)
    intercept[IllegalArgumentException] {
      VectorIndex.loadIvf(spark, index)
    }

    IvfRefresh.recover(spark, index)
    assert(!JFiles.exists(Paths.get(index, "_swap_pending")), "marker must fall")
    assert(!JFiles.exists(stage), "stage must be cleaned")
    assert(!JFiles.exists(Paths.get(index, "cells", s"cell=$cz")),
      "the emptied cell's live dir must be deleted on redo")
    def pairs(): Set[(Long, Int)] =
      spark.read.parquet(s"$index/cells").select(col("vec_id"), col("cell"))
        .as[(Long, Int)].collect().toSet
    val truthPairs = truth.map { case (id, (c, _)) => (id, c) }.toSet
    val expected = truthPairs
      .filterNot { case (_, c) => c == cx || c == cz } ++ // cx replaced, cz emptied
      byCell(cy).keySet.map(id => (id, cx)) // cx := the staged (cy-copied) rows
    val after = pairs()
    assert(after == expected,
      s"redo must converge to the marker's outcome (diff: ${after.diff(expected)} / ${expected.diff(after)})")
    // recover is also idempotent as a no-op afterwards
    IvfRefresh.recover(spark, index)
    assert(pairs() == after)
  }

  test("a full rebuild supersedes a pending swap instead of letting it replay") {
    import java.nio.file.{Files => JFiles, Paths}
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 120L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    // forge crashed-swap leftovers that would corrupt the new build if
    // ever replayed: an 'empty' entry for a live cell + a stale stage
    JFiles.createDirectories(Paths.get(index, "cells_stage", "cell=0"))
    JFiles.writeString(Paths.get(index, "_swap_pending"), "0 empty")

    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    assert(!JFiles.exists(Paths.get(index, "_swap_pending")),
      "rebuild must discard the pending marker")
    assert(!JFiles.exists(Paths.get(index, "cells_stage")),
      "rebuild must discard the stale stage")
    // loadIvf accepts the fresh index; recover is a no-op on it
    VectorIndex.loadIvf(spark, index)
    IvfRefresh.recover(spark, index)
    assert(cellsOf(index) == fullReassign(corpus, index))
  }

  test("IvfCellLists Maintained artifact advances through the same refresh path") {
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 120L)
    val art = graft.streaming.CorpusViews.IvfCellLists(index, nlist = nlist)
    assert(art.version(spark).isEmpty)
    art.advance(spark, corpus, 1)
    assert(art.version(spark).contains(1))
    assert(cellsOf(index) == fullReassign(corpus, index))

    MergeTable.merge(spark, corpus,
      ((1L to 12L).map(i => (i, emb(3, i), false)) ++
        Seq((20L, emb(0, 20L), true)))
        .toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    art.advance(spark, corpus, 2)
    assert(art.version(spark).contains(2))
    assert(cellsOf(index) == fullReassign(corpus, index),
      "advance must maintain, not rebuild — and must equal the truth")

    // an already-reflected version no-ops (cursor monotonicity)
    art.advance(spark, corpus, 2)
    assert(art.version(spark).contains(2))
  }

  test("occupancy PSI flags a skewed insert wave but not a proportional one") {
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 400L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    val occ1 = IvfRefresh.occupancy(spark, index)

    // skewed wave: every insert lands in one direction
    MergeTable.merge(spark, corpus,
      (2001L to 2400L).map(i => (i, emb(1, i), false))
        .toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    IvfRefresh.refresh(spark, corpus, index, 1, 2)
    val skewPsi = IvfRefresh.occupancyPsi(occ1, IvfRefresh.occupancy(spark, index), nlist)
    assert(skewPsi > 0.2, s"skewed inserts must trip the retrain signal, psi=$skewPsi")

    // proportional wave from the same generator distribution barely moves PSI
    val (corpus2, index2) = freshDirs()
    mkCorpus(corpus2, 400L)
    IvfRefresh.build(spark, corpus2, index2, nlist = nlist)
    val occA = IvfRefresh.occupancy(spark, index2)
    MergeTable.merge(spark, corpus2,
      (2001L to 2400L).map(i => (i, emb((i % 4).toInt, i), false))
        .toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    IvfRefresh.refresh(spark, corpus2, index2, 1, 2)
    val flatPsi = IvfRefresh.occupancyPsi(occA, IvfRefresh.occupancy(spark, index2), nlist)
    assert(flatPsi < 0.1, s"a proportional wave must stay stable, psi=$flatPsi")
  }

  test("occupancy refuses a crashed mid-swap index (counting half-swapped dirs would skew PSI)") {
    import java.nio.file.{Files => JFiles, Paths}
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 60L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    JFiles.writeString(Paths.get(index, "_swap_pending"), "0 empty")
    intercept[IllegalArgumentException] {
      IvfRefresh.occupancy(spark, index)
    }
    JFiles.delete(Paths.get(index, "_swap_pending"))
    assert(IvfRefresh.occupancy(spark, index).values.sum == 60L)
  }

  test("all-insert into previously emptied cells refreshes without listing the cells root") {
    // the edge the ADVICE r8 fallback fix targets: every AFFECTED cell
    // dir is absent (emptied earlier), so the retained-rows frame must
    // come from the new assignments' own schema, not a root read
    val (corpus, index) = freshDirs()
    val d3Ids = (991L to 1000L)
    val rows = (1L to 30L).map(i => (i, emb((i % 3).toInt, i))) ++
      d3Ids.map(i => (i, emb(3, i)))
    MergeTable.create(spark, corpus, rows.toDF("vec_id", "embedding"),
      "vec_id", nBuckets = 4)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    val d3Cells = cellsOf(index).filter(kv => d3Ids.contains(kv._1)).values.map(_._1).toSet
    val otherCells = cellsOf(index).filterNot(kv => d3Ids.contains(kv._1)).values.map(_._1).toSet
    assume(d3Cells.intersect(otherCells).isEmpty)

    // v2 empties the direction-3 cells entirely
    MergeTable.merge(spark, corpus,
      d3Ids.map(i => (i, emb(3, i), true)).toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    IvfRefresh.refresh(spark, corpus, index, 1, 2)
    d3Cells.foreach(c => assert(!new java.io.File(s"$index/cells/cell=$c").exists()))

    // v3 inserts ONLY direction-3 vectors: affected ⊆ the emptied cells,
    // none of whose dirs exist
    MergeTable.merge(spark, corpus,
      (3001L to 3010L).map(i => (i, emb(3, i), false))
        .toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    val (affected, nUp, nDel) = IvfRefresh.refresh(spark, corpus, index, 2, 3)
    assert(affected.toSet.subsetOf(d3Cells), s"affected=$affected d3=$d3Cells")
    assert(nUp == 10L && nDel == 0L)
    assert(cellsOf(index) == fullReassign(corpus, index))
  }

  /** A tight drift cluster straddling a frozen Voronoi boundary: rows
    * at (0.75±0.02, 0.75, …) — the x-coordinate spans five levels
    * 0.73..0.77 whose frozen c0/c1 assignment boundary sits at
    * x≈0.7513, so the cluster splits across the two nearest old cells
    * and an nprobe=1 probe sees only part of it — the real-world
    * recall pathology the retrain loop exists for. (i%5, i%4, i%7 are
    * pairwise coprime, so the straddle level is independent of the
    * wobble pattern neighbors are ranked by.) */
  private def driftEmb(i: Long): Seq[Double] = {
    val b = Array.fill(dim)(0.05)
    b(0) = 0.75 + ((i % 5) - 2) * 0.01
    b(1) = 0.75
    b(4 + (i % 4).toInt) += 0.01 * ((i % 7) + 1)
    b.toSeq
  }

  test("closed retrain loop: a drifted stream trips PSI, retrains, and nprobe=1 recall@5 recovers") {
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 200L)
    // twin index that NEVER retrains — the frozen-center counterfactual
    val (_, frozenIndex) = freshDirs()

    val art = graft.streaming.CorpusViews.IvfCellLists(index, nlist = nlist)
    val frozen = graft.streaming.CorpusViews.IvfCellLists(
      frozenIndex, nlist = nlist, retrainPsi = Double.PositiveInfinity)
    art.advance(spark, corpus, 1)
    frozen.advance(spark, corpus, 1)
    assert(IvfRefresh.readOccupancyBaseline(spark, index).isDefined,
      "build must record the training-time occupancy baseline")
    val centersBefore = VectorIndex.loadIvf(spark, index).centers.map(_.toSeq).toSeq

    // dense drifted wave (400 rows vs 200 original)
    MergeTable.merge(spark, corpus,
      (2001L to 2400L).map(i => (i, driftEmb(i), false))
        .toDF("vec_id", "embedding", "_del"),
      "vec_id", deleteCol = Some("_del"), validate = false)
    art.advance(spark, corpus, 2)
    frozen.advance(spark, corpus, 2)

    val centersAfter = VectorIndex.loadIvf(spark, index).centers.map(_.toSeq).toSeq
    assert(centersAfter != centersBefore,
      "the PSI trigger must have fired a retrain (centers unchanged = no retrain)")
    assert(VectorIndex.loadIvf(spark, frozenIndex).centers.map(_.toSeq).toSeq == centersBefore,
      "the opted-out twin must keep its frozen centers")

    // recall@5 for a probe BETWEEN the straddle levels (x=0.755): its
    // exact neighbors are the x=0.75 and x=0.76 rows of its wobble
    // pattern, which the frozen index keeps in DIFFERENT cells
    val q = {
      val b = Array.fill(dim)(0.05)
      b(0) = 0.755; b(1) = 0.75; b(6) += 0.03
      b
    }
    def annAt(path: String): Set[Long] =
      VectorIndex.searchIvf(VectorIndex.loadIvf(spark, path), q,
          k = 5, threshold = -1.0, nprobe = 1)
        .select("vec_id").as[Long].collect().toSet
    val exact = VectorIndex.search(
        MergeTable.read(spark, corpus).select("vec_id", "embedding"), q,
        k = 5, threshold = -1.0)
      .select("vec_id").as[Long].collect().toSet

    val frozenRecall = annAt(frozenIndex).intersect(exact).size / 5.0
    val retrainedRecall = annAt(index).intersect(exact).size / 5.0
    assert(frozenRecall < 1.0,
      s"fixture must degrade the frozen index at nprobe=1, recall=$frozenRecall")
    assert(retrainedRecall == 1.0,
      s"post-retrain recall@5 must recover to the pinned nprobe=1 floor, got $retrainedRecall (frozen twin: $frozenRecall)")

    // the retrain reset the baseline: an immediate re-check reports no drift
    val (psiAfter, retrainedAgain) = IvfRefresh.retrainIfDrifted(
      spark, corpus, index, 2)
    assert(!retrainedAgain && psiAfter < 0.1,
      s"baseline must reset at retrain, got psi=$psiAfter retrained=$retrainedAgain")
  }

  test("retrainIfDrifted on a pre-baseline index records one instead of guessing") {
    import java.nio.file.{Files => JFiles, Paths}
    val (corpus, index) = freshDirs()
    mkCorpus(corpus, 60L)
    IvfRefresh.build(spark, corpus, index, nlist = nlist)
    JFiles.delete(Paths.get(index, "_occupancy_baseline")) // simulate an old index
    val (psi, retrained) = IvfRefresh.retrainIfDrifted(spark, corpus, index, 1)
    assert(psi == 0.0 && !retrained)
    assert(IvfRefresh.readOccupancyBaseline(spark, index).isDefined)
  }
}
