package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

import graft.pipeline.{FingerprintsRefresh, IncrementalStats, PostingsRefresh}

/** Standing derived artifacts a streaming corpus keeps fresh — the
  * maintenance side of [[StreamingIngest.startMergeUpsertMaintained]].
  * Each instance owns one artifact (a stats cell view, a BM25 postings
  * index, a passage-fingerprint index), remembers the corpus version it
  * reflects, and advances incrementally when the stream commits a new
  * one. All three route through the batch IVM family
  * ([[IncrementalStats]]/[[PostingsRefresh]]/[[FingerprintsRefresh]]),
  * so streamed maintenance and batch maintenance are the same audited
  * code path — the streaming layer only supplies the version cursor.
  *
  * Crash contract shared by all: the version cursor is persisted AFTER
  * the artifact write, so a crash in between leaves the cursor behind
  * and the next advance spans both corpus transitions (bucket pruning
  * composes across version ranges); a batch retried after its merge
  * committed re-merges content-identically and `advance` no-ops on an
  * already-reflected version.
  */
sealed trait Maintained {

  /** Corpus version the artifact currently reflects, if built. */
  def version(spark: SparkSession): Option[Int]

  /** Bring the artifact from [[version]] to corpus version `to`
    * (build from scratch on first call, no-op if already there). */
  final def advance(spark: SparkSession, corpusDir: String, to: Int): Unit =
    version(spark) match {
      case Some(p) if p >= to => ()
      case from => doAdvance(spark, corpusDir, from, to)
    }

  protected def doAdvance(
      spark: SparkSession, corpusDir: String, from: Option[Int], to: Int): Unit
}

object CorpusViews {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Version cursor as empty `_corpus_v<N>` marker files (creation is
    * atomic; read takes the max, so a crash can only leave the cursor
    * BEHIND the artifact — re-advancing is idempotent). */
  private def readCursor(spark: SparkSession, dir: String): Option[Int] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.matches("_corpus_v\\d+") => s.drop(9).toInt }
      .maxOption
  }

  private def writeCursor(spark: SparkSession, dir: String, v: Int): Unit = {
    fs(spark, dir).create(new Path(s"$dir/_corpus_v$v"), true).close()
  }

  /** Per-`groupCol` (count, sum of `valueCol`) cell view, frozen to
    * `viewDir/v<N>` parquet per reflected corpus version. Cursor = the
    * newest complete (`_SUCCESS`-bearing) frozen version. */
  final case class StatsView(
      viewDir: String, groupCol: String, valueCol: String) extends Maintained {

    def version(spark: SparkSession): Option[Int] = versions(spark).maxOption

    private def versions(spark: SparkSession): Seq[Int] = {
      val p = new Path(viewDir)
      val f = fs(spark, viewDir)
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
        .filter(v => f.exists(new Path(s"$viewDir/v$v/_SUCCESS")))
    }

    protected def doAdvance(
        spark: SparkSession, corpusDir: String, from: Option[Int], to: Int): Unit = {
      val view = from match {
        case Some(p) =>
          IncrementalStats.refreshView(spark, corpusDir,
            spark.read.parquet(s"$viewDir/v$p"), groupCol, valueCol, p, to)
        case None =>
          IncrementalStats.view(spark, corpusDir, groupCol, valueCol, version = to)
      }
      view.write.mode("overwrite").parquet(s"$viewDir/v$to")
    }

    /** The maintained stats at the newest frozen version:
      * (groupCol, n, total) — no corpus scan. */
    def latest(spark: SparkSession): DataFrame = {
      val vs = versions(spark)
      require(vs.nonEmpty, s"no maintained view under $viewDir")
      IncrementalStats.finalizeStats(
        spark.read.parquet(s"$viewDir/v${vs.max}"), groupCol)
    }
  }

  /** Standing BM25 postings index ([[PostingsRefresh]]) at `indexDir`,
    * built from the corpus on first advance. */
  final case class PostingsIndex(
      indexDir: String, textCol: String = "text") extends Maintained {

    def version(spark: SparkSession): Option[Int] = readCursor(spark, indexDir)

    protected def doAdvance(
        spark: SparkSession, corpusDir: String, from: Option[Int], to: Int): Unit = {
      from match {
        case None =>
          PostingsRefresh.build(spark, corpusDir, indexDir, textCol, version = to)
        case Some(p) =>
          PostingsRefresh.refresh(spark, corpusDir, indexDir, p, to, textCol)
      }
      writeCursor(spark, indexDir, to)
    }
  }

  /** Standing winnowed passage-fingerprint index
    * ([[FingerprintsRefresh]]) at `indexDir`. */
  final case class FingerprintIndex(
      indexDir: String, textCol: String = "text",
      k: Int = 16, w: Int = 8) extends Maintained {

    def version(spark: SparkSession): Option[Int] = readCursor(spark, indexDir)

    protected def doAdvance(
        spark: SparkSession, corpusDir: String, from: Option[Int], to: Int): Unit = {
      from match {
        case None =>
          FingerprintsRefresh.build(
            spark, corpusDir, indexDir, textCol, version = to, k = k, w = w)
        case Some(p) =>
          FingerprintsRefresh.refresh(
            spark, corpusDir, indexDir, p, to, textCol, k = k, w = w)
      }
      writeCursor(spark, indexDir, to)
    }
  }
}
