package graft.pipeline

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Per-file numeric ZONE MAPS (min / max / null presence) for
  * [[MergeTable]] versions — the data-skipping index every lakehouse
  * keeps (Delta/Iceberg file stats; Moerkotte's "small materialized
  * aggregates", VLDB'98): a value-range predicate can skip every file
  * whose [min, max] cannot intersect it, BEFORE any scan task runs.
  *
  * Stats come from PARQUET FOOTERS, not a data rescan: the writer
  * already computed per-rowgroup min/max; harvesting reads a few KB of
  * footer per file, distributed (one task per file batch), and the
  * driver holds one line per file × numeric column — O(files), the
  * same order as the manifest itself.
  *
  * Sidecar `_v<N>.zones` next to the version's manifest, text lines
  * `relpath TAB col TAB kind TAB min TAB max TAB hasNulls TAB
  * nullCount` (kind ∈ long|double; min/max empty for an all-null
  * file; one `#rows` pseudo-line per file carries its row count;
  * legacy 6-field lines parse with nullCount unknown). Non-numeric
  * columns carry no line and are simply never skipped on. The sidecar
  * is written BEFORE the manifest commit (a crash in between leaves an
  * orphan zones file, never a manifest without zones... and a missing
  * sidecar only degrades to harvest-at-read, never to a wrong answer).
  *
  * Incremental discipline ([[MergeTable.merge]]): carried-forward
  * files COPY their previous zone lines by reference; only the files
  * the merge actually wrote get a footer harvest — sidecar refresh
  * cost ∝ delta, the house IVM rule applied to statistics.
  *
  * Zone maps prune only where the layout clusters the column —
  * see [[MergeTable.clusterBy]], which range-lays each bucket by a
  * chosen column exactly so that narrow predicates skip most files
  * (`ZoneMapSpec` pins kept ≪ total and result equality).
  */
object ZoneMaps {

  /** One file×column zone. min/max are the exact decimal strings of
    * the footer stats (BigDecimal-comparable without precision loss —
    * a long > 2^53 would corrupt through a double). `nullCount` is the
    * exact per-file null count when every rowgroup recorded one, −1
    * (unknown) otherwise — the extra statistic that turns zones into
    * a METADATA-ONLY aggregate source ([[MergeTable.metaAggregate]]):
    * COUNT(col) = rows − nullCount needs no scan when it's known.
    * Legacy 6-field sidecar lines parse with nullCount = −1, so old
    * versions degrade to a footer re-harvest, never a wrong answer. */
  final case class Zone(
      kind: String, min: String, max: String, hasNulls: Boolean,
      nullCount: Long = -1L) {
    def allNull: Boolean = min.isEmpty
    /** Could a row of this file satisfy `col ∈ [lo, hi]`? */
    def mightIntersect(lo: BigDecimal, hi: BigDecimal): Boolean =
      !allNull && BigDecimal(min) <= hi && BigDecimal(max) >= lo
  }

  /** Reserved pseudo-column carrying the per-file ROW COUNT (footer
    * block counts summed) — `#` cannot appear in a parquet column
    * path, so it never collides with a real column. Stored as a Zone
    * with kind `count` and min = max = the row count. */
  val RowsKey = "#rows"

  /** The file's row count, when its zones carry one (new-format
    * sidecars and fresh harvests always do; legacy sidecars don't). */
  def rowCount(cols: Map[String, Zone]): Option[Long] =
    cols.get(RowsKey).map(_.min.toLong)

  private def zonesPath(dir: String, v: Int) = new Path(s"$dir/_v$v.zones")

  /** Harvest footer stats for `relPaths` of `dir` — distributed, one
    * footer open per file, numeric leaf columns only. */
  def harvest(
      spark: SparkSession, dir: String, relPaths: Seq[String])
      : Map[String, Map[String, Zone]] = {
    if (relPaths.isEmpty) return Map.empty
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val tasks = math.max(1, math.min(relPaths.size, 64))
    spark.sparkContext.parallelize(relPaths, tasks).map { rel =>
      val in = HadoopInputFile.fromPath(new Path(s"$dir/$rel"), conf.value)
      val r = ParquetFileReader.open(in)
      try {
        // fold rowgroup stats up to one (min, max, hasNulls, nullCount)
        // per column; a column with any unparseable rowgroup
        // (NaN-bearing float stats are writer-dependent) is POISONED —
        // no zone, never a mis-prune. nullCount stays exact only while
        // every rowgroup reports one (−1 from any block → −1 total).
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[String, (String, BigDecimal, BigDecimal, Boolean, Boolean, Long)]
        val poisoned = scala.collection.mutable.HashSet.empty[String]
        var fileRows = 0L
        r.getFooter.getBlocks.asScala.foreach { blk =>
          fileRows += blk.getRowCount
          blk.getColumns.asScala.foreach { cc =>
            // footer stats are PHYSICAL values: for an INT32/INT64 whose
            // logical annotation is decimal/date/time/timestamp/unsigned
            // they are raw unscaled (or wrongly-ordered, for unsigned)
            // numbers, while predicates and metaAggregate speak LOGICAL
            // values — poison any annotated int column that is not a
            // plain signed int, so it is never skipped on and never
            // reported (never a wrong answer; the column just doesn't
            // prune). FLOAT/DOUBLE carry no value-changing annotations.
            val logical = cc.getPrimitiveType.getLogicalTypeAnnotation
            val plainSignedInt = logical == null || (logical match {
              case i: org.apache.parquet.schema.LogicalTypeAnnotation
                    .IntLogicalTypeAnnotation => i.isSigned
              case _ => false
            })
            val kind = cc.getPrimitiveType.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64
                  if plainSignedInt => "long"
              case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => "double"
              case _ => null
            }
            val st = cc.getStatistics
            val name = if (cc.getPath == null) null else cc.getPath.toDotString
            if (kind == null && name != null) poisoned += name
            else if (st == null || st.isEmpty) poisoned += name
            else {
              val blkNulls = st.getNumNulls // -1 = writer didn't record
              val nulls = blkNulls != 0     // -1 (unknown) counts as "may have"
              val parsed =
                if (!st.hasNonNullValue) Some((null: BigDecimal, null: BigDecimal))
                else
                  try Some((BigDecimal(st.genericGetMin.toString),
                    BigDecimal(st.genericGetMax.toString)))
                  catch { case _: NumberFormatException => None }
              parsed match {
                case None => poisoned += name
                case Some((mn, mx)) =>
                  val nonNull = mn != null
                  acc.get(name) match {
                    case None =>
                      acc(name) = (kind, mn, mx, nulls, nonNull, blkNulls)
                    case Some((k, omn, omx, on, ov, onc)) =>
                      acc(name) = (k,
                        if (!nonNull) omn else if (!ov) mn else omn.min(mn),
                        if (!nonNull) omx else if (!ov) mx else omx.max(mx),
                        on || nulls, ov || nonNull,
                        if (onc < 0 || blkNulls < 0) -1L else onc + blkNulls)
                  }
              }
            }
          }
        }
        val cols = (acc -- poisoned).toMap.map {
          case (c, (k, mn, mx, nulls, nonNull, nc)) =>
            c -> Zone(k,
              if (nonNull) mn.bigDecimal.toPlainString else "",
              if (nonNull) mx.bigDecimal.toPlainString else "", nulls, nc)
        }
        rel -> (cols + (RowsKey ->
          Zone("count", fileRows.toString, fileRows.toString, false, 0L)))
      } finally r.close()
    }.collect().toMap
  }

  /** Write the sidecar for version `v`: `newFiles` get harvested,
    * `carried` (file → zones read from a previous sidecar) copy by
    * reference. Call BEFORE the manifest commit. */
  def write(
      spark: SparkSession, dir: String, v: Int,
      newFiles: Seq[String],
      carried: Map[String, Map[String, Zone]] = Map.empty): Unit = {
    val all = carried ++ harvest(spark, dir, newFiles)
    val body = all.toSeq.sortBy(_._1).flatMap { case (rel, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, z) =>
        s"$rel\t$c\t${z.kind}\t${z.min}\t${z.max}\t${z.hasNulls}\t${z.nullCount}"
      }
    }.mkString("", "\n", "\n")
    // temp + rename: the sidecar's PRESENCE is a completeness signal
    // (maintained indexes use it as a version cursor), so a crash
    // mid-write must leave no half-file at the final path
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fin = zonesPath(dir, v)
    val tmp = new Path(s"$dir/._v$v.zones.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    f.delete(fin, false)
    require(f.rename(tmp, fin), s"rename $tmp -> $fin failed")
  }

  /** Read version `v`'s sidecar; None when absent (pre-zones version —
    * callers fall back to [[harvest]]). */
  def read(
      spark: SparkSession, dir: String, v: Int)
      : Option[Map[String, Map[String, Zone]]] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = zonesPath(dir, v)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      Some(text.split("\n").toSeq.filter(_.nonEmpty).map { l =>
        val a = l.split("\t", -1)
        require(a.length == 6 || a.length == 7, s"corrupt zones line: $l")
        // 6 fields = legacy (pre-nullCount) sidecar → nullCount unknown
        val nc = if (a.length == 7) a(6).toLong else -1L
        (a(0), a(1), Zone(a(2), a(3), a(4), a(5).toBoolean, nc))
      }.groupBy(_._1).map { case (rel, rows) =>
        rel -> rows.map(r => r._2 -> r._3).toMap
      })
    }
  }

  /** Zones of version `v`, restricted to `relPaths` — sidecar when
    * present, footer harvest otherwise. */
  def forVersion(
      spark: SparkSession, dir: String, v: Int, relPaths: Seq[String])
      : Map[String, Map[String, Zone]] =
    read(spark, dir, v) match {
      case Some(m) =>
        val wanted = relPaths.toSet
        val missing = relPaths.filterNot(m.contains)
        m.filter { case (rel, _) => wanted.contains(rel) } ++
          harvest(spark, dir, missing)
      case None => harvest(spark, dir, relPaths)
    }
}
