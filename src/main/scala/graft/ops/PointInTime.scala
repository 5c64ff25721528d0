package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** Point-in-time-correct feature enrichment — the feature-store join
  * (Feast/Tecton's `get_historical_features` semantics): for each
  * entity row at its event timestamp, attach the LATEST feature row
  * at-or-before that timestamp from each feature table, optionally
  * within a max-staleness bound. Using a plain equi-join on the latest
  * feature version instead leaks FUTURE feature values into training
  * examples — the canonical offline/online skew bug this join shape
  * exists to prevent.
  *
  * Built directly on the native [[graft.plans.AsOfJoin]] operator
  * (backward direction + tolerance), one as-of join per feature table
  * — each is a single merge pass with one exchange+sort per side and
  * O(1) state per partition, so an N-table enrichment is N keyed
  * shuffles of the (shrinking-width) entity frame and one of each
  * feature table: the same budget as N sort-merge joins, with no
  * window buffering on hot entities.
  */
object PointInTime {

  /** One feature table: `on` = entity key columns (must exist on both
    * sides), `tsCol` = the feature-row validity timestamp,
    * `staleness` = optional max (entityTs − featureTs) in the ts
    * type's native units (micros for timestamps). Feature VALUE
    * columns must not collide with entity columns — rename upstream,
    * as with any join. */
  case class FeatureTable(
      df: DataFrame,
      on: Seq[String],
      tsCol: String,
      staleness: Option[Long] = None)

  /** Enrich `entities` (carrying `entityTs`) with every feature table,
    * point-in-time-correct. Feature timestamps are dropped from the
    * output (their values are ≤ `entityTs` by construction; keep a
    * copy under another name upstream if needed). */
  def enrich(
      entities: DataFrame,
      entityTs: String,
      features: Seq[FeatureTable]): DataFrame = {
    require(features.nonEmpty, "need at least one feature table")
    features.zipWithIndex.foldLeft(entities) { case (acc, (f, i)) =>
      // a fresh ts name per table: the as-of output keeps the right ts
      // column, and a collision with entityTs (or an earlier table's
      // ts) would make the next join's name resolution ambiguous
      val tsAlias = s"__pit_ts_$i"
      val renamed = f.df.withColumnRenamed(f.tsCol, tsAlias)
      AsOfJoin.join(acc, renamed, f.on, entityTs, tsAlias,
          joinType = "left_outer", tolerance = f.staleness)
        .drop(tsAlias)
    }
  }
}
