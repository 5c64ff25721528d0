package graft

import org.apache.spark.sql.functions._

import graft.ops.PointInTime
import graft.ops.PointInTime.FeatureTable

/** Point-in-time feature enrichment over the native as-of operator:
  * no future leakage, multi-table chaining, staleness bounds. */
class PointInTimeSpec extends SparkSpec {
  import spark.implicits._

  // entity events: (user, event time, label)
  private def entities = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d"))
    .toDF("user_id", "ets", "label")

  // feature table 1: a score that changes over time (user 3 has only a
  // FUTURE version at ts=60 — must not leak into the ts=50 event)
  private def scores = Seq(
    (1L, 90L, 0.1), (1L, 150L, 0.2), (2L, 100L, 0.5), (3L, 60L, 0.9))
    .toDF("user_id", "fts", "score")

  // feature table 2: a tier string
  private def tiers = Seq(
    (1L, 10L, "bronze"), (1L, 199L, "gold"), (2L, 150L, "silver"))
    .toDF("user_id", "tts", "tier")

  test("each event sees the latest feature at-or-before its time; future values never leak") {
    val got = PointInTime.enrich(entities, "ets", Seq(
        FeatureTable(scores, Seq("user_id"), "fts"),
        FeatureTable(tiers, Seq("user_id"), "tts")))
      .select("user_id", "ets", "label", "score", "tier").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3))),
          Option(r.getString(4)))).toMap
    assert(got((1L, 100L)) === ((Some(0.1), Some("bronze"))))
    assert(got((1L, 200L)) === ((Some(0.2), Some("gold")))) // tier at 199 <= 200
    assert(got((2L, 150L)) === ((Some(0.5), Some("silver")))) // equal ts is visible
    assert(got((3L, 50L)) === ((None, None)), "user 3's ts=60 feature is the FUTURE")
  }

  test("staleness bounds expire old feature values per table") {
    val got = PointInTime.enrich(entities, "ets", Seq(
        FeatureTable(scores, Seq("user_id"), "fts", staleness = Some(20L))))
      .select("user_id", "ets", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 100L)) === Some(0.1))  // lag 10 <= 20
    assert(got((1L, 200L)) === None)       // lag 50 > 20: stale
    assert(got((2L, 150L)) === None)       // lag 50 > 20
  }

  test("all entity rows survive the enrichment (left-outer end to end)") {
    val got = PointInTime.enrich(entities, "ets",
      Seq(FeatureTable(scores, Seq("user_id"), "fts")))
    assert(got.count() === 4)
    // feature ts columns are dropped from the output
    assert(!got.columns.exists(_.startsWith("__pit_ts")))
  }
}
