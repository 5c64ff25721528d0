package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST — streaming AS-OF enrichment: a live probe stream (events
  * needing point-in-time context) joined per key against a live
  * update stream (a slowly-changing dimension: prices, feature
  * snapshots, model versions), each probe matched with the LATEST
  * update at or before its event time — the streaming counterpart of
  * the engine's native batch [[graft.plans.AsOfJoin]] (backward
  * direction), which Structured Streaming's built-in stream-stream
  * joins cannot express (an as-of match is a per-row argmax over the
  * other side, not an interval predicate).
  *
  * Correctness contract: a probe is emitted only once the WATERMARK
  * has passed its event time — at that point every update at or
  * before the probe's time has either arrived or been dropped as too
  * late, so the match is final (append mode needs no retraction).
  * Both sides ride one union stream with a shared watermark; rows
  * later than the watermark are filtered by the engine before the
  * state function, which is exactly the lateness bound of the
  * guarantee.
  *
  * State bound (the 100 TB-stream shape): per key, the pending probes
  * still inside the watermark horizon PLUS a compacted update buffer —
  * every update strictly older than the newest watermark-covered
  * update is unreachable (any future probe's as-of time is past the
  * watermark, so that newest covered update shadows everything
  * before it) and is dropped each trigger. Steady-state size is
  * O(updates within the horizon) + 1 per key, not O(stream).
  *
  * Duplicate update timestamps on a key tie-break to the largest
  * value (deterministic; mirror the batch twin's ordering when
  * comparing). Emitted rows carry `match_us`/`value` as None when no
  * update at or before the probe exists (left-outer semantics).
  */
object StreamAsOf {

  case class Probe(key: Long, ts: Timestamp, probe_id: Long)
  case class Update(key: Long, ts: Timestamp, value: Double)

  /** The tagged union both sides ride (one watermark, one shuffle). */
  case class Tagged(
      key: Long, ts: Timestamp, is_probe: Boolean, probe_id: Long, value: Double)

  /** Per-key state: pending probes (us, probe_id) + update buffer
    * (us, value), both kept sorted. */
  case class AsOfState(probes: Seq[(Long, Long)], updates: Seq[(Long, Double)])

  case class Enriched(
      key: Long, probe_id: Long, probe_us: Long,
      match_us: Option[Long], value: Option[Double])

  private def usOf(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000

  private def stateFn(
      key: Long,
      events: Iterator[Tagged],
      state: GroupState[AsOfState]): Iterator[Enriched] = {
    val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
    val probes = ArrayBuffer.empty[(Long, Long)] ++ st.probes
    val updates = ArrayBuffer.empty[(Long, Double)] ++ st.updates
    if (!state.hasTimedOut) {
      for (e <- events) {
        if (e.is_probe) probes += ((usOf(e.ts), e.probe_id))
        else updates += ((usOf(e.ts), e.value))
      }
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val updSorted = updates.sortBy(identity).toArray
    // probes final once STRICTLY below the watermark (a row exactly at
    // the watermark may still arrive)
    val (ready, pending) = probes.partition(_._1 < wmUs)
    val out = ready.sortBy(identity).iterator.map { case (pUs, pid) =>
      // latest update at or before the probe: binary search for the
      // first update past pUs, step back one
      var lo = 0; var hi = updSorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (updSorted(mid)._1 <= pUs) lo = mid + 1 else hi = mid
      }
      if (lo == 0) Enriched(key, pid, pUs, None, None)
      else Enriched(key, pid, pUs, Some(updSorted(lo - 1)._1), Some(updSorted(lo - 1)._2))
    }
    // compact: drop updates shadowed by the newest watermark-covered one
    val pivot = {
      var lo = 0; var hi = updSorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (updSorted(mid)._1 <= wmUs) lo = mid + 1 else hi = mid
      }
      if (lo == 0) 0 else lo - 1
    }
    val compacted = updSorted.drop(pivot)
    val result = out.toVector // force before mutating state
    if (pending.isEmpty && compacted.isEmpty) state.remove()
    else {
      state.update(AsOfState(pending.sortBy(identity).toSeq, compacted.toSeq))
      if (pending.nonEmpty)
        // fires once the watermark passes the earliest pending probe
        state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1L)
    }
    result.iterator
  }

  /** Streaming backward as-of enrichment of `probes` against
    * `updates`. Both inputs must be streaming Datasets; `watermark`
    * is the shared max lateness (also the emission delay: a probe
    * emits once the watermark — max event time minus this — passes
    * its timestamp). Append mode; each probe emits exactly once. */
  def enrich(
      probes: Dataset[Probe],
      updates: Dataset[Update],
      watermark: String = "10 minutes"): Dataset[Enriched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged =
      probes.select(col("key"), col("ts"), lit(true).as("is_probe"),
        col("probe_id"), lit(0.0).as("value"))
        .unionByName(
          updates.select(col("key"), col("ts"), lit(false).as("is_probe"),
            lit(-1L).as("probe_id"), col("value")))
        .withWatermark("ts", watermark)
        .as[Tagged]
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(stateFn)
  }
}
