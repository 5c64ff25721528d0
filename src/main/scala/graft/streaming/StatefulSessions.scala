package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization — the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` seam of §2.9.
  *
  * `session_window` (q18, `EventWindowsSpec`) covers declarative gap
  * sessions; this operator exists for the session payloads the built-in
  * aggregation can't express: event count, value sum, first/last event
  * type and duration per session, emitted once per CLOSED session.
  *
  * Two twins with identical semantics:
  *  - [[sessionize]]: the streaming operator. Per-user state is one open
  *    session (constant size); a session closes either when a later
  *    event arrives past the gap, or when the event-time timeout fires
  *    (watermark passed last-event + gap). State volume is
  *    O(active users), not O(events) — the 100 TB-stream shape.
  *  - [[sessionizeBatch]]: the window-function formulation
  *    (lag → gap marker → running sum = session id), all codegen'd
  *    Column expressions, SQL-expressible — the DuckDB-oracle twin
  *    (`q31_sessionize`).
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  case class OpenSession(
      startUs: Long, lastUs: Long, n: Long, sum: Double,
      firstType: String, lastType: String)

  case class Session(
      user_id: Long, start_us: Long, end_us: Long, n: Long,
      value_sum: Double, first_type: String, last_type: String)

  private def toSession(uid: Long, s: OpenSession): Session =
    Session(uid, s.startUs, s.lastUs, s.n, s.sum, s.firstType, s.lastType)

  private def usOf(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000

  /** Merge two gap-adjacent (or overlapping) sessions — exact aggregate
    * combination, boundary types resolved by the batch twin's
    * `(ts, event_type)` ordering. */
  private def combine(a: OpenSession, b: OpenSession): OpenSession = {
    val firstType =
      if (a.startUs < b.startUs ||
        (a.startUs == b.startUs && a.firstType <= b.firstType)) a.firstType
      else b.firstType
    val lastType =
      if (a.lastUs > b.lastUs ||
        (a.lastUs == b.lastUs && a.lastType >= b.lastType)) a.lastType
      else b.lastType
    OpenSession(math.min(a.startUs, b.startUs), math.max(a.lastUs, b.lastUs),
      a.n + b.n, a.sum + b.sum, firstType, lastType)
  }

  /** The per-key state function. The batch's events (sorted by event
    * time) are first folded into gap-separated sessions among
    * themselves; the open session carried in state is then merged into
    * that sorted timeline, so a late event arriving BEFORE the open
    * session (cross-micro-batch disorder within the watermark) extends
    * it backward — startUs/firstType adjust — or forms its own earlier
    * session, exactly as `sessionizeBatch` would assign it. All
    * sessions but the last close and emit; the last stays open with an
    * event-time timeout at last + gap (fires once the watermark passes
    * it). Residual divergence from the batch twin: an event whose
    * session was ALREADY emitted in a prior trigger can't reopen it
    * (append-mode streaming has no retraction); the watermark bounds
    * how late such an event can be. */
  private def stateFn(gapMs: Long)(
      uid: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = toSession(uid, state.get)
      state.remove()
      Iterator.single(out)
    } else {
      val gapUs = gapMs * 1000
      val sorted = events.toArray.sortBy(e => (usOf(e.ts), e.event_type))
      // 1. Sessionize the batch's own events (sorted, so a linear fold).
      val batchSessions = ArrayBuffer.empty[OpenSession]
      for (e <- sorted) {
        val us = usOf(e.ts)
        val one = OpenSession(us, us, 1, e.value, e.event_type, e.event_type)
        if (batchSessions.nonEmpty && us - batchSessions.last.lastUs <= gapUs)
          batchSessions(batchSessions.length - 1) = combine(batchSessions.last, one)
        else batchSessions += one
      }
      // 2. Insert the state session into start-order, then sweep-merge
      //    gap-adjacent neighbors (the state span may bridge several).
      state.getOption.foreach { s =>
        val at = batchSessions.indexWhere(_.startUs > s.startUs) match {
          case -1 => batchSessions.length
          case i => i
        }
        batchSessions.insert(at, s)
      }
      val merged = ArrayBuffer.empty[OpenSession]
      for (s <- batchSessions) {
        if (merged.nonEmpty && s.startUs - merged.last.lastUs <= gapUs)
          merged(merged.length - 1) = combine(merged.last, s)
        else merged += s
      }
      // 3. Close everything but the still-growing tail session.
      if (merged.isEmpty) Iterator.empty
      else {
        val open = merged.remove(merged.length - 1)
        state.update(open)
        // close when the watermark passes the gap after the last event
        state.setTimeoutTimestamp(open.lastUs / 1000 + gapMs)
        merged.iterator.map(toSession(uid, _))
      }
    }
  }

  /** Streaming gap-sessionization. Emits each session exactly once, when
    * it closes (Append mode). `events` must carry a watermark on `ts`. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(gapSeconds * 1000L))
  }

  /** Batch twin: lag → new-session marker → running count = session id,
    * then one hash aggregation. Shuffles once on `user_id`; every
    * expression is codegen'd. Input needs
    * `(user_id, ts, event_type, value)`; ties broken on `event_type` so
    * the fold order is deterministic. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_type"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_type"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n"),
        cast_sum(col("value")).as("value_sum"),
        min_by(col("event_type"), struct(col("ts"), col("event_type"))).as("first_type"),
        max_by(col("event_type"), struct(col("ts"), col("event_type"))).as("last_type"))
      .drop("sess_id")
  }

  /** Decimal-exact double sum (shuffle-order independent — the oracle
    * parity rule used across the query pack). */
  private def cast_sum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")
}
