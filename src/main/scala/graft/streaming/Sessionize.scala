package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom stateful sessionization via typed
 * `KeyValueGroupedDataset.flatMapGroupsWithState` — the arbitrary-state API
 * for semantics `session_window` can't express (here: per-session running
 * aggregates emitted exactly when the session CLOSES, with event-time
 * timeouts driven by the watermark).
 *
 * State per user = the open session; a batch's events fold into it in
 * event-time order; sessions older than `gapMs` close and emit. A session
 * with no new events closes via EventTimeTimeout when the watermark passes
 * last-event + gap — so state is bounded by the watermark, the property
 * that keeps this runnable forever on an unbounded stream.
 */
object Sessionize {
  // key is String so any atomic key type sessionizes (the transform casts
  // in and back out); a long-only key crashed on string user ids
  final case class Event(user_id: String, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)
  final case class Session(
      user_id: String, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: String, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed last-event + gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s, gapMs))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            // accumulator for late-but-admitted events older than the open
            // session by more than the gap: they can never rejoin it, but
            // consecutive ones within `gap` of EACH OTHER are one session
            // under the batch gaps-and-islands semantics — emitting each as
            // a singleton would be a batch/streaming divergence. Sorted
            // order makes too-old events a prefix (extending the open
            // session back only lowers the threshold), so a single running
            // accumulator suffices.
            var tooOld: Option[OpenSession] = None
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t < s.startMs - gapMs =>
                  // OLDER than the open session by more than the gap: can
                  // never belong to it (its nearest member is >= gap away)
                  // — swallowing it would emit one session spanning a
                  // silent hole wider than the gap. Merge with the running
                  // too-old session if within gap, else close that one and
                  // start another.
                  tooOld match {
                    case Some(o) if t <= o.lastMs + gapMs =>
                      tooOld = Some(o.copy(lastMs = t, n = o.n + 1,
                        total = o.total + e.value))
                    case Some(o) =>
                      closed += emit(userId, o, gapMs)
                      tooOld = Some(OpenSession(t, t, 1, e.value))
                    case None =>
                      tooOld = Some(OpenSession(t, t, 1, e.value))
                  }
                case Some(s) if t <= s.lastMs + gapMs =>
                  // a late-but-admitted event may predate the open
                  // session's start (within the gap) — extend the start
                  // back so the emitted session actually covers it
                  open = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) => // gap exceeded inside the batch: close, start new
                  closed += emit(userId, s, gapMs)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            // the too-old run was classified against the open session's
            // start AT THE TIME — but a later late-but-admitted event can
            // extend that start backwards to within `gap` of the run
            // (gap=10m, open start 12:00, batch [11:49, 11:56]: 11:49 is
            // too-old against 11:50, then 11:56 pulls the start to 11:56,
            // 11:49 + gap >= 11:56). Batch gaps-and-islands semantics see
            // ONE session there; emitting the run as its own closed
            // session would overlap the still-open one. Re-check against
            // the FINAL start and merge when reconnected (sorted order
            // makes the run strictly older, so it extends the start).
            val stillOld = (tooOld, open) match {
              case (Some(o), Some(s)) if o.lastMs + gapMs >= s.startMs =>
                open = Some(s.copy(startMs = math.min(o.startMs, s.startMs),
                  n = s.n + o.n, total = s.total + o.total))
                None
              case _ => tooOld
            }
            stillOld.foreach(o => closed += emit(userId, o, gapMs))
            open.foreach { s =>
              state.update(s)
              // floor at watermark + 1: Spark filters late rows against
              // the PREVIOUS batch's watermark but validates timeout
              // timestamps against the CURRENT one, so a late-but-admitted
              // batch could otherwise request a timeout in the past and
              // kill the query with IllegalArgumentException; the floored
              // session closes on the next watermark advance instead
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  private def emit(userId: String, s: OpenSession, gapMs: Long): Session =
    Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs), s.n, s.total)
}
