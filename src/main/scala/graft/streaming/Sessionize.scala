package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator: user sessionization with an
  * inactivity gap, via `flatMapGroupsWithState` (SURVEY.md §2.9 — the
  * reference has no streaming; this is part of the engine's
  * streaming-native surface, the canonical "state Spark can't express
  * with windows" example).
  *
  * State is one open session per user (bounded: O(active users)); an
  * event-time timeout fires once the watermark passes the session's
  * gap deadline, emitting the final session and freeing the state —
  * the 100 TB requirement is exactly this bounded-state + watermark
  * discipline.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Fold sorted event times into closed sessions + the trailing open
    * one. Pure — shared by the streaming operator and its tests. */
  private[streaming] def fold(
      events: Seq[(Long, Double)], gapMs: Long,
      open: Option[OpenSession]): (Seq[OpenSession], Option[OpenSession]) =
    events.foldLeft((Vector.empty[OpenSession], open)) {
      case ((closed, None), (t, v)) =>
        (closed, Some(OpenSession(t, t, 1, v)))
      case ((closed, Some(s)), (t, v)) =>
        if (t - s.lastMs <= gapMs)
          // Late-but-within-watermark events (t < lastMs) must not
          // regress the session bounds: end is max(ts), start min(ts),
          // matching the batch EventOps.sessionize aggregation.
          (closed, Some(s.copy(
            startMs = math.min(s.startMs, t),
            lastMs = math.max(s.lastMs, t),
            n = s.n + 1, total = s.total + v)))
        else
          (closed :+ s, Some(OpenSession(t, t, 1, v)))
    }

  private def emit(userId: Long, s: OpenSession): Session =
    Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.total)

  /** Sessionize an event stream (or batch Dataset — same code runs in
    * both modes; batch treats each group as one invocation with no
    * timeout). Call with a watermark already applied when streaming. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed the gap deadline: close the open session.
            val out = state.getOption.map(emit(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.map(e => (e.ts.getTime, e.value)).toVector.sortBy(_._1)
            val (closed, open) = fold(sorted, gapMs, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastMs + gapMs)
              case None => state.remove()
            }
            closed.map(emit(userId, _)).iterator
          }
      }
  }
}
