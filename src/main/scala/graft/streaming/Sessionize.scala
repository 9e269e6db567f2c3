package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state: gap-based session windows via
  * flatMapGroupsWithState — the operator tier below built-in windows
  * (session_window covers fixed gaps; this shows arbitrary per-key state
  * machines, the pattern for bespoke streaming semantics at scale).
  *
  * State per user is O(1) (current open session only) and is dropped by
  * event-time timeout once the watermark passes session end + gap — the
  * property that keeps the state store bounded on an unbounded stream.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)
  final case class OpenSession(start: Long, end: Long, n: Long)

  /** @param gapMs silence that closes a session */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed end+gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t >= s.start - gapMs && t - s.end <= gapMs =>
                  // late-but-above-watermark events within the gap of
                  // either session edge extend the session
                  open = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1))
                case Some(s) if t - s.end > gapMs =>
                  // silence after the session: close it, open a new one
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(_) =>
                  // more than a gap BEFORE the open session's start: an
                  // isolated older event — its own (already-closed) session
                  closed ::= Session(userId, new Timestamp(t), new Timestamp(t), 1)
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
