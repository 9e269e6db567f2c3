package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key event-time quota enforcement (token bucket over fixed
  * windows): admit at most `quota` events per key per window, flag the
  * rest — the ingestion-protection / fairness primitive in front of an
  * expensive sink (the reference's ES bulk endpoint throttles exactly
  * this way server-side; enforcing client-side keeps a hot key from
  * starving the batch, cf. the 500-action chunk cap at
  * `/root/reference/lambda/main.py:132`).
  *
  * Decisions are DETERMINISTIC under replay: events are ordered by
  * (event time, id) within each batch and counted against the key's
  * current event-time window, so a re-run admits the identical subset —
  * the same idempotency discipline as the P6 log-id dedup.
  *
  * State per key is O(1) — (window start, count) — and is dropped by
  * event-time timeout once the watermark passes the window end: bounded
  * state on an unbounded stream, like [[Sessionize]]. Late events from
  * windows older than the tracked one (admitted: their budget is
  * unknowable once state moved on — fail-open keeps the channel
  * at-least-quota rather than silently lossy) do not disturb the
  * current window's count.
  */
object RateLimit {

  final case class Keyed(key: String, ts: Timestamp, id: String)
  final case class Decision(key: String, ts: Timestamp, id: String,
                            admitted: Boolean, window_start: Timestamp)
  final case class Bucket(windowStart: Long, count: Long)

  def admit(events: Dataset[Keyed], quota: Int, windowMs: Long,
            watermark: String = "10 minutes"): Dataset[Decision] = {
    require(quota >= 1 && windowMs >= 1000L)
    implicit val decisionEnc = Encoders.product[Decision]
    implicit val bucketEnc = Encoders.product[Bucket]
    implicit val keyEnc = Encoders.STRING

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Bucket, Decision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, batch: Iterator[Keyed], state: GroupState[Bucket]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.id))
            var st = state.getOption
            val out = sorted.map { e =>
              val w = math.floorDiv(e.ts.getTime, windowMs) * windowMs
              st match {
                case Some(b) if w == b.windowStart =>
                  st = Some(b.copy(count = b.count + 1))
                  Decision(key, e.ts, e.id, b.count < quota, new Timestamp(w))
                case Some(b) if w < b.windowStart =>
                  // stale-window straggler: fail open, leave state alone
                  Decision(key, e.ts, e.id, admitted = true, new Timestamp(w))
                case _ =>
                  // first event of a new (or first) window
                  st = Some(Bucket(w, 1))
                  Decision(key, e.ts, e.id, admitted = true, new Timestamp(w))
              }
            }
            st.foreach { b =>
              state.update(b)
              state.setTimeoutTimestamp(b.windowStart + windowMs)
            }
            out.iterator
          }
      }
  }
}
