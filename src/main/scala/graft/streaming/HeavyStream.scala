package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming frequent-items monitoring with BOUNDED state: a Misra-Gries
  * summary (Misra & Gries 1982) of at most `k` counters per event-time
  * window, maintained by `flatMapGroupsWithState` — the streaming face of
  * the batch heavy-hitters family (`functions.MisraGries` +
  * `ops.HeavyHitters`). "Top talkers per window, live" is the canonical
  * ingest-skew panel (the hot key about to melt a shuffle partition is
  * exactly the one this surfaces); an exact streaming top-k holds state
  * proportional to the key cardinality itself, while this holds ≤ k
  * counters per window REGARDLESS of cardinality — the same
  * exact-below-k contract the KMV cardinality row publishes (below k
  * distinct keys the MG summary never decrements, so every counter IS
  * the exact count; above k each counter lower-bounds its key's true
  * frequency within n/k).
  *
  * Emission: the running top-`top` rows per ACTIVE group per micro-batch,
  * each carrying the group's running n_events. n_events is strictly
  * monotone per group, so the sink reader reduces to the final batch's
  * rows with a max-per-group join — and below k counters the final rows
  * are a pure function of the data, never of batch slicing (a counter
  * map's merge is order-free while no eviction fires). Groups are
  * evicted by event-time timeout once the watermark passes the window's
  * horizon: bounded state on an unbounded stream, state sharded across
  * executors by the window key. */
object HeavyStream {

  final case class Hit(day: Long, key: String, ts: Timestamp)
  final case class TopRow(day: Long, n_events: Long, rnk: Long,
                          key: String, n: Long)
  final case class MG(counters: Map[String, Long], nEvents: Long,
                      newestMs: Long)

  def topTalkers(hits: Dataset[Hit], k: Int = 4096, top: Int = 5,
                 watermark: String = "10 minutes",
                 horizonMs: Long = 86400000L): Dataset[TopRow] = {
    require(k >= 2 && top >= 1 && top <= k)
    implicit val outEnc = Encoders.product[TopRow]
    implicit val stEnc = Encoders.product[MG]
    implicit val keyEnc = Encoders.scalaLong

    hits
      .withWatermark("ts", watermark)
      .groupByKey(_.day)
      .flatMapGroupsWithState[MG, TopRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (day: Long, batch: Iterator[Hit], state: GroupState[MG]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(MG(Map.empty, 0L, Long.MinValue))
            val counters = scala.collection.mutable.Map.empty[String, Long]
            counters ++= st.counters
            var n = st.nEvents
            var newest = st.newestMs
            batch.foreach { h =>
              n += 1
              newest = math.max(newest, h.ts.getTime)
              counters.updateWith(h.key)(c => Some(c.getOrElse(0L) + 1L))
              if (counters.size > k) {
                // MG step: decrement ALL counters by the minimum and drop
                // non-positives — at least one key leaves, every survivor
                // keeps a lower bound within n/k of its true frequency
                val m = counters.valuesIterator.min
                counters.filterInPlace((_, c) => c > m)
                  .mapValuesInPlace((_, c) => c - m)
              }
            }
            state.update(MG(counters.toMap, n, newest))
            state.setTimeoutTimestamp(newest + horizonMs)
            counters.toSeq
              .sortBy { case (key, c) => (-c, key) }
              .take(top).iterator.zipWithIndex
              .map { case ((key, c), i) => TopRow(day, n, i + 1L, key, c) }
          }
      }
  }
}
