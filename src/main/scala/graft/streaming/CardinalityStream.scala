package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-cardinality monitoring with BOUNDED state: a KMV
  * (k minimum values) sketch of md5 user hashes per (key, event-time
  * window), maintained by `flatMapGroupsWithState` — the streaming face
  * of the batch scale-aware uniqueness gate (`Checks.uniquenessFor`) and
  * the KMV profile/overlap family. "How many distinct users per type per
  * day, live" is the canonical ingest-health panel; an exact streaming
  * `count(DISTINCT)` holds per-window state proportional to the
  * cardinality itself, while this holds ≤ k hashes per window REGARDLESS
  * of cardinality — the same exact-below-k / estimate-above-k contract
  * the batch sketches publish (below k the sorted-set size IS the exact
  * distinct count; above k the (k−1)/h_k estimator takes over).
  *
  * Emission: one row per ACTIVE group per micro-batch carrying the
  * running (n_events, estimate). n_events is strictly monotone per
  * group, so the sink reader reduces to the final row with a
  * `max_by(est, n_events)` — and since a set union is order-free, the
  * final row is a pure function of the data, never of batch slicing.
  * Groups are evicted by event-time timeout once the watermark passes
  * the window's horizon: bounded state on an unbounded stream. */
object CardinalityStream {

  final case class Hit(key: String, day: Long, uhash: String, ts: Timestamp)
  final case class Estimate(key: String, day: Long, n_events: Long,
                            n_users_est: Long)
  final case class Kmv(hashes: List[String], nEvents: Long, newestMs: Long)

  def estimates(hits: Dataset[Hit], k: Int = 4096,
                watermark: String = "10 minutes",
                horizonMs: Long = 86400000L): Dataset[Estimate] = {
    require(k >= 16)
    implicit val outEnc = Encoders.product[Estimate]
    implicit val stEnc = Encoders.product[Kmv]
    implicit val keyEnc = Encoders.product[(String, Long)]

    hits
      .withWatermark("ts", watermark)
      .groupByKey(h => (h.key, h.day))
      .flatMapGroupsWithState[Kmv, Estimate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, Long), batch: Iterator[Hit], state: GroupState[Kmv]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(Kmv(Nil, 0L, Long.MinValue))
            var set = scala.collection.immutable.SortedSet.empty[String] ++ st.hashes
            var n = st.nEvents
            var newest = st.newestMs
            batch.foreach { h =>
              n += 1
              newest = math.max(newest, h.ts.getTime)
              if (!set.contains(h.uhash)) {
                set += h.uhash
                if (set.size > k) set -= set.last // keep the k SMALLEST
              }
            }
            state.update(Kmv(set.toList, n, newest))
            state.setTimeoutTimestamp(newest + horizonMs)
            // exact below k; above k the classic KMV estimate from the
            // k-th smallest hash, mapped into [0,1) from the first 15 hex
            // digits (60 bits — far below the 128-bit hash, so the
            // truncation is measurement precision, not bias)
            val est =
              if (set.size < k) set.size.toLong
              else {
                val hk = java.lang.Long.parseLong(set.last.take(15), 16)
                  .toDouble / (1L << 60).toDouble
                math.round((k - 1).toDouble / hk)
              }
            Iterator.single(Estimate(key._1, key._2, n, est))
          }
      }
  }
}
