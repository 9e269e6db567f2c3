package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate filtering: banded-SimHash dedup with
  * `flatMapGroupsWithState`, the streaming counterpart of the batch
  * MinHash/SimHash dedup family — a training-data ingest that must drop
  * boilerplate copies AS DOCUMENTS ARRIVE rather than in a nightly batch
  * (the reference's pipeline shape — continuous Kinesis ingest, not
  * batch jobs — applied to the LLM-curation dedup step).
  *
  * Sharding: each document's 64-bit SimHash is cut into 4 bands of 16
  * bits; the stream is keyed by (band, band-value) so a bucket group only
  * ever sees documents that COLLIDE in that band — the standard LSH
  * candidate-generation contract (two docs within small Hamming distance
  * almost surely agree on ≥1 whole band; the miss probability is the
  * banding bound, identical to the batch `Dedup.simhashPairs` trade).
  * Per bucket the state is the (seq, sig) list of earlier documents in
  * that bucket; a document is flagged in a band iff some EARLIER (by
  * `seq`) document in the same bucket is within `maxHamming`. The final
  * per-document verdict — duplicate iff flagged in ANY band — is a
  * stateless aggregation of the 4 band verdicts, done by the reader of
  * the sink (the verdicts are per-(doc, band) rows in Append mode).
  *
  * Determinism under replay: verdicts depend only on (seq order, sigs),
  * never on batch boundaries — a doc's predecessors are exactly the docs
  * with smaller seq whether they arrived in this trigger or an earlier
  * one (batches are processed in seq order within the group). So a
  * restart or re-slice admits the identical subset, and the DuckDB
  * oracle can state the semantics relationally: dup(d) ⇔ ∃ s < d in the
  * same band-bucket with hamming(sig_s, sig_d) ≤ maxHamming.
  *
  * Bounded state on an unbounded stream: a bucket's sig list grows with
  * its occupancy WITHIN the event-time horizon — the group times out and
  * is removed once the watermark passes `horizonMs` beyond the bucket's
  * newest event (dedup "against the recent past", the only tractable
  * contract on an infinite stream; the batch near-dup clustering handles
  * the full-corpus case). At 100 TB-scale ingest the bucket count grows
  * with the band width (here 2^16 per band; widen the sig / add bands to
  * keep per-bucket occupancy bounded), and buckets shard across
  * executors by key — no global state, no broadcast. */
object NearDupStream {

  /** One (document, band) arrival: `bucket` = band*2^16 + band-value. */
  final case class BandedDoc(bucket: Long, seq: Long, doc_id: Long,
                             source: String, sig: Long, ts: Timestamp)
  /** Per-(document, band) verdict; reader aggregates dup = OR over bands. */
  final case class BandVerdict(doc_id: Long, source: String, dup: Boolean)
  final case class SigAt(seq: Long, sig: Long)
  final case class SeenSigs(sigs: List[SigAt], newestMs: Long)

  def verdicts(banded: Dataset[BandedDoc], maxHamming: Int,
               watermark: String = "10 minutes",
               horizonMs: Long = 86400000L): Dataset[BandVerdict] = {
    implicit val outEnc = Encoders.product[BandVerdict]
    implicit val stEnc = Encoders.product[SeenSigs]
    implicit val keyEnc = Encoders.scalaLong

    banded
      .withWatermark("ts", watermark)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[SeenSigs, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, batch: Iterator[BandedDoc], state: GroupState[SeenSigs]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // seq order makes "earlier" batch-boundary-independent
            val sorted = batch.toSeq.sortBy(_.seq)
            var seen = state.getOption.map(_.sigs).getOrElse(Nil)
            var newest = state.getOption.map(_.newestMs).getOrElse(Long.MinValue)
            val out = sorted.map { d =>
              val dup = seen.exists(s =>
                java.lang.Long.bitCount(s.sig ^ d.sig) <= maxHamming)
              seen = SigAt(d.seq, d.sig) :: seen
              newest = math.max(newest, d.ts.getTime)
              BandVerdict(d.doc_id, d.source, dup)
            }
            state.update(SeenSigs(seen, newest))
            // evict the bucket once the watermark passes its horizon —
            // the bounded-state contract (dedup against the recent past)
            state.setTimeoutTimestamp(newest + horizonMs)
            out.iterator
          }
      }
  }
}
