package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.PipelineConfig
import graft.decode.Decode
import graft.enrich.Enrich
import graft.route.Router
import graft.sink.{BulkSink, BulkTransport, DeadLetterSink, FileBulkTransport}

/** The end-to-end router pipeline (SURVEY.md §3.1), batch and streaming.
  *
  * decode (D1-D5) → route (P1-P6) → enrich (E2/E3) → ES bulk (K1/K2)
  *                                       ↘ failed / rejected → dead-letter (K3/K4)
  *
  * Shuffle-free by construction: every stage is per-row or per-partition,
  * so throughput scales linearly with input partitions — the property that
  * matters at 100 TB (reference scale unit: 1 Lambda per shard;
  * ours: 1 task per partition).
  */
object Pipeline {

  final case class BatchResult(pushed: Long, failed: Long, rejected: Long, dropped: Long)

  /** The declarative core: envelopes(data: BINARY) → routed + enriched. */
  def transform(envelopes: DataFrame, cfg: PipelineConfig, base64Data: Boolean = false): DataFrame = {
    val decoded =
      if (base64Data) Decode.normalizeBase64(envelopes) else Decode.normalize(envelopes)
    Enrich.withIndexName(Router.route(decoded, cfg), cfg)
  }

  /** One micro-batch, exactly the reference handler's stages
    * (lambda/main.py:68-172) minus its defects: single dead-letter flush
    * (F3), skip-if-empty (F4), idempotent `_id` (F5). */
  def runBatch(envelopes: DataFrame, cfg: PipelineConfig,
               transport: () => BulkTransport): BatchResult = {
    // Persist the routed batch: three consumers (route counts, dead-letter
    // write, bulk push) would otherwise each replay the full decode chain —
    // the per-record gunzip/KPL/from_json cost — three times.
    val routed = transform(envelopes, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val byRoute = routed.groupBy("route").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val good = Router.good(routed)
      val failed = Router.failed(routed)

      DeadLetterSink.writeFailed(failed, cfg, reason = "failed_validation")
      // Exactly ONE action drives the bulk send: the dead-letter write of
      // the reject stream. The count rides along in an accumulator — a
      // separate count() would re-send every chunk, and collecting rejects
      // to the driver is unbounded when rejection is systemic.
      val counter = envelopes.sparkSession.sparkContext.longAccumulator("bulk_rejects")
      val rejects = BulkSink.push(good, cfg, transport, Some(counter))
      DeadLetterSink.writeRejected(rejects.toDF(), cfg)
      val nRejected = counter.value.toLong

      val nGood = byRoute.filter(_._1 == Router.Route.Good).values.sum
      BatchResult(
        pushed = nGood - nRejected,
        failed = byRoute.filter(_._1.startsWith("failed:")).values.sum,
        rejected = nRejected,
        dropped = byRoute.filter(_._1.startsWith("dropped:")).values.sum)
    } finally routed.unpersist()
  }

  /** Structured Streaming form: micro-batched via foreachBatch like the
    * reference's one-invocation-per-batch model (SURVEY.md §2.6), with
    * checkpointed offsets (the Spark analog of the ESM shard iterator). */
  def stream(envelopes: DataFrame, cfg: PipelineConfig,
             transport: () => BulkTransport,
             checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        runBatch(batch, cfg, transport): Unit
      }
      .start()

  /** Convenience offline wiring: bulk bodies land as NDJSON files. */
  def fileTransport(dir: String): () => BulkTransport =
    () => new FileBulkTransport(dir)

  /** Production wiring: real `_bulk` POSTs (the reference's ES_HOST +
    * AWS4Auth client, lambda/main.py:47,52-58,76-84), 30 s timeout,
    * chunk-local retry. */
  def httpTransport(endpoint: String,
                    creds: Option[graft.sink.SigV4Credentials] = None): () => BulkTransport =
    () => new graft.sink.HttpBulkTransport(endpoint, creds = creds)

  /** Replay the driver's `events` parquet through the full pipeline:
    * events rows → JSON payloads (the canonical good-log shape,
    * FIXTURES.md §C) → envelope bytes → decode/route/enrich. Used by the
    * flagship entry and the golden tests; the oracle can compute the same
    * result relationally from the raw table. */
  def eventsAsEnvelopes(spark: SparkSession, sfDir: String): DataFrame = {
    // The single-file parquet arrives as one partition; decode is per-row
    // CPU work, so size the stage by cores (a real Kinesis source already
    // arrives partitioned by shard).
    val ev = graft.ops.Par.spread(Tables.events(spark, sfDir))
    envelopeFrom(ev,
      to_json(struct(
        col("event_type").as("log_type"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
        col("event_id").cast("string").as("log_id"),
        col("user_id"),
        col("value"),
        col("props"))).cast("binary"))
  }

  /** Wrap events rows as Kinesis-style envelopes with an arbitrary payload
    * expression (shared by the canonical replay and corrupted-slice test
    * replays). */
  def envelopeFrom(ev: DataFrame, data: org.apache.spark.sql.Column): DataFrame =
    ev.select(
      col("event_id").cast("string").as("partitionKey"),
      col("event_id").cast("string").as("sequenceNumber"),
      col("ts").as("approximateArrival"),
      data.as("data"))
}
