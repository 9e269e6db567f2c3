package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.Pipeline
import graft.config.PipelineConfig
import graft.route.Router
import graft.sink.BulkTransport

/** Structured Streaming surface of the router engine (SURVEY.md §2.6).
  *
  * The reference's unit of streaming is one Lambda invocation per ≤batch
  * Kinesis records (at-least-once, stateless). Here:
  *   - micro-batches come from any streaming source carrying the envelope
  *     schema (file replay below; a Kinesis DSv2 connector drops in
  *     unchanged — the transform is source-agnostic);
  *   - offsets checkpoint like the ESM shard iterator;
  *   - delivery is at-least-once into the bulk sink, made effectively-once
  *     by `_id = log_id` (F5 fix), and optionally exactly-once inside the
  *     engine via [[dedupWithinWatermark]] keyed state.
  */
object StreamingPipeline {

  /** File-replay streaming source: the events table as a stream of Kinesis
    * envelope rows (the zero-egress stand-in for the Kinesis source, same
    * contract as Pipeline.eventsAsEnvelopes). Streaming file sources need
    * the schema up front, and the fixture's `ts` encoding has varied
    * (TIMESTAMP(NANOS)-as-long vs TIMESTAMP(MICROS) — Tables.scala), so we
    * probe the file's batch-read schema once (a footer read) and reuse it,
    * then normalize `ts` with the same shared rule as the batch reader. */
  def eventsReplayStream(spark: SparkSession, sfDir: String,
                         maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = graft.Tables.normalizeTs(spark.readStream
      .schema(fileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      // file sources want a directory; glob-select the events table from it
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
    raw.select(
      col("event_id").cast("string").as("partitionKey"),
      col("event_id").cast("string").as("sequenceNumber"),
      col("ts").as("approximateArrival"),
      to_json(struct(
        col("event_type").as("log_type"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
        col("event_id").cast("string").as("log_id"),
        col("user_id"), col("value"), col("props"))).cast("binary").as("data"))
  }

  /** Kinesis-shaped streaming source via the DSv2 shim ([[KinesisShimProvider]]):
    * N shards, per-shard ordering, ESM batch_size admission control, and
    * startingPosition — all mapped from [[PipelineConfig]] the way the
    * reference maps its Terraform vars into the event source mapping
    * (reference main.tf:58-64). */
  def kinesisShimStream(spark: SparkSession, sfDir: String,
                        cfg: PipelineConfig = PipelineConfig()): DataFrame =
    spark.readStream.format("graft.streaming.KinesisShimProvider")
      // the key-sorted re-layout (when it applies) is what lets the shim's
      // executor-side readers seek: event-id range predicates skip whole
      // files/row groups on footer stats instead of rescanning the corpus
      .option("events", graft.Tables.eventsDataPath(spark, sfDir))
      .option("nShards", cfg.sourceShards)
      .option("batchSize", cfg.sourceBatchSize)
      .option("startingPosition", cfg.startingPosition)
      .load()

  /** The parity pipeline as one streaming query: decode→route→enrich run
    * incrementally (all per-row — no state), sinks applied per micro-batch
    * in foreachBatch (the reference's invocation boundary). */
  def run(envelopes: DataFrame, cfg: PipelineConfig, transport: () => BulkTransport,
          checkpointDir: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Pipeline.stream(envelopes, cfg, transport, checkpointDir, trigger)

  /** Switch stateful streaming to the RocksDB state store provider. The
    * default HDFS-backed provider keeps every key in executor heap — at
    * 100 TB-scale key cardinality (dedup over billions of log_ids) that is
    * an OOM, not a tuning problem. RocksDB spills state to local disk with
    * changelog checkpointing and bounds heap by block cache. Call once on
    * the session before starting stateful queries (provider is read at
    * query start from session conf; in-flight queries keep theirs). */
  def useRocksDbStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // changelog checkpointing ships deltas, not full SST files, per batch
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Engine-side exactly-once: keyed dedup state with a TTL bounded by the
    * event-time watermark. At 100 TB the watermark bound is what keeps the
    * state store finite — an unbounded dropDuplicates would grow forever.
    * Input: streaming envelope DF; output: streaming good-channel rows. */
  def dedupWithinWatermark(envelopes: DataFrame, cfg: PipelineConfig,
                           watermark: String = "1 hour"): DataFrame = {
    val routed = Pipeline.transform(envelopes, cfg)
    Router.good(routed)
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("log_id")
  }

  /** Stream-static enrichment: join the good channel against a static
    * dimension table (broadcast — the stream is never shuffled; the dim
    * re-resolves per micro-batch, so slowly-changing dims pick up
    * updates). The streaming analog of the reference's whitelist-set
    * membership, generalized to arbitrary dimension attributes. */
  def enrichWithDimension(envelopes: DataFrame, cfg: PipelineConfig,
                          dim: DataFrame, streamKey: String,
                          dimKey: String): DataFrame = {
    val good = Router.good(Pipeline.transform(envelopes, cfg))
    good.join(org.apache.spark.sql.functions.broadcast(dim),
      col(streamKey) === col(dimKey), "left")
  }

  /** Stream-stream correlation: events of `typeA` joined to events of
    * `typeB` with the same payload key within `within` event time — the
    * funnel/attribution primitive (click→purchase). Both sides carry
    * watermarks so Spark bounds the join state buffers; the time-range
    * predicate lets it evict rows as the watermark advances. */
  def correlateTypes(envelopes: DataFrame, cfg: PipelineConfig,
                     typeA: String, typeB: String, keyJsonPath: String,
                     within: String = "1 hour",
                     joinType: String = "inner"): DataFrame = {
    val good = Router.good(Pipeline.transform(envelopes, cfg))
      .select(col("log_type"), col("event_ts"), col("log_id"),
        get_json_object(col("payload"), keyJsonPath).as("ckey"))
    val a = good.filter(col("log_type") === typeA)
      .withWatermark("event_ts", within)
      .select(col("ckey").as("key_a"), col("event_ts").as("ts_a"), col("log_id").as("id_a"))
    val b = good.filter(col("log_type") === typeB)
      .withWatermark("event_ts", within)
      .select(col("ckey").as("key_b"), col("event_ts").as("ts_b"), col("log_id").as("id_b"))
    // left_outer adds the NEGATIVE funnel signal: an A row with no B
    // inside the window is emitted with null B columns — but only once
    // the watermark proves no matching B can still arrive, which is the
    // same state-eviction bound that keeps the join buffers finite.
    a.join(b,
      col("key_a") === col("key_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $within"),
      joinType)
  }

  /** Streaming frequent-value monitor per (event-time window, log_type):
    * the bounded Misra-Gries summary as a watermarked windowed
    * aggregation. Per-window state is ≤ k counters no matter the value
    * cardinality — the property that keeps the state store finite where a
    * naive per-value count would grow with the vocabulary — and windows
    * are evicted as the watermark passes. Candidates are ordered by
    * estimated count; if exact frequencies are needed, recount a closed
    * window exactly (the [[graft.ops.HeavyHitters]] two-phase rule). */
  def frequentValuesPerWindow(envelopes: DataFrame, cfg: PipelineConfig,
                              jsonPath: String, k: Int = 64,
                              windowLen: String = "1 hour",
                              watermark: String = "1 hour"): DataFrame = {
    val good = Router.good(Pipeline.transform(envelopes, cfg))
    good
      .select(col("event_ts"), col("log_type"),
        get_json_object(col("payload"), jsonPath).as("v"))
      .filter(col("v").isNotNull)
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen), col("log_type"))
      .agg(graft.functions.MisraGries.mg_candidates(col("v"), k).as("candidates"))
  }

  /** Streaming daily rollup per (log_type, day window): the E2 index
    * fan-out as a watermarked windowed aggregation — late data beyond the
    * watermark is dropped, per-key state is bounded. */
  def dailyIndexCounts(envelopes: DataFrame, cfg: PipelineConfig,
                       watermark: String = "1 day"): DataFrame = {
    val routed = Pipeline.transform(envelopes, cfg)
    Router.good(routed)
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), "1 day"), col("log_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        concat_ws("-", lit(cfg.indexNamePrefix), col("log_type"),
          date_format(col("window.start"), "yyyyMMdd")).as("index_name"),
        col("n"))
  }
}
