package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Pipeline
import graft.config.PipelineConfig
import graft.enrich.Enrich
import graft.functions.GraftFunctions.gzip_compress
import graft.route.Router

/** Oracle-checked queries that push the driver's `events` table through the
  * REAL pipeline (decode → route → enrich) and compare against a relational
  * oracle computed directly on the raw table (SURVEY.md §5.2.4).
  *
  * Each `(name -> query)` has a matching DuckDB SQL in [[sql]]; column
  * names/aliases line up exactly (the driver hashes by sorted column name).
  */
object PipelineQueries {

  private val cfg = PipelineConfig() // prefix "logs", UTC, no whitelist

  private def events(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)

  /** events → JSON envelope bytes, optionally gzipped (exercises D3 against
    * the same oracle — the oracle doesn't care how bytes were wrapped). */
  /** Write `ev` as `n` single-file parquet slices in STRICT (ts, event_id)
    * order, file names pinning the trigger sequence — the deterministic
    * micro-batch feed shared by the stateful streaming rows (ordered
    * batches → watermarks never drop a record, keyed windows never
    * regress). Returns the source directory for `readStream.parquet`. */
  // 3 slices = 3 data triggers (+ the watermark-advancing no-data batch):
  // enough to exercise every cross-batch state transition (state created
  // in batch 0 is read in 1 and 2), while each AvailableNow trigger costs
  // a fixed ~1s of micro-batch planning + state-store commit machinery —
  // the stream rows' measured cost floor (README bench notes). Rows whose
  // SEMANTICS are per-batch (late-drop's 4 arrival buckets, restart's
  // stop point) pin their own counts instead.
  private def orderedSlices(ev: DataFrame, tmp: java.nio.file.Path,
                            n: Int = 3): String = {
    val total = ev.count()
    val sliced = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
      .withColumn("bucket", ((col("rn") - 1) * n / total).cast("int"))
      .drop("rn")
    writeSlices(sliced, tmp, n)
  }

  /** Write a bucket-tagged frame as one single-file parquet slice per
    * bucket, file names pinning the trigger sequence (bucket i = trigger
    * i). The mechanical half of [[orderedSlices]], reused by rows that
    * assign buckets by time rather than rank. */
  private def writeSlices(withBucket: DataFrame, tmp: java.nio.file.Path,
                          n: Int): String = {
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
    // materialize the bucketed feed ONCE: the n per-bucket writes below are
    // separate jobs, and without this each re-runs the feed's lineage —
    // for the rank-sliced rows that is n global window sorts per feed
    val bucketed = withBucket.localCheckpoint(eager = true)
    for (i <- 0 until n) {
      val part = tmp.resolve(s"w$i")
      bucketed.filter(col("bucket") === i).drop("bucket")
        .coalesce(1).write.parquet(part.toString)
      val f = new java.io.File(part.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath, src.resolve(f"part-$i%04d.parquet"))
    }
    src.toString
  }

  /** Temp root for the streaming rows' feeds / checkpoints / sinks: tmpfs
    * (/dev/shm) when the machine offers it. The stream rows' fixed cost
    * floor is the state-store + offset-log fsync per micro-batch commit —
    * on tmpfs an fsync is a memory barrier, not a disk wait. Semantics
    * are unchanged (same triggers, same commit protocol); production
    * checkpoints belong on durable storage, a bench fixture's do not.
    * Dirs are deleted on JVM exit so repeated runs don't accumulate RAM. */
  private def streamTmp(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir =
      if (java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createTempDirectory(shm, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir
  }

  /** Stream FEEDS are pure deterministic functions of the fixture tables —
    * cache each per (name, sfDir) for the JVM's lifetime so repeated bench
    * samples measure the streaming operator, not fixture scaffolding
    * rebuilt per run. Checkpoints, sinks and state dirs are NEVER cached:
    * every invocation streams fresh from offset zero. */
  private val feedCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cachedFeed(name: String, dir: String)
                        (build: java.nio.file.Path => String): String =
    feedCache.getOrElseUpdate(s"$name@$dir", build(streamTmp(s"graft-feed-$name")))

  /** The click/purchase two-arm feed shared by `pipe_stream_join` and
    * `pipe_stream_outer_join` — ONE builder behind the one cache key, so
    * the queries can never diverge while silently serving each other a
    * stale feed (advisor finding, round 7: two hand-kept copies of the
    * builder shared the key on the assumption they stay byte-identical). */
  private def joinArmsFeed(s: SparkSession, dir: String): String =
    cachedFeed("join-arms", dir)(f =>
      orderedSlices(graft.Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts")), f))

  /** Run `body` with a reduced shuffle-partition count. Streaming state
    * stores commit one checkpoint per shuffle partition per micro-batch —
    * at 32 partitions × 4 batches that fixed cost dwarfs the data work at
    * test scale. 8 partitions is plenty for these corpora; a production
    * stream sizes this to its key cardinality instead. (Measured: dropping
    * further to 2 moves the six stream rows < ±10% each and the total not
    * at all — below 8 the cost is micro-batch planning, not store commits.) */
  private def withFewShufflePartitions[T](s: SparkSession, n: Int = 8)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  private def envelopes(s: SparkSession, dir: String, gz: Boolean = false): DataFrame = {
    val env = Pipeline.eventsAsEnvelopes(s, dir)
    if (gz) env.withColumn("data", gzip_compress(col("data"))) else env
  }

  /** Deterministically corrupt a slice of the replay, derived from event_id
    * (NOT synthesized data — a pure transform of the driver table):
    * id%10==7 → drop log_type; id%10==8 → unparseable time;
    * id%10==9 → not JSON at all. */
  private def badmixEnvelopes(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.ops.Par.spread(events(s, dir))
    val m = col("event_id") % 10
    Pipeline.envelopeFrom(ev,
      when(m === 9, lit("definitely not json"))
        .otherwise(to_json(struct(
          when(m === 7, lit(null).cast("string")).otherwise(col("event_type")).as("log_type"),
          when(m === 8, lit("never oclock")).otherwise(
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")).as("time"),
          col("event_id").cast("string").as("log_id"),
          col("user_id"), col("value"))))
        .cast("binary"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: full pipeline, daily-index fan-out counts (D1-D5,P1-P6,E2)
    "pipe_index_counts" -> ((s, dir) =>
      Router.good(Pipeline.transform(envelopes(s, dir), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")),

    // Same, but every payload gzip-compressed first (D3 vs the same oracle)
    "pipe_index_counts_gzip" -> ((s, dir) =>
      Router.good(Pipeline.transform(envelopes(s, dir, gz = true), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")),

    // P1/P2: corrupt-slice routing totality through the real router
    "pipe_route_badmix" -> ((s, dir) =>
      Pipeline.transform(badmixEnvelopes(s, dir), cfg)
        .groupBy("route").agg(count(lit(1)).as("n"))
        .orderBy("route")),

    // D1: the replay in Kinesis wire format — data as base64 TEXT (the
    // shape the event source mapping hands the Lambda, README.md:9) —
    // must decode to the same index fan-out
    "pipe_base64_envelopes" -> ((s, dir) => {
      val env = envelopes(s, dir)
        .withColumn("data", base64(col("data"))) // binary → wire text
      Router.good(Pipeline.transform(env, cfg, base64Data = true))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // D2: the replay packed into KPL aggregates (4 user records each) —
    // the deaggregating decode path must recover every record, so the
    // oracle is the plain per-index count
    "pipe_kpl_aggregates" -> ((s, dir) => {
      val ev = events(s, dir)
      val aggs = ev
        .withColumn("grp", expr("event_id div 4"))
        .groupBy("grp")
        .agg(
          collect_list(to_json(struct(
            col("event_type").as("log_type"),
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
            col("event_id").cast("string").as("log_id"),
            col("user_id"), col("value"))).cast("binary")).as("payloads"),
          min("ts").as("ts0"))
        .select(
          col("grp").cast("string").as("partitionKey"),
          col("grp").cast("string").as("sequenceNumber"),
          col("ts0").as("approximateArrival"),
          graft.functions.GraftFunctions.kpl_aggregate(col("payloads")).as("data"))
      Router.good(Pipeline.transform(graft.ops.Par.spread(aggs), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // D4: the replay packed into CloudWatch-Logs subscription bundles
    // (5 events per bundle, gzipped like real CWL delivery); every 10th
    // bundle is a CONTROL_MESSAGE whose events must vanish. The oracle
    // reproduces the surviving set relationally.
    "pipe_cwl_bundles" -> ((s, dir) => {
      val ev = events(s, dir)
      val bundles = ev
        .withColumn("bundle", expr("event_id div 5"))
        .groupBy("bundle")
        .agg(
          collect_list(struct(
            col("event_id").cast("string").as("id"),
            // integer epoch millis — `/` is true division and would emit a
            // double JSON number the LongType decode schema nulls out
            (unix_micros(col("ts")) / 1000).cast("long").as("timestamp"),
            to_json(struct(
              col("event_type").as("log_type"),
              date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
              col("event_id").cast("string").as("log_id"),
              col("user_id"), col("value"))).as("message"))).as("logEvents"),
          min("ts").as("ts0"))
        .select(
          col("bundle").cast("string").as("partitionKey"),
          col("bundle").cast("string").as("sequenceNumber"),
          col("ts0").as("approximateArrival"),
          gzip_compress(to_json(struct(
            when(col("bundle") % 10 === 3, "CONTROL_MESSAGE")
              .otherwise("DATA_MESSAGE").as("messageType"),
            lit("000000000000").as("owner"),
            lit("/graft/replay").as("logGroup"),
            lit("stream0").as("logStream"),
            array().cast("array<string>").as("subscriptionFilters"),
            col("logEvents"))).cast("binary")).as("data"))
      Router.good(Pipeline.transform(graft.ops.Par.spread(bundles), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // P3 tail: the same replay with day-name time formats dateutil accepts
    // (RFC-1123 / asctime / date(1), rotating by event_id) — every record
    // must still route GOOD with the same daily-index fan-out as the ISO
    // replay (the oracle never sees the formatting)
    "pipe_rfc_timestamps" -> ((s, dir) => {
      val ev = graft.ops.Par.spread(events(s, dir))
      val m = col("event_id") % 3
      val env = Pipeline.envelopeFrom(ev,
        to_json(struct(
          col("event_type").as("log_type"),
          when(m === 0, date_format(col("ts"), "EEE, dd MMM yyyy HH:mm:ss 'GMT'"))
            .when(m === 1, date_format(col("ts"), "EEE MMM d HH:mm:ss yyyy"))
            .otherwise(date_format(col("ts"), "EEE MMM d HH:mm:ss 'UTC' yyyy")).as("time"),
          col("event_id").cast("string").as("log_id"),
          col("user_id"), col("value"))).cast("binary"))
      Router.good(Pipeline.transform(env, cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // P5: unknown-prefix grouping key on the dead-letter channel
    "pipe_unknown_prefix" -> ((s, dir) =>
      Router.failed(Pipeline.transform(badmixEnvelopes(s, dir), cfg))
        .groupBy("log_type").agg(count(lit(1)).as("n"))
        .orderBy("log_type")),

    // P4: whitelist filter inside the pipeline
    "pipe_whitelist" -> ((s, dir) => {
      val wl = cfg.copy(logTypeWhitelist = Some(Set("click", "view", "purchase")))
      Router.good(Pipeline.transform(envelopes(s, dir), wl))
        .groupBy("log_type").agg(count(lit(1)).as("n"))
        .orderBy("log_type")
    }),

    // P6/F5: duplicate delivery collapsed by log_id (idempotent replay)
    "pipe_dedup_replay" -> ((s, dir) => {
      val env = envelopes(s, dir)
      Router.good(Pipeline.transform(env.union(env), cfg))
        .dropDuplicates("log_id")
        .agg(count(lit(1)).as("n"))
    }),

    // E5: bulk chunk plan per daily index (BULK_CHUNK_SIZE=500)
    "pipe_chunk_plan" -> ((s, dir) => {
      val goodCounts = Router.good(Pipeline.transform(envelopes(s, dir), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
      goodCounts
        .withColumn("chunks", Enrich.chunkCount(col("n"), cfg.bulkChunkSize))
        .orderBy("index_name")
    }),

    // E3/E4: the ES bulk action-envelope projection (meta line with
    // _index and _id — the F5 idempotency fix visible in the wire format)
    "pipe_action_envelope" -> ((s, dir) =>
      Enrich.actionMeta(
        Router.good(Pipeline.transform(envelopes(s, dir), cfg)))
        .select(col("log_id"), col("index_name"), col("action_meta"))
        .orderBy(col("log_id").cast("long"))),

    // E3 with ES 7.x wire parity: the reference's exact `_type: "_doc"`
    // field in every action meta (lambda/main.py:116)
    "pipe_action_envelope_es7" -> ((s, dir) =>
      Enrich.actionMeta(
        Router.good(Pipeline.transform(envelopes(s, dir), cfg)), legacyType = true)
        .select(col("log_id"), col("index_name"), col("action_meta"))
        .orderBy(col("log_id").cast("long"))),

    // K3: dead-letter partition layout {log_type}/{yyyy-MM}/{dd} for the
    // failures that still carry a parseable event time (missing_type slice)
    "pipe_deadletter_layout" -> ((s, dir) =>
      Router.failed(Pipeline.transform(badmixEnvelopes(s, dir), cfg))
        .where(col("event_ts").isNotNull)
        .select(col("log_type"),
          date_format(col("event_ts"), "yyyy-MM").as("ym"),
          date_format(col("event_ts"), "dd").as("dd"))
        .groupBy("log_type", "ym", "dd").agg(count(lit(1)).as("n"))
        .orderBy("log_type", "ym", "dd")),

    // §2.6 end-to-end STREAMING row: the one pipe_* query that executes
    // through writeStream/foreachBatch — Kinesis-shaped shim source (4
    // shards, per-shard admission control sized for ~3 micro-batches at
    // any sf), checkpointed offsets, the real runBatch sink path per
    // batch — and whose driver-visible result is parsed back OUT of the
    // bulk sink's NDJSON bytes. The oracle recomputes the per-index
    // counts relationally, so a green row proves records-exactly-once
    // across micro-batch boundaries AND byte-level action-envelope
    // correctness in a single check.
    "pipe_stream_replay" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-replay")
      val bulkDir = tmp.resolve("bulk").toString
      val total = events(s, dir).count()
      val scfg = cfg.copy(
        deadLetterPath = tmp.resolve("deadletter").toString,
        // ~3 admission-bounded micro-batches per shard at any sf — the
        // same trigger economy as the ordered-slice rows (state spans
        // batches 0→1→2; each extra trigger costs the fixed floor)
        sourceBatchSize = math.max(1, (total / (cfg.sourceShards * 3L)).toInt))
      val env = graft.streaming.StreamingPipeline.kinesisShimStream(s, dir, scfg)
      Pipeline.stream(env, scfg, Pipeline.fileTransport(bulkDir),
        tmp.resolve("ckpt").toString).awaitTermination()
      // Action meta lines are {"index":{"_index":…,"_id":…}}; doc lines
      // have no top-level "index" key (the log shape is log_type/time/…),
      // so the schema-filtered read keeps exactly the meta lines.
      s.read.schema("index struct<_index: string, _id: string>")
        .json(bulkDir)
        .where(col("index._index").isNotNull)
        .groupBy(col("index._index").as("index_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // §2.6 STATEFUL streaming row: the events replay duplicated 2× into a
    // file stream consumed over 4 micro-batches, deduplicated by log_id
    // with dropDuplicatesWithinWatermark (watermark far past the corpus
    // span, so state never evicts and the dedup is exact no matter where
    // batch boundaries fall), results appended through the streaming file
    // sink. The oracle counts each event ONCE — a green row proves
    // watermarked dedup state works across micro-batch boundaries.
    // §2.6 STREAM-STATIC enrichment row: the good channel left-joined
    // per micro-batch against a BROADCAST static dimension
    // (type → category) — the streaming analog of the reference's
    // whitelist membership (SURVEY §2 P4) generalized to attribute
    // enrichment. The stream side is never shuffled by the join (the
    // dim broadcasts, re-resolving each trigger); unmatched stream
    // types flow through as 'uncategorized' and a dim entry with no
    // stream rows ('refund') never matches — both asymmetries oracled.
    "pipe_stream_enrich" -> ((s, dir) => {
      import s.implicits._
      val tmp = streamTmp("graft-stream-enrich")
      val src = cachedFeed("enrich-env", dir) { f =>
        val p = f.resolve("envelopes").toString
        envelopes(s, dir).repartition(8).write.parquet(p)
        p
      }
      val stream = s.readStream.schema(graft.model.Schemas.envelope)
        // 8 feed files / 4 per trigger = 2 micro-batches: the dim join
        // runs (and re-resolves) in each
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
      val dim = Seq(("click", "engagement"), ("view", "engagement"),
        ("purchase", "revenue"), ("refund", "revenue"))
        .toDF("dim_type", "category")
      val enriched = graft.streaming.StreamingPipeline
        .enrichWithDimension(stream, cfg, dim, "log_type", "dim_type")
        .select(coalesce(col("category"), lit("uncategorized")).as("category"),
          col("log_type"))
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        enriched.writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .groupBy("category")
        .agg(count(lit(1)).as("n"), countDistinct("log_type").as("n_types"))
        .orderBy("category")
    }),

    "pipe_stream_dedup" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-dedup")
      val src = cachedFeed("dedup-env", dir) { f =>
        val p = f.resolve("envelopes").toString
        val env = envelopes(s, dir)
        env.repartition(8).write.parquet(p)
        env.repartition(8).write.mode("append").parquet(p)
        p
      }
      val stream = s.readStream
        .schema(graft.model.Schemas.envelope)
        // 16 feed files / 8 per trigger = 2 micro-batches: duplicates still
        // span the batch boundary (each copy of the corpus is 8 files), so
        // cross-batch dedup state is exercised at half the trigger floor
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
      val deduped = graft.streaming.StreamingPipeline
        .dedupWithinWatermark(stream, cfg, watermark = "3650 days")
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        deduped.select("index_name").writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // §2.6 STREAMING NEAR-DUP row: banded-SimHash dedup via
    // flatMapGroupsWithState (NearDupStream) — near-duplicate documents
    // flagged AS THEY ARRIVE, the streaming face of the batch
    // MinHash/SimHash dedup family. The stream is keyed by (band,
    // band-value) buckets (LSH candidate generation as the SHARDING
    // strategy), verdicts land per-(doc, band) in the sink, and the
    // reader OR-combines bands and rolls up per source. 3 doc_id-ordered
    // slices so verdicts span batch boundaries; dup(d) ⇔ ∃ earlier doc in
    // a shared band within hamming 8 — stated relationally by the oracle.
    "pipe_stream_neardup" -> ((s, dir) => {
      import s.implicits._
      val tmp = streamTmp("graft-stream-neardup")
      val src = cachedFeed("neardup-docs", dir) { f =>
        val d = graft.Tables.table(s, dir, "documents")
          .filter(col("text").isNotNull)
          // synthetic event time = arrival seq; +1 because a row whose
          // event time EQUALS the zero initial watermark is filtered by
          // the stateful operator (epoch 0 is not "later than" watermark 0)
          .select(col("doc_id"), col("text"), col("source"),
            to_timestamp(col("doc_id") + 1).as("ts"))
        val total = d.count()
        val sliced = d.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
          .withColumn("bucket", ((col("rn") - 1) * 3 / total).cast("int"))
          .drop("rn")
        writeSlices(sliced, f, 3)
      }
      val stream = s.readStream
        .schema("doc_id long, text string, source string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val banded = stream
        .withColumn("sig", graft.functions.GraftFunctions.simhash64(
          graft.ops.TextAnalysis.tokens(col("text")), graft.functions.SimHash64.Md5))
        .select(col("doc_id"), col("source"), col("ts"), col("sig"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
        .select((col("pos").cast("long") * 65536L + col("col")).as("bucket"),
          col("doc_id").as("seq"), col("doc_id"), col("source"),
          col("sig"), col("ts"))
        .as[graft.streaming.NearDupStream.BandedDoc]
      val verdicts = graft.streaming.NearDupStream.verdicts(banded,
        maxHamming = 8, watermark = "3650 days",
        horizonMs = 365L * 86400000L)
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        verdicts.toDF().writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .groupBy("doc_id", "source").agg(max(col("dup")).as("dup"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("dup"), 1L).otherwise(0L)).as("n_near_dups"))
        .orderBy("source")
    }),

    // §2.6 STREAMING CARDINALITY row: per-(type, day) distinct-user
    // monitoring with BOUNDED state — a KMV sketch of md5 user hashes per
    // window (CardinalityStream, ≤ k hashes per group regardless of
    // cardinality; exact below k, which the oracle states as a plain
    // count(DISTINCT)). One running row per active group per batch;
    // n_events is monotone so the reader keeps the final row per window.
    "pipe_stream_cardinality" -> ((s, dir) => {
      import s.implicits._
      val tmp = streamTmp("graft-stream-card")
      val src = cachedFeed("cardinality", dir)(f =>
        orderedSlices(graft.Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")), f))
      val stream = s.readStream
        .schema("event_id long, user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val hits = stream.select(
          col("event_type").as("key"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          md5(col("user_id").cast("string")).as("uhash"),
          col("ts"))
        .as[graft.streaming.CardinalityStream.Hit]
      val est = graft.streaming.CardinalityStream.estimates(hits,
        k = 4096, watermark = "3650 days", horizonMs = 30L * 86400000L)
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        est.toDF().writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .groupBy(col("key").as("event_type"), col("day"))
        .agg(max(col("n_events")).as("n_events"),
          max_by(col("n_users_est"), col("n_events")).as("n_users"))
        .orderBy("event_type", "day")
    }),

    // §2.6 STREAMING HLL row: live per-(type, day) distinct-user
    // estimates with CONSTANT state — the HLL register table IS a
    // built-in windowed max aggregate (≤ 64 (window, type, j) rows in
    // the state store per group-window; the KMV row ships ≤ k hashes,
    // this ships 64 bytes), event-time watermark evicts closed windows.
    // The reader runs the pure estimate tail over the emitted registers;
    // the same final-watermark day cutoff as pipe_stream_psi keeps
    // engine and oracle on exactly the emitted window set. Exact
    // distinct joined from the batch side to witness the error live.
    "pipe_stream_hll" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-hll")
      val src = cachedFeed("hll", dir)(f =>
        orderedSlices(graft.Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")), f))
      val stream = s.readStream
        .schema("event_id long, user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val (j, rank) = graft.ops.Sketch.hllJRank(col("user_id"))
      val regs = stream
        .select(col("event_type"), col("ts"), j.as("j"), rank.as("rank"))
        .withWatermark("ts", "1 second")
        .groupBy(window(col("ts"), "1 day"), col("event_type"), col("j"))
        .agg(max("rank").as("mj"))
        .select(col("event_type"),
          expr("unix_micros(window.start) div 86400000000").as("day"),
          col("j"), col("mj"))
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        regs.writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      val ev = graft.Tables.events(s, dir).filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          expr("unix_micros(ts)").as("us"))
      // emitted iff window end <= final watermark (max ts - 1 s)
      val wmDay = ev.agg(max(expr("(us - 1000000) div 86400000000")))
        .head.getLong(0)
      val est = graft.ops.Sketch.hllEstimate(
        s.read.parquet(outDir).filter(col("day") < wmDay),
        Seq("event_type", "day"), "users")
      val exact = ev.filter(col("day") < wmDay)
        .groupBy("event_type", "day")
        .agg(countDistinct("user_id").as("n_exact"))
      est.join(exact, Seq("event_type", "day"))
        .select("event_type", "day", "n_exact", "hll_users")
        .orderBy("event_type", "day")
    }),

    // §2.6 STREAMING HEAVY-HITTERS row: per-day top talkers (users by
    // event count) with BOUNDED state — a Misra-Gries summary of ≤ 4096
    // counters per event-time window via flatMapGroupsWithState
    // (HeavyStream), the streaming face of the batch MisraGries aggregate.
    // The ingest-skew panel: the hot key about to melt a shuffle partition
    // is exactly what this surfaces live. Exact below k (this corpus
    // peaks at 1356 distinct users/day at sf0.1), which the oracle states
    // as a plain count + rank. One running top-5 per active group per
    // batch; n_events is monotone so the reader keeps the final rows.
    "pipe_stream_heavy" -> ((s, dir) => {
      import s.implicits._
      // contract guard: the plain count+rank oracle is exact only while
      // every day stays below k=4096 distinct users (the exact-below-k
      // MG property). Check the corpus property up front so growth fails
      // HERE, loudly, instead of as an unexplained hash mismatch.
      val maxDistinctPerDay = graft.Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(countDistinct("user_id").as("d"))
        .agg(coalesce(max("d"), lit(0L))).head.getLong(0)
      require(maxDistinctPerDay < 4096,
        s"pipe_stream_heavy exact-below-k contract violated: a day has " +
          s"$maxDistinctPerDay distinct users >= k=4096")
      val tmp = streamTmp("graft-stream-heavy")
      val src = cachedFeed("heavy", dir)(f =>
        orderedSlices(graft.Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts")), f))
      val stream = s.readStream
        .schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val hits = stream.select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("user_id").cast("string").as("key"),
          col("ts"))
        .as[graft.streaming.HeavyStream.Hit]
      val tops = graft.streaming.HeavyStream.topTalkers(hits,
        k = 4096, top = 5, watermark = "3650 days",
        horizonMs = 30L * 86400000L)
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        tops.toDF().writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      val out = s.read.parquet(outDir)
      out.join(out.groupBy("day").agg(max("n_events").as("n_events")),
          Seq("day", "n_events"))
        .select(col("day"), col("rnk"), col("key").as("user_id"), col("n"))
        .orderBy("day", "rnk")
    }),

    // §2.6 STREAMING DRIFT row: live PSI per (type, day) — each event
    // type's SECOND time-half streamed, bucketed against a STATIC
    // reference (the first half's 10 equal-width value buckets,
    // broadcast stream-static), counted per event-time day window in
    // append mode under a 1 s watermark over the strictly time-ordered
    // feed, then scored by the reader with the identical add-one-smoothed
    // PSI arithmetic as the batch q_psi_drift. Bounded state: ≤ 10
    // bucket counters per (type, day) window regardless of volume, and
    // counts are order-free so the result is a pure function of the
    // data. Both sides keep exactly the days the final watermark
    // (max ts − 1 s) can close — day < day(max ts − 1 s) — so a corpus
    // whose max ts falls in the first second of a day cannot desync the
    // engine from the oracle.
    "pipe_stream_psi" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-psi")
      val src = cachedFeed("psi", dir)(f =>
        orderedSlices(graft.Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"), col("value"), col("ts")), f))
      val ev = graft.Tables.events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val rng = ev.groupBy("event_type").agg(
          min("value").as("vmin"), max("value").as("vmax"),
          min("us").as("tmin"), max("us").as("tmax"))
        .withColumn("mid", col("tmin") + expr("(tmax - tmin) div 2"))
        .localCheckpoint(eager = true) // |types| rows; stream + reader side
      def bucketCol = when(col("vmax") === col("vmin"), lit(0L))
        .otherwise(least(lit(9L),
          floor((col("value") - col("vmin")) * lit(10.0) /
            (col("vmax") - col("vmin")))))
      val stream = s.readStream
        .schema("event_id long, event_type string, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val cur = stream.join(broadcast(rng), "event_type")
        .filter(unix_micros(col("ts")) >= col("mid"))
        .withColumn("bucket", bucketCol)
        .withWatermark("ts", "1 second")
        .groupBy(window(col("ts"), "1 day"), col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("c"))
        .select(col("event_type"),
          expr("unix_micros(window.start) div 86400000000").as("day"),
          col("bucket"), col("c"))
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        cur.writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      // cutoff derived from the FINAL WATERMARK (max ts − 1 s), not the
      // max day: a window is emitted iff its end ≤ watermark, so when the
      // corpus max ts falls within the first second of its day the
      // engine can never emit day maxDay−1 — both sides must drop it.
      // day < wmDay is exactly the emitted set for every corpus shape.
      val wmDay = ev.agg(max(expr("(us - 1000000) div 86400000000")))
        .head.getLong(0)
      val cnt = s.read.parquet(outDir).filter(col("day") < wmDay)
      val refBase = ev.join(broadcast(rng), "event_type")
        .filter(col("us") < col("mid")).withColumn("bucket", bucketCol)
      val refP = rng.select(col("event_type"),
          explode(sequence(lit(0L), lit(9L))).as("bucket"))
        .join(refBase.groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("c")), Seq("event_type", "bucket"), "left")
        .join(refBase.groupBy("event_type")
          .agg(count(lit(1)).as("n")), Seq("event_type"), "left")
        .select(col("event_type"), col("bucket"),
          ((coalesce(col("c"), lit(0L)) + 1) * lit(1.0) /
            (coalesce(col("n"), lit(0L)) + 10)).as("p"))
      val nd = cnt.groupBy("event_type", "day").agg(sum("c").as("n"))
      nd.select(col("event_type"), col("day"),
          explode(sequence(lit(0L), lit(9L))).as("bucket"), col("n"))
        .join(cnt, Seq("event_type", "day", "bucket"), "left")
        .select(col("event_type"), col("day"), col("bucket"),
          ((coalesce(col("c"), lit(0L)) + 1) * lit(1.0) /
            (col("n") + 10)).as("q"))
        .join(refP, Seq("event_type", "bucket"))
        .groupBy("event_type", "day")
        .agg(round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6)
          .as("psi"))
        .orderBy("event_type", "day")
    }),

    // §2.6 STATEFUL quota row: RateLimit.admit (flatMapGroupsWithState
    // token bucket — at most `quota` events per event_type per day)
    // driven over 4 micro-batches. Batches are sliced in STRICT
    // (ts, event_id) order — file names pin the trigger order — so no
    // per-key window ever regresses, the fail-open straggler path never
    // fires, and the admitted subset is exactly the global first-quota
    // per window by (ts, id): the rule the oracle ranks out relationally.
    "pipe_stream_quota" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-quota")
      val src = cachedFeed("quota", dir)(f =>
        orderedSlices(graft.Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("ts")), f))
      import s.implicits._
      val stream = s.readStream
        .schema("event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val keyed = stream.select(col("event_type").as("key"), col("ts"),
        col("event_id").cast("string").as("id")).as[graft.streaming.RateLimit.Keyed]
      val decisions = graft.streaming.RateLimit.admit(keyed,
        quota = 10, windowMs = 86400000L, watermark = "3650 days")
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        decisions.toDF().writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .groupBy("key")
        .agg(count(lit(1)).as("n"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"))
        .orderBy("key")
    }),

    // §2.6 STREAMING session-window row: native session_window aggregation
    // (30-min gap) in append mode over the same strictly time-ordered
    // 4-batch slicing as pipe_stream_quota (ordered batches → no late
    // drops under the 1 s watermark). Append mode only emits sessions the
    // final watermark (max ts − 1 s) has closed, so BOTH sides keep only
    // sessions whose last event is ≥ 1 day before the corpus max — a
    // conservative cutoff that swallows the emission boundary exactly.
    "pipe_stream_sessions" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-sessions")
      val ev = graft.Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val src = cachedFeed("sessions", dir)(f => orderedSlices(ev, f))
      val stream = s.readStream
        .schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        stream.withWatermark("ts", "1 second")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("w.end").as("w_end"), col("n_events"))
          .writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        // last event = w.end − 30 min; keep sessions a full day clear of
        // the final watermark so the emission boundary cannot show
        .where(col("w_end") - expr("INTERVAL 30 MINUTES")
          < lit(maxTs) - expr("INTERVAL 1 DAY"))
        .groupBy("n_events").agg(count(lit(1)).as("n_sessions"))
        .orderBy("n_events")
    }),

    // §2.6 STREAM-STREAM JOIN row: click and purchase arms of the SAME
    // source stream inner-joined on user within a 1-hour event-time range
    // (the streaming conversion join). Inner joins emit every match
    // regardless of batch boundaries; the ordered slices mean no record
    // ever arrives behind the watermark front, so a 2-hour watermark
    // late-drops NOTHING while letting the store evict click state older
    // than the join range — bounded state, the actual 100 TB shape, with
    // the emitted pair set still equal to batch semantics, which the
    // oracle computes relationally. Only the two joined arms are sliced
    // and streamed.
    "pipe_stream_join" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-join")
      val src = joinArmsFeed(s, dir)
      val stream = s.readStream
        .schema("event_id long, user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        purchases.join(clicks,
            col("p_user") === col("c_user") &&
            col("c_ts") <= col("p_ts") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
          .select(col("p_id"), col("p_ts"))
          .writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      // (purchase, click) pairs per day — a purchase with k in-window
      // clicks contributes k pairs
      s.read.parquet(outDir)
        .groupBy(date_format(col("p_ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("p_id")).as("n_converted"))
        .orderBy("day")
    }),

    // §2.6 OUTER stream-stream join row: purchases LEFT-OUTER joined to
    // clicks — the null-match row (the negative funnel signal) is emitted
    // only once the watermark proves no click can still arrive, the
    // watermark-driven emission that makes outer stream joins subtle.
    // Ordered slices → no late drops; both sides keep only purchases a
    // full day clear of the corpus max, far inside the final watermark's
    // proven region, so the emitted null set equals batch semantics.
    "pipe_stream_outer_join" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-ojoin")
      val ev = graft.Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val src = joinArmsFeed(s, dir) // same arms as pipe_stream_join
      val stream = s.readStream
        .schema("event_id long, user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        purchases.join(clicks,
            col("p_user") === col("c_user") &&
            col("c_ts") <= col("p_ts") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
            "left_outer")
          .select(col("p_id"), col("p_ts"), col("c_ts"))
          .writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .where(col("p_ts") < lit(maxTs) - expr("INTERVAL 1 DAY"))
        .groupBy(date_format(col("p_ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(when(col("c_ts").isNull, 1L).otherwise(0L)).as("n_unconverted"),
          countDistinct(when(col("c_ts").isNotNull, col("p_id"))).as("n_converted"))
        .orderBy("day")
    }),

    // §2.6 STREAMING UPSERT row: last-write-wins key compaction (the
    // compacted-topic / CDC-materialization shape). Each user's event
    // stream is reduced to ONE current row by keyed state that emits only
    // on change (Compact.latestPerKey), merged per micro-batch into a
    // versioned parquet snapshot (Compact.mergeBatch). Ordered slices →
    // every batch's winner is the true prefix winner; the final snapshot
    // equals the relational argmax-by-(ts, event_id) the oracle computes.
    "pipe_stream_upsert" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-upsert")
      val src = cachedFeed("upsert", dir)(f =>
        orderedSlices(graft.Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"), col("value")), f))
      import s.implicits._
      val stream = s.readStream
        .schema("event_id long, user_id long, event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("us"),
          col("event_id").as("id"), col("event_type").as("kind"), col("value"))
        .as[graft.streaming.Compact.Upd]
      val table = tmp.resolve("table").toString
      withFewShufflePartitions(s) {
        graft.streaming.Compact.latestPerKey(stream).toDF().writeStream
          .foreachBatch((changes: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         batchId: Long) =>
            graft.streaming.Compact.mergeBatch(changes.toDF(), table, batchId))
          .outputMode("update")
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      graft.streaming.Compact.snapshot(s, table)
        .groupBy(col("kind").as("last_event_type"))
        .agg(count(lit(1)).as("n_users"), round(sum("value"), 2).as("total_value"))
        .orderBy("last_event_type")
    }),

    // §1.2 VARIANT router: the same fan-out as pipe_index_counts computed
    // through Router.routeVariant (try_parse_json + variant_get instead of
    // from_json's fixed schema) against the same oracle — the open-schema
    // alternative stays correctness-pinned, and its bench row sits next to
    // pipe_index_counts for a direct cost comparison (README "Variant
    // router" records the keep/revert decision).
    "pipe_variant_route" -> ((s, dir) => {
      val decoded = graft.decode.Decode.normalize(envelopes(s, dir))
      Router.good(Enrich.withIndexName(Router.routeVariant(decoded, cfg), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // §2.6 CHECKPOINT-RESTART row: streaming state must survive a query
    // stop/restart, not just batch boundaries. The envelope replay is fed
    // twice — copy A before a deliberate stop, copy B (byte-identical
    // duplicates) only AFTER a new query resumes from the same checkpoint —
    // through watermarked log_id dedup. Copy B can only be suppressed if
    // the dedup state store was recovered across the restart: a green row
    // IS recovery working; double counts would be a red row. (EndToEndSpec
    // drives the same restart through graft.Main; this is the
    // driver-oracled version.)
    "pipe_stream_restart" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-restart")
      val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
      val env = envelopes(s, dir)
      // Unlike the ordered-slice rows, this feed needs NO order pinning:
      // watermarked dedup over byte-identical copies is batch-order-
      // insensitive (whichever copy arrives first wins, counts agree), so
      // the staging write keeps full task parallelism — a coalesce(1)
      // feed would serialize the rehearsal's 10x corpus through one
      // writer. The staged envelope parquet is written ONCE per JVM
      // (cachedFeed); each invocation re-ENACTS the two-phase arrival by
      // hard-linking the staged files into its fresh feed dir — arrival
      // timing is the semantics under test, serialization is not.
      val staged = cachedFeed("restart-env", dir) { f =>
        val p = f.resolve("staged").toString
        env.write.parquet(p)
        p
      }
      def addFiles(tag: String): Unit =
        new java.io.File(staged).listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .zipWithIndex.foreach { case (f, i) =>
            java.nio.file.Files.createLink(
              src.resolve(s"part-$tag-$i.parquet"), f.toPath)
          }
      val outDir = tmp.resolve("out").toString
      def run(): Unit = withFewShufflePartitions(s) {
        val stream = s.readStream
          .schema(graft.model.Schemas.envelope)
          .option("maxFilesPerTrigger", 16)
          .parquet(src.toString)
        graft.streaming.StreamingPipeline
          .dedupWithinWatermark(stream, cfg, watermark = "3650 days")
          .select("index_name").writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      addFiles("a"); run() // copy A, then the query STOPS
      addFiles("b"); run() // duplicates arrive only after the restart
      s.read.parquet(outDir)
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // S1 FILE-WIRE variant: the envelope replay serialized as gzip JSON
    // LINES in the Kinesis event-source wire shape (data = base64 TEXT,
    // reference README.md:9) and ingested back through the json source —
    // the `graft.Main --format json` path as a driver row. Proves the
    // engine consumes the reference's on-the-wire record format from
    // object storage, not just its own parquet envelopes.
    "pipe_jsonl_source" -> ((s, dir) => {
      val wire = cachedFeed("jsonl-wire", dir) { f =>
        val p = f.resolve("wire").toString
        envelopes(s, dir)
          .withColumn("data", base64(col("data")))
          .write.option("compression", "gzip").json(p)
        p
      }
      val env = s.read.schema(graft.model.Schemas.envelopeJson).json(wire)
      Router.good(Pipeline.transform(env, cfg, base64Data = true))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // CSV wire format: the same envelope corpus round-tripped through
    // gzipped CSV-with-header — the other common S3 landing format for
    // Kinesis Firehose-style delivery. The base64 payload is flattened to
    // one line (Spark's `base64` emits MIME-chunked output with CRLF every
    // 76 chars; an embedded newline would force multiLine CSV parsing,
    // which is NOT splittable — a 100-TB read would collapse to one task
    // per file). The arrival timestamp round-trips losslessly through an
    // explicit microsecond format on both write and read (Spark's CSV
    // default keeps milliseconds only). Proves ingestion parity across a
    // third on-the-wire format (parquet, JSONL, CSV).
    "pipe_csv_source" -> ((s, dir) => {
      val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
      val wire = cachedFeed("csv-wire", dir) { f =>
        val p = f.resolve("wire").toString
        envelopes(s, dir)
          .withColumn("data", translate(base64(col("data")), "\r\n", ""))
          .write.option("header", "true").option("timestampFormat", tsFmt)
          .option("compression", "gzip").csv(p)
        p
      }
      val env = s.read.schema(graft.model.Schemas.envelopeJson)
        .option("header", "true").option("timestampFormat", tsFmt).csv(wire)
      Router.good(Pipeline.transform(env, cfg, base64Data = true))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // ORC wire source: the columnar wire format next to the CSV/JSONL
    // rows — envelopes written once as zlib ORC (the binary payload
    // column is carried NATIVELY; no base64 leg, unlike the CSV wire),
    // read back self-describing (no caller-supplied schema), and run
    // through the identical decode→route→enrich pipeline to the same
    // per-index counts oracle. A green row proves the ORC write→read
    // round trip is lossless for binary + timestamp envelope columns.
    "pipe_orc_source" -> ((s, dir) => {
      val wire = cachedFeed("orc-wire", dir) { f =>
        val p = f.resolve("wire").toString
        envelopes(s, dir).write.option("compression", "zlib").orc(p)
        p
      }
      Router.good(Pipeline.transform(s.read.orc(wire), cfg))
        .groupBy("index_name").agg(count(lit(1)).as("n"))
        .orderBy("index_name")
    }),

    // K3 ROUND-TRIP: the dead-letter re-drive loop. The badmix failures are
    // written through the real sink (gzip NDJSON, Hive log_type/ym/dd
    // layout) and then READ BACK — the operational path when an upstream
    // fix re-ingests S3 dead letters. The driver-visible result is computed
    // entirely from the re-read bytes: per log_type, row count, distinct
    // payload count (the not_json slice collapses to ONE constant payload;
    // every JSON failure is unique), and the sum of log_id parsed back out
    // of the payload JSON (null for non-JSON lines). A green row proves
    // write -> gzip -> partition layout -> read -> re-parse is lossless.
    "pipe_deadletter_replay" -> ((s, dir) => {
      val tmp = streamTmp("graft-dl-replay")
      val dcfg = cfg.copy(deadLetterPath = tmp.resolve("dl").toString)
      val routed = Pipeline.transform(badmixEnvelopes(s, dir), dcfg)
      graft.sink.DeadLetterSink.writeFailed(Router.failed(routed), dcfg,
        reason = "failed_validation")
      s.read.text(s"${dcfg.deadLetterPath}/failed_validation")
        .select(col("log_type"), col("value"),
          get_json_object(col("value"), "$.log_id").cast("long").as("log_id"))
        .groupBy("log_type")
        .agg(count(lit(1)).as("n"),
          countDistinct("value").as("n_payloads"),
          sum("log_id").as("sum_log_id"))
        .orderBy("log_type")
    }),

    // §2.6 WATERMARK LATE-DROP row: the one streaming semantic the other
    // stream rows deliberately engineer AWAY (their ordered slices mean
    // nothing ever arrives late). Batches arrive OUT of time order:
    //   trigger 0: the second time-quarter [t2, t1)   — inserts, no wm yet
    //   trigger 1: the newest half       [t1, max]    — advances wm to max-2h
    //   trigger 2: the eighth            [t3, t2)     — hours late: DROPPED
    //   trigger 3: the oldest eighth     [min, t3)    — hours late: DROPPED
    // Probed on this Spark version: the late-input filter uses the
    // watermark with a ONE-BATCH propagation lag (batch N filters with the
    // wm derived from batches 0..N-2, while offsets/N already records the
    // newer value), so the slicing is chosen to be correct under BOTH the
    // lagged and unlagged model: batch 1 is never late under either (its
    // rows are newer than any wm it could see), and batches 2-3 are at
    // least span/4 - 2h behind every applicable wm. Append mode emits
    // exactly the windows the final watermark (max - 2h) has closed, so
    // the emitted set is: rows with ts >= t2, in windows ending at or
    // before max - 2h — the relational rule the oracle reproduces. The
    // missing [min, t2) days in the output ARE the watermark drop.
    "pipe_stream_late_drop" -> ((s, dir) => {
      val tmp = streamTmp("graft-stream-late")
      val ev = graft.Tables.events(s, dir).select(col("event_id"), col("ts"))
      val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      val (mUs, xUs) = (r.getLong(0), r.getLong(1))
      val span = xUs - mUs
      // The engine/oracle agreement silently assumed the corpus spans
      // enough wall-clock time — make the assumption LOUD: buckets 2-3 are
      // provably late (under both the lagged and unlagged watermark model)
      // only if windows ending <= t2+1h close under the earliest applicable
      // watermark t1-2h, i.e. span/4 >= 3h. A compressed-timespan corpus
      // must fail here, not as a silent oracle mismatch.
      require(span >= 12L * 3600 * 1000000L,
        s"pipe_stream_late_drop needs an events corpus spanning >= 12h " +
          s"(got ${span / 3600000000L}h): buckets 2-3 would not be " +
          "provably late under the 2h watermark")
      val (t1, t2, t3) = (mUs + span / 2, mUs + span / 4, mUs + span / 8)
      val us = unix_micros(col("ts"))
      val bucket = when(us >= t2 && us < t1, 0).when(us >= t1, 1)
        .when(us >= t3, 2).otherwise(3)
      val src = cachedFeed("late-drop", dir)(f =>
        writeSlices(ev.withColumn("bucket", bucket), f, 4))
      val stream = s.readStream
        .schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val outDir = tmp.resolve("out").toString
      withFewShufflePartitions(s) {
        stream.withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("w.end").as("w_end"), col("n_events"))
          .writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(outDir)
        .groupBy(date_format(col("w_end"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_windows"), sum("n_events").as("n_events"))
        .orderBy("day")
    })
  )

  /** DuckDB oracles (driver runs these on the same parquet). */
  val sql: Map[String, String] = {
    val indexExpr = "concat('logs-', event_type, '-', strftime(ts, '%Y%m%d'))"
    val routeExpr =
      """CASE WHEN event_id % 10 = 9 THEN 'failed:not_json'
        |     WHEN event_id % 10 = 7 THEN 'failed:missing_type'
        |     WHEN event_id % 10 = 8 THEN 'failed:bad_timestamp'
        |     ELSE 'good' END""".stripMargin
    Map(
      "pipe_index_counts" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_index_counts_gzip" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_rfc_timestamps" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_base64_envelopes" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_kpl_aggregates" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_cwl_bundles" ->
        s"""SELECT $indexExpr AS index_name, count(*) AS n FROM events
           |WHERE (event_id // 5) % 10 <> 3 GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_route_badmix" ->
        s"SELECT $routeExpr AS route, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_unknown_prefix" ->
        s"""SELECT CASE WHEN event_id % 10 IN (7, 9) THEN 'unknown' ELSE event_type END AS log_type,
           |       count(*) AS n
           |FROM events WHERE event_id % 10 IN (7, 8, 9) GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_whitelist" ->
        """SELECT event_type AS log_type, count(*) AS n FROM events
          |WHERE event_type IN ('click','view','purchase') GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_dedup_replay" ->
        "SELECT count(DISTINCT event_id) AS n FROM events",
      "pipe_stream_replay" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_variant_route" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_stream_dedup" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      // The KMV stream stays below k = 4096 everywhere on this corpus
      // (max 587 distinct users per (type, day) at sf0.1), so the
      // exact-below-k contract makes the estimate a plain distinct count
      "pipe_stream_cardinality" ->
        """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          |       count(*) AS n_events,
          |       count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Streaming HLL oracle: the q_hll_distinct register/estimate
      // arithmetic with a day dimension, on the final-watermark-emitted
      // window set (day < day(max ts − 1 s), the psi cutoff)
      "pipe_stream_hll" ->
        """WITH wm AS (SELECT (max(epoch_us(ts)) - 1000000) // 86400000000 AS d
          |            FROM events WHERE user_id IS NOT NULL),
          |h AS (
          |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          |         user_id,
          |         ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS u
          |  FROM events, wm
          |  WHERE user_id IS NOT NULL AND epoch_us(ts) // 86400000000 < wm.d),
          |r AS (SELECT event_type, day, u >> 58 AS j,
          |             CASE WHEN (u & 288230376151711743) = 0 THEN 59
          |                  ELSE 59 - len(bin(u & 288230376151711743)) END AS rank
          |      FROM h),
          |regs AS (SELECT event_type, day, j, max(rank) AS mj
          |         FROM r GROUP BY 1, 2, 3),
          |agg AS (SELECT event_type, day,
          |               CAST(sum(CAST(1 AS BIGINT) << (63 - mj)) AS DECIMAL(38,0))
          |                 + CAST(64 - count(*) AS DECIMAL(38,0)) * 9223372036854775808
          |                 AS s_int,
          |               64 - count(*) AS v
          |        FROM regs GROUP BY 1, 2),
          |est AS (SELECT event_type, day,
          |               0.709::DOUBLE * 64.0 * 64.0 * 9223372036854775808.0
          |                 / s_int::DOUBLE AS raw, v
          |        FROM agg),
          |ex AS (SELECT event_type, day, count(DISTINCT user_id) AS n_exact
          |       FROM h GROUP BY 1, 2)
          |SELECT e.event_type, e.day, ex.n_exact,
          |       round(CASE WHEN e.raw <= 160 AND e.v > 0
          |                  THEN 64.0 * ln(64.0 / e.v) ELSE e.raw END, 4)
          |         AS hll_users
          |FROM est e JOIN ex ON e.event_type = ex.event_type AND e.day = ex.day
          |ORDER BY e.event_type, e.day""".stripMargin,
      // The MG stream stays below k = 4096 distinct users per day on this
      // corpus, so the exact-below-k contract makes every counter a plain
      // count and the top-5 a rank over it (ties broken by the string key,
      // matching the engine's (count desc, key asc) emission order)
      "pipe_stream_heavy" ->
        """WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
          |                  CAST(user_id AS VARCHAR) AS user_id,
          |                  count(*) AS n
          |           FROM events GROUP BY 1, 2),
          |r AS (SELECT day, user_id, n,
          |             row_number() OVER (PARTITION BY day
          |                                ORDER BY n DESC, user_id) AS rnk
          |      FROM c)
          |SELECT day, rnk, user_id, n FROM r WHERE rnk <= 5
          |ORDER BY day, rnk""".stripMargin,
      // Streaming PSI oracle: the batch q_psi_drift recurrence with a day
      // dimension on the current side, same per-type midpoint/buckets/
      // add-one smoothing, same corpus-max-day cutoff.
      "pipe_stream_psi" ->
        """WITH ev AS (SELECT event_type, value, epoch_us(ts) AS us FROM events
          |            WHERE value IS NOT NULL),
          |rng AS (SELECT event_type, min(value) AS vmin, max(value) AS vmax,
          |               min(us) AS tmin, max(us) AS tmax
          |        FROM ev GROUP BY 1),
          |md AS (SELECT max((us - 1000000) // 86400000000) AS maxday FROM ev),
          |b AS (SELECT e.event_type, e.us // 86400000000 AS day,
          |             CASE WHEN e.us < r.tmin + (r.tmax - r.tmin) // 2
          |                  THEN 'ref' ELSE 'cur' END AS half,
          |             CASE WHEN r.vmax = r.vmin THEN 0
          |                  ELSE least(9, CAST(floor((e.value - r.vmin) * 10.0 /
          |                                           (r.vmax - r.vmin)) AS BIGINT))
          |             END AS bucket
          |      FROM ev e JOIN rng r USING (event_type)),
          |refc AS (SELECT event_type, bucket, count(*) AS c FROM b
          |         WHERE half = 'ref' GROUP BY 1, 2),
          |refn AS (SELECT event_type, count(*) AS n FROM b
          |         WHERE half = 'ref' GROUP BY 1),
          |refp AS (SELECT s.event_type, s.bucket,
          |                (COALESCE(c.c, 0) + 1) * 1.0 / (COALESCE(n.n, 0) + 10) AS p
          |         FROM (SELECT event_type, unnest(generate_series(0, 9)) AS bucket
          |               FROM rng) s
          |         LEFT JOIN refc c ON c.event_type = s.event_type
          |                         AND c.bucket = s.bucket
          |         LEFT JOIN refn n ON n.event_type = s.event_type),
          |curc AS (SELECT event_type, day, bucket, count(*) AS c
          |         FROM b, md WHERE half = 'cur' AND day < md.maxday
          |         GROUP BY 1, 2, 3),
          |curn AS (SELECT event_type, day, CAST(sum(c) AS BIGINT) AS n
          |         FROM curc GROUP BY 1, 2),
          |curq AS (SELECT n.event_type, n.day, s.bucket,
          |                (COALESCE(c.c, 0) + 1) * 1.0 / (n.n + 10) AS q
          |         FROM curn n
          |         CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) s
          |         LEFT JOIN curc c ON c.event_type = n.event_type
          |                         AND c.day = n.day AND c.bucket = s.bucket)
          |SELECT q.event_type, q.day,
          |       round(sum((q.q - p.p) * ln(q.q / p.p)), 6) AS psi
          |FROM curq q JOIN refp p ON p.event_type = q.event_type
          |                       AND p.bucket = q.bucket
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // Relational statement of the streaming banded-SimHash dedup:
      // dup(d) ⇔ ∃ earlier doc (smaller doc_id = arrival seq) sharing a
      // 16-bit band of the md5 SimHash within hamming 8. Same md5-simhash
      // replay as dedup_simhash's oracle.
      "pipe_stream_neardup" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
          |  FROM documents WHERE text IS NOT NULL),
          |th AS (
          |  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM toks),
          |bits AS (
          |  SELECT doc_id, bb.b AS b,
          |         sum(CASE WHEN ((h >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS c
          |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
          |  GROUP BY 1, 2),
          |sigs AS (
          |  SELECT doc_id,
          |         bit_or(CASE WHEN c > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS sim
          |  FROM bits GROUP BY doc_id),
          |banded AS (
          |  SELECT doc_id, sim, band.band AS band,
          |         (sim >> (band.band * 16)) & 65535 AS bucket
          |  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) band),
          |dup AS (
          |  SELECT DISTINCT a.doc_id FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.bucket = b.bucket AND b.doc_id < a.doc_id
          |  WHERE bit_count(xor(a.sim, b.sim)) <= 8)
          |SELECT d.source, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups
          |FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
          |WHERE d.text IS NOT NULL
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_stream_enrich" ->
        """SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
          |            WHEN event_type = 'purchase' THEN 'revenue'
          |            ELSE 'uncategorized' END AS category,
          |       count(*) AS n, count(DISTINCT event_type) AS n_types
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_stream_restart" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_jsonl_source" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_csv_source" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_orc_source" ->
        s"SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
      "pipe_stream_outer_join" ->
        """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
          |p AS (SELECT event_id, user_id, ts FROM events
          |      WHERE event_type = 'purchase'
          |        AND ts < (SELECT max(ts) FROM events
          |                  WHERE event_type IN ('click', 'purchase'))
          |                 - INTERVAL 1 DAY),
          |m AS (SELECT p.event_id, p.ts,
          |             count(c.user_id) AS n_clicks
          |      FROM p LEFT JOIN c ON p.user_id = c.user_id
          |       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
          |      GROUP BY 1, 2)
          |SELECT strftime(ts, '%Y-%m-%d') AS day,
          |       CAST(sum(CASE WHEN n_clicks = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_unconverted,
          |       count(DISTINCT CASE WHEN n_clicks > 0 THEN event_id END)
          |         AS n_converted
          |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_stream_upsert" ->
        """WITH latest AS (
          |  SELECT user_id, event_type, value,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events)
          |SELECT event_type AS last_event_type, count(*) AS n_users,
          |       round(sum(value), 2) AS total_value
          |FROM latest WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_stream_join" ->
        """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
          |p AS (SELECT event_id, user_id, ts FROM events
          |      WHERE event_type = 'purchase'),
          |j AS (SELECT p.event_id, p.ts
          |      FROM p JOIN c ON p.user_id = c.user_id
          |       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR)
          |SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_pairs,
          |       count(DISTINCT event_id) AS n_converted
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_stream_sessions" ->
        """WITH x AS (
          |  SELECT user_id, ts,
          |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
          |              THEN 1 ELSE 0 END AS ns
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
          |                              ROWS UNBOUNDED PRECEDING) AS sid
          |      FROM x),
          |sess AS (SELECT user_id, sid, count(*) AS n_events, max(ts) AS last_ts
          |         FROM g GROUP BY 1, 2)
          |SELECT n_events, count(*) AS n_sessions
          |FROM sess
          |WHERE last_ts < (SELECT max(ts) FROM events) - INTERVAL 1 DAY
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_stream_quota" ->
        """WITH r AS (SELECT event_type AS key, ts, event_id,
          |                  row_number() OVER (
          |                    PARTITION BY event_type,
          |                      CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT)
          |                    ORDER BY ts, CAST(event_id AS VARCHAR)) AS rk
          |           FROM events)
          |SELECT key, count(*) AS n,
          |       CAST(sum(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_chunk_plan" ->
        s"""SELECT index_name, n, CAST(ceil(n / 500.0) AS BIGINT) AS chunks
           |FROM (SELECT $indexExpr AS index_name, count(*) AS n FROM events GROUP BY 1) t
           |ORDER BY index_name""".stripMargin,
      "pipe_action_envelope" ->
        s"""SELECT CAST(event_id AS VARCHAR) AS log_id,
           |       $indexExpr AS index_name,
           |       concat('{"index":{"_index":"', $indexExpr, '","_id":"', event_id, '"}}')
           |         AS action_meta
           |FROM events ORDER BY event_id""".stripMargin,
      "pipe_action_envelope_es7" ->
        s"""SELECT CAST(event_id AS VARCHAR) AS log_id,
           |       $indexExpr AS index_name,
           |       concat('{"index":{"_index":"', $indexExpr, '","_type":"_doc","_id":"', event_id, '"}}')
           |         AS action_meta
           |FROM events ORDER BY event_id""".stripMargin,
      // the CASE collapses the not_json slice (m=9) to one token so the
      // distinct-payload count matches the engine's constant-line collapse;
      // m=7/8 payloads each embed their unique log_id. sum_log_id skips
      // m=9 exactly as the engine's get_json_object returns null there.
      "pipe_deadletter_replay" ->
        """WITH f AS (SELECT CASE WHEN event_id % 10 IN (7, 9) THEN 'unknown'
          |                       ELSE event_type END AS log_type,
          |                  event_id % 10 AS m, event_id
          |           FROM events WHERE event_id % 10 IN (7, 8, 9))
          |SELECT log_type, count(*) AS n,
          |       count(DISTINCT CASE WHEN m = 9 THEN 'c'
          |                           ELSE CAST(event_id AS VARCHAR) END) AS n_payloads,
          |       CAST(sum(CASE WHEN m <> 9 THEN event_id END) AS BIGINT) AS sum_log_id
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
      // inserted rows = time-buckets 0 and 1 = ts >= t2 = min + span//4
      // (same integer-microsecond arithmetic as the engine's bucket
      // assignment); emitted windows are those the final watermark
      // (max ts - 2h) has closed; the dropped [min, t2) slices are the
      // late-data hole in the day range
      "pipe_stream_late_drop" ->
        """WITH b AS (SELECT min(epoch_us(ts)) AS m, max(epoch_us(ts)) AS x FROM events),
          |ins AS (SELECT ts FROM events, b
          |        WHERE epoch_us(ts) >= b.m + (b.x - b.m) // 4),
          |w AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS w_end,
          |             count(*) AS n_events
          |      FROM ins GROUP BY 1),
          |emitted AS (SELECT w.w_end, w.n_events
          |            FROM w, (SELECT max(ts) AS mt FROM events) mx
          |            WHERE w.w_end <= mx.mt - INTERVAL 2 HOUR)
          |SELECT strftime(w_end, '%Y-%m-%d') AS day,
          |       count(*) AS n_windows,
          |       CAST(sum(n_events) AS BIGINT) AS n_events
          |FROM emitted GROUP BY 1 ORDER BY 1""".stripMargin,
      "pipe_deadletter_layout" ->
        """SELECT 'unknown' AS log_type, strftime(ts, '%Y-%m') AS ym, strftime(ts, '%d') AS dd,
          |       count(*) AS n
          |FROM events WHERE event_id % 10 = 7 GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    )
  }
}
