package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.config.PipelineConfig
import graft.sink.StubEsServer
import graft.streaming.StreamingPipeline

/** The full reference deployment, wire-to-wire: the Kinesis-shaped DSv2
  * source (shards, batch_size, TRIM_HORIZON) streams the events replay
  * through decode→route→enrich, and the HTTP bulk transport POSTs real
  * `_bulk` NDJSON to a live (stub) Elasticsearch endpoint — including
  * partial rejects parsed from the real response wire format and routed to
  * the dead-letter sink. A user of the reference swaps endpoints and runs
  * this exact topology. */
class EndToEndSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kinesis shim -> pipeline -> HTTP _bulk endpoint, with partial rejects") {
    // reject any action whose payload carries log_id 7 or 13
    val es = new StubEsServer(rejectIf = s =>
      s.contains("\"log_id\":\"7\"") || s.contains("\"log_id\":\"13\""))
    val ep = es.endpoint
    val dir = Files.createTempDirectory("e2e").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl",
      sourceShards = 4, sourceBatchSize = 200)
    try {
      val q = StreamingPipeline.run(
        StreamingPipeline.kinesisShimStream(spark, sf, cfg), cfg,
        Pipeline.httpTransport(ep), s"$dir/ckpt", Trigger.AvailableNow())
      q.awaitTermination(180000)

      // every record was POSTed as real bulk NDJSON
      val posted = (0 until es.requests.size).map(es.requests.get)
      assert(posted.map(_.split('\n').count(_.nonEmpty) / 2).sum == 1000)
      assert(posted.forall(_.startsWith("{\"index\":{\"_index\":\"logs-")))

      // the two rejects came back through the response parser into K4
      val rejected = spark.read.text(s"$dir/dl/es_rejected")
      assert(rejected.count() == 2)
      val bodies = rejected.collect().map(_.getString(0)).mkString
      assert(bodies.contains("\"log_id\":\"7\"") && bodies.contains("\"log_id\":\"13\""))
    } finally es.stop()
  }

  test("chaos: transient 503 bursts mid-stream — retries recover, no loss, no duplicates") {
    // every 3rd POST is answered 503; the transport's chunk-local
    // retry/backoff must re-send ONLY the failed chunk and the stream must
    // still deliver every record exactly once to the successful requests
    val es = new StubEsServer(failNthMod = 3)
    val ep = es.endpoint
    val dir = Files.createTempDirectory("e2e-chaos").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl",
      sourceShards = 4, sourceBatchSize = 100)
    try {
      val q = StreamingPipeline.run(
        StreamingPipeline.kinesisShimStream(spark, sf, cfg), cfg,
        () => new graft.sink.HttpBulkTransport(ep, backoffBaseMs = 1),
        s"$dir/ckpt", Trigger.AvailableNow())
      q.awaitTermination(180000)

      // chaos actually happened: some requests 503'd, and each failure was
      // recovered by a retry (more requests than successful responses)
      val ex = (0 until es.exchanges.size).map(es.exchanges.get)
      assert(ex.count(_._2 == 503) > 0, "the chaos knob never fired")
      assert(ex.count(_._2 == 200) < ex.length)

      // exactly-once across the SUCCESSFUL wire traffic: every record
      // indexed once, despite the re-POSTs of 503'd chunks
      val okBodies = ex.filter(_._2 != 503).map(_._1)
      val ids = okBodies.flatMap(_.split('\n').filter(_.startsWith("{\"index\":")))
        .map(m => m.split("\"_id\":\"")(1).takeWhile(_ != '"'))
      assert(ids.length == 1000, s"expected 1000 indexed actions, got ${ids.length}")
      assert(ids.distinct.length == 1000, "a chunk was indexed twice")

      // nothing dead-lettered: 503s are transport failures, not data
      // errors (the sink may create the base dir; it must stay empty)
      val dl = new java.io.File(s"$dir/dl/es_rejected")
      val leaked = scala.collection.mutable.Buffer.empty[String]
      if (dl.exists()) {
        val it = Files.walk(dl.toPath).iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (p.toFile.isFile && !n.startsWith("_") && !n.startsWith("."))
            leaked += n
        }
      }
      assert(leaked.isEmpty, s"unexpected dead-letter objects: $leaked")
    } finally es.stop()
  }

  test("graft.Main --mode stream --source kinesis: checkpoint restart mid-stream") {
    // The operational surface the README advertises, driven through the
    // CLI: run 1 drains a half-grown stream over 2+ micro-batches per
    // shard, the process "dies" (main returns), the stream gains records,
    // and run 2 with the SAME checkpoint resumes from the recorded shard
    // positions — every record delivered exactly once across the restart.
    // pass `ts` through in whatever encoding the fixture uses (long nanos
    // or µs timestamp) — the shim detects the written file's logical type
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val maxId = raw.agg(org.apache.spark.sql.functions.max("event_id"))
      .head().getLong(0)
    val splitId = maxId / 2 // ids are the shard sort key: later ids append
    val dir = Files.createTempDirectory("e2e-main-restart").toString
    val evDir = s"$dir/stream" // grown between runs; shim re-lists files
    raw.where(s"event_id <= $splitId").write.parquet(s"$evDir/events.parquet")

    def runMain(): Unit = Main.main(Array(
      "--input", evDir,
      "--source", "kinesis",
      "--mode", "stream",
      "--bulk-out", s"$dir/bulk",
      "--dead-letter", s"$dir/dl",
      "--checkpoint", s"$dir/ckpt",
      "--shards", "4",
      "--batch-size", "60")) // ~125 records/shard in run 1 → 3 micro-batches

    def indexedIds(): Seq[String] = {
      val files = Option(new java.io.File(s"$dir/bulk").listFiles()).getOrElse(Array())
      files.toSeq.flatMap { f =>
        new String(Files.readAllBytes(f.toPath), java.nio.charset.StandardCharsets.UTF_8)
          .split('\n').filter(_.startsWith("{\"index\":"))
          .map(m => m.split("\"_id\":\"")(1).takeWhile(_ != '"'))
      }
    }

    runMain()
    val firstWave = indexedIds()
    val nFirst = splitId + 1
    assert(firstWave.length == nFirst, s"run 1: ${firstWave.length} != $nFirst")

    // the stream grows while the consumer is down
    raw.write.mode("overwrite").parquet(s"$evDir/events.parquet")
    runMain()
    val all = indexedIds()
    assert(all.length == maxId + 1, s"after restart: ${all.length} != ${maxId + 1}")
    assert(all.distinct.length == all.length, "restart re-delivered a record")
  }
}
