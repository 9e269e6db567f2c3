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
}
