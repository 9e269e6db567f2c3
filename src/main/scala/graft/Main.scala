package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig
import graft.model.Schemas
import graft.streaming.StreamingPipeline

/** Standalone pipeline runner — the operational surface a user of the
  * reference module switches to. Input: JSON-lines Kinesis envelopes
  * (FIXTURES.md §A, `data` base64). The 12 Terraform variables of the
  * reference map to the flags below.
  *
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   --input /data/envelopes --bulk-out /out/bulk \
  *   --dead-letter /out/dlq --index-prefix prod-logs \
  *   --timezone Asia/Tokyo --whitelist nginx,app \
  *   --mode stream --checkpoint /out/ckpt
  * }}}
  *
  * `--es-endpoint https://host:443` switches the sink from NDJSON files to
  * the real HTTP `_bulk` transport (the reference's ES_HOST); SigV4 signing
  * reads the standard AWS_* environment variables when present, exactly
  * like the reference client (lambda/main.py:47,52-58). `--source kinesis`
  * reads via the Kinesis-shaped shim source (`--shards`, `--batch-size`,
  * `--starting-position` map the event source mapping's Terraform vars).
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opt = parseArgs(args)
    val input = opt.getOrElse("input", sys.error("--input is required"))
    val bulkOut = opt.getOrElse("bulk-out", "/tmp/graft/bulk")
    val cfg = PipelineConfig(
      logIdField = opt.getOrElse("log-id-field", "log_id"),
      logTypeField = opt.getOrElse("log-type-field", "log_type"),
      logTimestampField = opt.getOrElse("timestamp-field", "time"),
      logTypeUnknownPrefix = opt.getOrElse("unknown-prefix", "unknown"),
      logTypeWhitelist = opt.get("whitelist").map(_.split(",").toSet),
      indexNamePrefix = opt.getOrElse("index-prefix", "logs"),
      timezone = opt.getOrElse("timezone", "UTC"),
      deadLetterPath = opt.getOrElse("dead-letter", "/tmp/graft/dlq"),
      sourceBatchSize = opt.getOrElse("batch-size", "100").toInt,
      startingPosition = opt.getOrElse("starting-position", "TRIM_HORIZON"),
      sourceShards = opt.getOrElse("shards", "4").toInt)

    // reuse an active session (e.g. under test / spark-shell); only stop
    // a session this run created
    val ownSession = SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Sink: real HTTP _bulk when an endpoint is given (SigV4 creds from the
    // standard AWS env vars, like the reference), NDJSON files otherwise.
    val transport = opt.get("es-endpoint") match {
      case Some(ep) =>
        // fail fast on PARTIAL credentials: silently sending unsigned
        // requests would surface as confusing 403s mid-stream
        val ak = sys.env.get("AWS_ACCESS_KEY_ID")
        val sk = sys.env.get("AWS_SECRET_ACCESS_KEY")
        val region = sys.env.get("AWS_REGION").orElse(sys.env.get("AWS_DEFAULT_REGION"))
        val creds = (ak, sk) match {
          case (Some(a), Some(s)) =>
            val r = region.getOrElse(sys.error(
              "AWS credentials present but no AWS_REGION/AWS_DEFAULT_REGION set"))
            Some(graft.sink.SigV4Credentials(a, s, r,
              sessionToken = sys.env.get("AWS_SESSION_TOKEN")))
          case (None, None) => None
          case _ => sys.error(
            "incomplete AWS credentials: need both AWS_ACCESS_KEY_ID and AWS_SECRET_ACCESS_KEY")
        }
        Pipeline.httpTransport(ep, creds)
      case None => Pipeline.fileTransport(bulkOut)
    }

    def streamSource() = opt.getOrElse("source", "json") match {
      case "kinesis" => StreamingPipeline.kinesisShimStream(spark, input, cfg)
      case "json" => spark.readStream.schema(Schemas.envelopeJson).json(input)
        .withColumn("data", unbase64(col("data")))
      case other => sys.error(s"unknown --source $other (json|kinesis)")
    }

    opt.getOrElse("mode", "batch") match {
      case "batch" =>
        val envelopes = spark.read.schema(Schemas.envelopeJson).json(input)
          .withColumn("data", unbase64(col("data")))
        val res = Pipeline.runBatch(envelopes, cfg, transport)
        println(s"pushed=${res.pushed} failed=${res.failed} " +
          s"rejected=${res.rejected} dropped=${res.dropped}")
      case "stream" =>
        val checkpoint = opt.getOrElse("checkpoint", "/tmp/graft/ckpt")
        val q = StreamingPipeline.run(streamSource(), cfg, transport, checkpoint)
        q.awaitTermination()
      case other => sys.error(s"unknown --mode $other (batch|stream)")
    }
    if (ownSession) spark.stop()
  }
}
