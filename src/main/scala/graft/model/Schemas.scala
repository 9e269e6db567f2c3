package graft.model

import org.apache.spark.sql.types._
import graft.config.PipelineConfig

/** Schemas for the streaming-router data model (SURVEY.md §1).
  *
  * The payload schema is dynamic — contract-on-read with exactly three
  * configurable fields (reference: lambda/main.py:36-38); everything else
  * rides through opaquely in the raw JSON string.
  */
object Schemas {

  /** Kinesis record envelope (FIXTURES.md §A; reference lambda/main.py:69).
    * `data` is the base64-decoded payload bytes (possibly gzip / KPL
    * aggregate / CloudWatch Logs subscription bundle). */
  val envelope: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrival", TimestampType),
    StructField("data", BinaryType)
  ))

  /** JSON-lines form of the envelope as produced by the Kinesis event
    * source mapping: `data` still base64 text (reference README.md:9). */
  val envelopeJson: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrival", TimestampType),
    StructField("data", StringType)
  ))

  /** CloudWatch Logs subscription-filter bundle (reference README.md:10).
    * Each logEvents[i].message is an independent payload; CONTROL_MESSAGE
    * bundles are skipped. */
  val cloudWatchLogs: StructType = StructType(Seq(
    StructField("messageType", StringType),
    StructField("owner", StringType),
    StructField("logGroup", StringType),
    StructField("logStream", StringType),
    StructField("subscriptionFilters", ArrayType(StringType)),
    StructField("logEvents", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("timestamp", LongType),
      StructField("message", StringType)
    ))))
  ))

  /** Name of the corrupt-record column used to distinguish not-JSON
    * payloads (routed to the dead-letter channel per README contract,
    * SURVEY.md F7) from JSON payloads missing required fields. */
  val corruptField = "_corrupt"

  /** Core contract-on-read schema, built from the configured field names
    * (dynamic schema, SURVEY.md §1.2). The timestamp stays a string here;
    * lenient parsing happens in the router (SURVEY.md §2.3 P3). */
  def core(cfg: PipelineConfig): StructType = StructType(Seq(
    StructField(cfg.logTypeField, StringType),
    StructField(cfg.logTimestampField, StringType),
    StructField(cfg.logIdField, StringType),
    StructField(corruptField, StringType)
  ))
}
