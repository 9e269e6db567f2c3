package graft.config

/** Typed pipeline configuration.
  *
  * Mirrors the reference's 12 Terraform variables compiled into Lambda env
  * vars (reference: variables.tf:1-108, main.tf:41-54, lambda/main.py:33-58),
  * with the empty-whitelist defect fixed (SURVEY.md F6): `None` = allow all,
  * `Some(set)` = only those log types pass.
  *
  * All field names are injectable, like the reference's LOG_ID_FIELD /
  * LOG_TYPE_FIELD / LOG_TIMESTAMP_FIELD env vars (lambda/main.py:36-38).
  */
final case class PipelineConfig(
    logIdField: String = "log_id",
    logTypeField: String = "log_type",
    logTimestampField: String = "time",
    logTypeUnknownPrefix: String = "unknown",
    logTypeWhitelist: Option[Set[String]] = None,
    indexNamePrefix: String = "logs",
    /** IANA timezone used for the daily-index date (reference TZ var,
      * variables.tf:1-4); applied via from_utc_timestamp so it is
      * independent of spark.sql.session.timeZone. */
    timezone: String = "UTC",
    /** Root for dead-letter output (reference: failed_log_s3_bucket/prefix,
      * main.tf:50-51). Local dir or any Hadoop-FS URI. */
    deadLetterPath: String = "/tmp/graft-deadletter",
    /** Bulk actions per HTTP _bulk call (reference BULK_CHUNK_SIZE=500,
      * lambda/main.py:30). */
    bulkChunkSize: Int = 500,
    /** Event-source batch size: max records per shard per micro-batch
      * (reference ESM batch_size, main.tf:58-64, variables.tf:16-18). */
    sourceBatchSize: Int = 100,
    /** Where a fresh (checkpoint-less) stream starts: TRIM_HORIZON = oldest
      * record per shard, LATEST = only new records (reference
      * starting_position, variables.tf:54-57). */
    startingPosition: String = "TRIM_HORIZON",
    /** Simulated shard count for the Kinesis-shaped shim source. */
    sourceShards: Int = 4,
    /** ES 7.x wire parity: emit `"_type":"_doc"` in every bulk action meta
      * exactly like the reference (lambda/main.py:116). Off by default —
      * ES 8+ rejects `_type`. */
    esLegacyType: Boolean = false
) {
  require(bulkChunkSize > 0, "bulkChunkSize must be positive")
  require(sourceBatchSize > 0, "sourceBatchSize must be positive")
  require(Set("TRIM_HORIZON", "LATEST").contains(startingPosition),
    "startingPosition must be TRIM_HORIZON or LATEST")

  /** Whitelist normalization: an empty set behaves as allow-all, which is
    * the documented intent of the reference's empty env var (README.md:76)
    * that its code gets wrong (SURVEY.md F6). */
  def effectiveWhitelist: Option[Set[String]] =
    logTypeWhitelist.filter(_.nonEmpty)
}
