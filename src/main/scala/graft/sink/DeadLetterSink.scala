package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig

/** K3/K4: dead-letter capture as gzip NDJSON, laid out like the reference's
  * S3 keys `{prefix}/{log_type}/YYYY-MM/DD/...` (reference README.md:13,
  * lambda/main.py:118-120,161-172) via Hive-style partitioning.
  *
  * Fixes F3 (single flush, not double) and F4 (skip-if-empty): an empty
  * DataFrame writes nothing — `partitionBy` produces no partition dirs for
  * zero rows, so no empty objects appear.
  *
  * Partitioning by (log_type, ym, dd) keeps 100 TB-scale dead-letter scans
  * prunable by type and day without reading the payloads.
  */
object DeadLetterSink {

  /** Write failed-validation records (K3). Uses the record's own event time
    * when parseable, else the processing date — matching the reference,
    * which keys failure objects by wall clock (lambda/main.py:164-169). */
  def writeFailed(failed: DataFrame, cfg: PipelineConfig, reason: String): Unit =
    write(failed.select(col("log_type"), col("event_ts"), col("payload")),
      s"${cfg.deadLetterPath}/$reason")

  /** Write ES-rejected actions (K4). */
  def writeRejected(rejected: DataFrame, cfg: PipelineConfig): Unit =
    write(
      rejected.select(
        col("indexName").as("log_type"),
        lit(null).cast("timestamp").as("event_ts"),
        col("source").as("payload")),
      s"${cfg.deadLetterPath}/es_rejected")

  private def write(df: DataFrame, path: String): Unit = {
    val keyed = df
      .withColumn("_t", coalesce(col("event_ts"), current_timestamp()))
      .withColumn("ym", date_format(col("_t"), "yyyy-MM"))
      .withColumn("dd", date_format(col("_t"), "dd"))
      .select("log_type", "ym", "dd", "payload")
    keyed.write
      .partitionBy("log_type", "ym", "dd")
      .option("compression", "gzip")
      .mode(SaveMode.Append)
      .text(path)
  }
}
