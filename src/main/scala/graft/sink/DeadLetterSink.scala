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

  /** Write ES-rejected actions with the reference's exact key layout:
    * one gzip object named by processing wall clock,
    * `{prefix}/%Y-%m/%d/%Y-%m-%d-%H:%M:%S.gz`
    * (reference lambda/main.py:163-172), each line a JSON error record
    * shaped like a `BulkIndexError.errors` entry (`{"index":{"_index":…,
    * "_id":…,"error":…,"data":…}}`).
    *
    * Divergence, by necessity: the reference has exactly one writer (the
    * Lambda invocation), we have one per partition — so the file name gains
    * a `-p{partitionId}` suffix for uniqueness under parallel writers.
    * Empty partitions write nothing (the F4 skip-if-empty fix; the
    * reference unconditionally writes even a zero-record object).
    *
    * @param clockMillis injectable processing clock for deterministic tests
    */
  def writeRejectedReferenceLayout(
      rejected: org.apache.spark.sql.Dataset[graft.sink.BulkReject],
      cfg: PipelineConfig,
      clockMillis: () => Long = () => System.currentTimeMillis()): Unit = {
    val root = s"${cfg.deadLetterPath}/es_rejected"
    // ship the session's Hadoop configuration to executors — a fresh
    // Configuration() would drop every spark.hadoop.* setting (object-store
    // credentials/endpoints), exactly where this sink is meant to write
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      rejected.sparkSession.sparkContext.hadoopConfiguration)
    rejected.foreachPartition { (it: Iterator[BulkReject]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val now = java.time.Instant.ofEpochMilli(clockMillis())
          .atZone(java.time.ZoneOffset.UTC)
        val key = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM'/'dd'/'yyyy-MM-dd-HH:mm:ss").format(now)
        // taskAttemptId disambiguates batches landing in the same wall-
        // clock second (the reference has one writer per invocation; a
        // fast streaming trigger would otherwise overwrite prior rejects)
        val path = new org.apache.hadoop.fs.Path(
          s"$root/$key-p$pid-a${tc.taskAttemptId()}.gz")
        // the ':' the reference puts in its key is legal on object stores but
        // trips ChecksumFileSystem's relative .crc sibling path — unwrap to
        // the raw FS (object stores don't write .crc files anyway)
        val fs = path.getFileSystem(hadoopConf.value) match {
          case cfs: org.apache.hadoop.fs.ChecksumFileSystem => cfs.getRawFileSystem
          case other => other
        }
        val out = new java.util.zip.GZIPOutputStream(fs.create(path, false))
        try {
          // stream line-by-line: buffering a partition's rejects into one
          // string is unbounded exactly when rejection is systemic
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          var first = true
          it.foreach { r =>
            if (!first) out.write('\n')
            first = false
            val e = BulkSink.jsonEscape _
            out.write(
              s"""{"index":{"_index":"${e(r.indexName)}","_id":"${e(r.id)}","status":${r.status},"error":"${e(r.error)}","data":${r.source}}}"""
                .getBytes(utf8))
          }
        } finally out.close()
      }
    }
  }

  private def write(df: DataFrame, path: String): Unit = {
    val keyed = df
      .withColumn("_t", coalesce(col("event_ts"), current_timestamp()))
      .withColumn("ym", date_format(col("_t"), "yyyy-MM"))
      .withColumn("dd", date_format(col("_t"), "dd"))
      .select("log_type", "ym", "dd", "payload")
    // co-locate each (log_type, ym, dd) directory into one task before
    // the partitioned write: without this every upstream partition cuts
    // a file into every directory it touches — at 32 source partitions ×
    // ~200 date dirs that is thousands of kilobyte gzip objects and a
    // file-commit storm per run (the row's bench spread), and at 100 TB
    // it is the classic small-file explosion. One shuffle on the
    // partition key buys one object per directory; dead-letter rows are
    // a trickle relative to the corpus, so per-key skew is bounded by
    // the layout's own day granularity.
    keyed.repartition(col("log_type"), col("ym"), col("dd")).write
      .partitionBy("log_type", "ym", "dd")
      .option("compression", "gzip")
      .mode(SaveMode.Append)
      .text(path)
  }
}
