package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig

/** E1–E5 shaping / projection (SURVEY.md §2.4). */
object Enrich {

  /** E2: daily index name `{prefix}-{log_type}-{yyyyMMdd}` from the
    * record's EVENT time under the configured timezone (reference
    * lambda/main.py:112-114, TZ var main.tf:43). Computed per-row — no
    * shuffle; the daily granularity also makes it a natural sink partition
    * key at scale. `from_utc_timestamp` keeps the result independent of
    * `spark.sql.session.timeZone` (sessions are pinned to UTC). */
  def indexName(cfg: PipelineConfig, typeCol: Column, tsCol: Column): Column =
    concat_ws("-", lit(cfg.indexNamePrefix), typeCol,
      date_format(from_utc_timestamp(tsCol, cfg.timezone), "yyyyMMdd"))

  def withIndexName(df: DataFrame, cfg: PipelineConfig): DataFrame =
    df.withColumn("index_name", indexName(cfg, col("log_type"), col("event_ts")))

  /** E3 (+F5 fix): bulk-action metadata line. The reference emits
    * `{"_index":…,"_type":"_doc","_source":…}` with no `_id`
    * (lambda/main.py:116 — duplicate docs on redelivery); we set
    * `_id = log_id` so at-least-once replay is idempotent (SURVEY.md §7.3).
    * `legacyType = true` restores the reference's ES 7.x `_type: "_doc"`
    * field byte-for-byte (off by default: ES 8+ rejects it). */
  def actionMeta(df: DataFrame, legacyType: Boolean = false): DataFrame = {
    val fields =
      if (legacyType)
        Seq(col("index_name").as("_index"), lit("_doc").as("_type"), col("log_id").as("_id"))
      else
        Seq(col("index_name").as("_index"), col("log_id").as("_id"))
    df.withColumn("action_meta", to_json(struct(struct(fields: _*).as("index"))))
  }

  /** E5: number of 500-action bulk chunks a batch needs per index
    * (reference BULK_CHUNK_SIZE, lambda/main.py:30,132). Exposed as a
    * query/metric; the physical chunking happens in the sink. */
  def chunkCount(nActions: Column, chunkSize: Int): Column =
    ceil(nActions.cast("double") / chunkSize).cast("long")
}
