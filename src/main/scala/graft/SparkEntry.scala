package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.PipelineConfig
import graft.queries.{PipelineQueries, RelationalQueries, SimilarityQueries, TextQueries}
import graft.route.Router

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (pipeline parity)
  * plus the training-data-pipeline extensions (dedup / similarity / text /
  * multimodal). Every SQL-expressible query has a DuckDB oracle in
  * `oracleSql` with identical column names; hash/LSH/ANN operators are
  * declared without oracle (driver rows-only check).
  */
object SparkEntry {

  /** Flagship: the full decode→route→enrich pipeline replaying the events
    * table as Kinesis-style envelopes (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    val routed = Pipeline.transform(
      Pipeline.eventsAsEnvelopes(spark, "/root/testdata/sf0.001"), PipelineConfig())
    Router.good(routed).select("index_name", "log_type", "log_id", "event_ts", "payload")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries

  /** Queries that are deliberate EXACT DIAGNOSTICS, not scale paths: their
    * cost model is quadratic-with-corpus by construction and they exist to
    * calibrate the sub-quadratic counterparts (e.g. `sim_threshold_pairs`
    * measures the exact threshold-pair set that `emb_near_dups` — the
    * production path — approximates). `Similarity.bruteForceTopK` refuses
    * corpus-scale query sets unless explicitly opted in. */
  val diagnostic: Set[String] = Set("sim_threshold_pairs")

  def oracleSql: Map[String, String] =
    PipelineQueries.sql ++ RelationalQueries.sql ++
      TextQueries.sql ++ SimilarityQueries.sql
}
