package graft.enrich

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.PipelineConfig

/** E2 index naming (timezone edges) + E5 chunk plan (SURVEY.md §2.4). */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def nameFor(cfg: PipelineConfig, iso: String): String =
    Seq(("nginx", iso)).toDF("log_type", "ts_str")
      .withColumn("event_ts", to_timestamp(col("ts_str")))
      .select(Enrich.indexName(cfg, col("log_type"), col("event_ts")))
      .as[String].head()

  test("index name is {prefix}-{type}-{yyyyMMdd} from event time") {
    assert(nameFor(PipelineConfig(indexNamePrefix = "dev-logs"), "2020-09-15T10:21:33Z")
      == "dev-logs-nginx-20200915")
  }

  test("timezone shifts the daily boundary (TZ var semantics)") {
    val utc = PipelineConfig(timezone = "UTC")
    val tokyo = PipelineConfig(timezone = "Asia/Tokyo")
    // 2020-09-15T23:30Z is already 09-16 in Tokyo (+9)
    assert(nameFor(utc, "2020-09-15T23:30:00Z") == "logs-nginx-20200915")
    assert(nameFor(tokyo, "2020-09-15T23:30:00Z") == "logs-nginx-20200916")
    // exact midnight edge
    assert(nameFor(tokyo, "2020-09-15T15:00:00Z") == "logs-nginx-20200916")
    assert(nameFor(tokyo, "2020-09-15T14:59:59Z") == "logs-nginx-20200915")
  }

  test("DST transition: daily boundary follows the zone's wall clock") {
    val ny = PipelineConfig(timezone = "America/New_York")
    // 2020-11-01: EDT→EST (clocks back at 06:00Z). 03:59Z = 23:59 EDT Oct 31
    assert(nameFor(ny, "2020-11-01T03:59:00Z") == "logs-nginx-20201031")
    // 05:00Z = 01:00 EDT Nov 1 (still before the fall-back)
    assert(nameFor(ny, "2020-11-01T05:00:00Z") == "logs-nginx-20201101")
    // 07:00Z = 02:00 EST Nov 1 (after fall-back) — same local day
    assert(nameFor(ny, "2020-11-01T07:00:00Z") == "logs-nginx-20201101")
  }

  test("offset timestamps normalize before the day is derived") {
    // 10:21+09:00 == 01:21Z → same UTC day
    assert(nameFor(PipelineConfig(), "2020-09-15T10:21:33.123456+09:00")
      == "logs-nginx-20200915")
  }

  test("chunk plan: 501 actions → 2 chunks of ≤500 (E5)") {
    val df = Seq(1L, 499L, 500L, 501L, 1001L).toDF("n")
    val chunks = df.select(Enrich.chunkCount(col("n"), 500)).as[Long].collect().toSeq
    assert(chunks == Seq(1L, 1L, 1L, 2L, 3L))
  }

  test("action meta carries _index and _id (F5 fix)") {
    val df = Seq(("logs-nginx-20200915", "id-1")).toDF("index_name", "log_id")
    val meta = Enrich.actionMeta(df).select("action_meta").as[String].head()
    assert(meta == """{"index":{"_index":"logs-nginx-20200915","_id":"id-1"}}""")
  }
}
