package graft.route

import graft.{SparkEntry, SparkSpec}

/** Plan-shape guards for the ingest edge (the reference's entire hot path):
  * the core `from_json` parse and the timestamp ladder must be evaluated
  * exactly once per row, even when route filters are composed downstream
  * (`Router.failed(...).where(event_ts isNotNull)`). Round-2 regression:
  * predicate pushdown substituted the defining aliases below the parse
  * projection — ~20 inlined `from_json` copies + two ladders in the Filter,
  * a measured 3.6× slowdown — now fenced by
  * [[graft.plans.OptimizationBarrier]]. */
class RouterPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The core-parse marker: only `Schemas.core`'s from_json carries the
    * corrupt-record option, so each occurrence is one parse evaluation. */
  private def coreParses(plan: String): Int =
    "columnNameOfCorruptRecord".r.findAllIn(plan).length

  /** The day-name parser appears once per ladder evaluation. */
  private def ladders(plan: String): Int =
    "dateutil_timestamp".r.findAllIn(plan).length

  for (q <- Seq("pipe_deadletter_layout", "pipe_unknown_prefix", "pipe_route_badmix")) {
    test(s"$q physical plan parses each payload exactly once") {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(coreParses(plan) == 1,
        s"expected exactly 1 core from_json in the $q plan, got ${coreParses(plan)}:\n$plan")
      // The ladder may appear at most twice textually in the single routed
      // projection (the `event_ts` alias + the route CASE arm); whole-stage
      // codegen's subexpression elimination evaluates it once. What must
      // never happen is ladder copies inside a Filter node.
      assert(ladders(plan) <= 2,
        s"timestamp ladder duplicated beyond the routed projection in $q:\n$plan")
      // Filter NODES only (tree-art prefix + "Filter"), not substrings like
      // "PushedFilters:" in scan lines or "subscriptionFilters" in schemas.
      val filterLines = plan.linesIterator
        .filter(_.replaceAll("^[\\s|:+*-]*", "").startsWith("Filter"))
        .mkString("\n")
      assert(!filterLines.contains("from_json"),
        s"route filter must reference attributes, not re-parse payloads:\n$filterLines")
    }
  }

  test("fence opt-out: unfenced route keeps source-column pushdown to the scan") {
    import org.apache.spark.sql.functions._
    val cfg = graft.config.PipelineConfig()
    val src = graft.Tables.events(spark, sf).select(
      col("user_id"),
      to_json(struct(
        col("event_type").as("log_type"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("time"),
        col("event_id").cast("string").as("log_id"))).as("payload"))
    def pushed(df: org.apache.spark.sql.DataFrame): String =
      "PushedFilters: \\[[^\\]]*\\]".r
        .findAllIn(df.queryExecution.executedPlan.toString).mkString("\n")
    val fenced = Router.route(src, cfg).where(col("user_id") === 7L)
    val unfenced = Router.route(src, cfg, fence = false).where(col("user_id") === 7L)
    assert(pushed(unfenced).contains("user_id"),
      s"unfenced route must let a source-column filter reach the scan:\n${pushed(unfenced)}")
    // the fenced contract: downstream filters stop at the barrier
    assert(!pushed(fenced).contains("user_id"))
    assert(unfenced.count() == fenced.count())
  }

  test("fence survives channel composition on a freshly routed frame") {
    import org.apache.spark.sql.functions._
    val cfg = graft.config.PipelineConfig()
    val env = graft.Pipeline.eventsAsEnvelopes(spark, sf)
    val routed = graft.Pipeline.transform(env, cfg)
    val composed = Router.good(routed)
      .where(col("event_ts").isNotNull && col("log_type").isNotNull)
      .select("log_id", "index_name")
    val plan = composed.queryExecution.executedPlan.toString
    assert(coreParses(plan) == 1, s"composition re-parses payloads:\n$plan")
    assert(composed.count() > 0)
  }
}
