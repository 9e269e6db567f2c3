package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.route.Router

/** K5 observability (SURVEY.md §2.5): the reference annotates each
  * invocation with total_actions / chunk counts via X-Ray subsegments
  * (reference lambda/main.py:122-143, main.tf:38-40). Spark-native
  * equivalent: `observe` metrics evaluated inline with the pass (no second
  * job over the data) — surfaced per micro-batch in
  * `StreamingQueryProgress.observedMetrics` and to QueryExecutionListeners
  * in batch mode. */
object Observability {

  val RouteMetrics = "graft_routes"

  /** Attach routing-channel counters to a routed stream/batch. */
  def observeRoutes(routed: DataFrame): DataFrame =
    routed.observe(RouteMetrics,
      count(when(col("route") === Router.Route.Good, 1)).as("good"),
      count(when(col("route").startsWith("failed:"), 1)).as("failed"),
      count(when(col("route").startsWith("dropped:"), 1)).as("dropped"),
      count(lit(1)).as("total"))
}
