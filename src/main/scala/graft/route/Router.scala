package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.config.PipelineConfig
import graft.model.Schemas

/** P1–P6 parse / validate / route (SURVEY.md §2.3).
  *
  * Implements the README contract of the reference (reference README.md:9-14,
  * lambda/main.py:90-106), with its defects fixed (SURVEY.md §2.8):
  * non-JSON payloads are dead-lettered rather than dropped (F7), and an
  * empty whitelist means allow-all (F6).
  *
  * Routing is per-row `when/otherwise` — no shuffle, stays in one
  * whole-stage-codegen span, and the split into good/failed/dropped is a
  * partitioned filter that Catalyst pushes into the scan where possible.
  */
object Router {

  object Route {
    val Good = "good"
    val NotJson = "failed:not_json"
    val MissingType = "failed:missing_type"
    val MissingTimestamp = "failed:missing_timestamp"
    val BadTimestamp = "failed:bad_timestamp"
    val NotWhitelisted = "dropped:not_whitelisted"
  }

  /** P3: lenient timestamp ladder standing in for the reference's
    * `dateutil.parser.parse` contract ("any timestamp supported by
    * dateutil", reference README.md:14). Documented supported formats, in
    * precedence order: ISO-8601 / Spark-native (with offsets, T or space),
    * `yyyy/MM/dd HH:mm:ss`, Apache CLF `dd/MMM/yyyy:HH:mm:ss Z`,
    * compact `yyyyMMdd'T'HHmmss[X]`, day-name forms (RFC-1123 / asctime /
    * date(1) / full names, via [[graft.functions.DateUtilTimestamp]] —
    * Spark's own patterns can't parse 'EEE'), and bare epoch
    * seconds / milliseconds. Unparseable → null → dead-letter
    * (`timestamp_required=True`, reference lambda/main.py:105). */
  def lenientTimestamp(c: Column): Column =
    // First-character dispatch: the day-name forms are the only
    // letter-leading formats, and DateUtilParse rejects digit-leading
    // strings up front — so the split is semantics-preserving, and a
    // day-name row skips five futile try_to_timestamp attempts (each a
    // thrown-and-swallowed parse exception, the dominant cost of an
    // RFC-timestamp replay).
    when(c.rlike("^\\s*[A-Za-z]"),
      graft.functions.GraftFunctions.dateutil_timestamp(c))
    .otherwise(coalesce(
      try_to_timestamp(c),
      try_to_timestamp(c, lit("yyyy/MM/dd HH:mm:ss")),
      try_to_timestamp(c, lit("dd/MMM/yyyy:HH:mm:ss Z")),
      try_to_timestamp(c, lit("yyyyMMdd'T'HHmmssX")),
      try_to_timestamp(c, lit("yyyyMMdd'T'HHmmss")),
      when(c.rlike("^\\d{13}$"), timestamp_millis(c.cast(LongType))),
      when(c.rlike("^\\d{10}$"), timestamp_seconds(c.cast(LongType)))
    ))

  /** Parse + validate + route. Appends:
    *   - `log_type`: routing key, `cfg.logTypeUnknownPrefix` when absent (P5)
    *   - `log_id`:   unique-ID field (P6), may be null
    *   - `event_ts`: parsed event time (P3), null when unparseable
    *   - `route`:    one of [[Route]] (P2/P4)
    * Every input row lands in exactly one route (totality is property-tested).
    */
  def route(df: DataFrame, cfg: PipelineConfig, payloadCol: String = "payload",
            fence: Boolean = true): DataFrame = {
    // Parse ONCE in its own projection. All downstream field extractions
    // happen in a single select that references `_core` many times — a
    // withColumn chain would let CollapseProject inline the (expensive,
    // codegen-fallback) from_json into every consumer, one duplication per
    // step (observed: 15 copies per row in the final plan). Keeping every
    // consumer in one projection makes the multi-use visible to Catalyst,
    // which then leaves the parse materialized.
    val parsed = df.withColumn("_core",
      from_json(col(payloadCol), Schemas.core(cfg),
        Map("columnNameOfCorruptRecord" -> Schemas.corruptField)))

    val rawType = col("_core").getField(cfg.logTypeField)
    val rawTs = col("_core").getField(cfg.logTimestampField)
    val corrupt = col("_core").getField(Schemas.corruptField)
    val eventTs = lenientTimestamp(rawTs)

    val whitelisted: Column = cfg.effectiveWhitelist match {
      case Some(wl) => rawType.isin(wl.toSeq: _*)
      case None => lit(true)
    }

    val routed = parsed
      .select(col("*"),
        coalesce(rawType, lit(cfg.logTypeUnknownPrefix)).as("log_type"),
        col("_core").getField(cfg.logIdField).as("log_id"),
        eventTs.as("event_ts"),
        when(corrupt.isNotNull || col("_core").isNull, Route.NotJson)
          .when(rawType.isNull, Route.MissingType)
          .when(rawTs.isNull, Route.MissingTimestamp)
          .when(eventTs.isNull, Route.BadTimestamp)
          .when(!whitelisted, Route.NotWhitelisted)
          .otherwise(Route.Good).as("route"))
      .drop("_core")
    // Fence: without it, any downstream filter on route/event_ts/log_type
    // is pushed below this projection with the defining expressions
    // substituted — ~20 from_json copies + two timestamp ladders in the
    // Filter, then a re-parse above (see graft.plans.OptimizationBarrier).
    // Filter source columns BEFORE route() if scan pushdown is needed — or
    // pass fence = false when a downstream source-column filter must keep
    // reaching the scan and the derived columns go unfiltered.
    if (fence) graft.plans.OptimizationBarrier.fence(routed) else routed
  }

  /** [[route]] with Spark 4 VARIANT as the parse carrier (SURVEY.md §1.2):
    * `try_parse_json` once into an open-schema variant, contract fields
    * extracted with `variant_get`. Routing semantics are identical to
    * [[route]] — including the non-object edge: a payload that parses but
    * is a JSON scalar/array/null routes `failed:not_json`, exactly like
    * from_json's corrupt channel; `schema_of_variant` (per-row string
    * build) runs ONLY on rows whose `log_type` extract came back null, so
    * the good-path cost is parse + three binary-encoded field gets.
    *
    * Measured head-to-head on the sf0.1 replay (README "Variant router"):
    * kept as an ALTERNATIVE for open-schema consumers that go on to
    * extract many ad-hoc props paths (one parse, N cheap gets); not the
    * default route, whose fixed 3-field contract is what from_json's
    * schema projection is optimal for. */
  def routeVariant(df: DataFrame, cfg: PipelineConfig,
                   payloadCol: String = "payload",
                   fence: Boolean = true): DataFrame = {
    val parsed = df.withColumn("_v", try_parse_json(col(payloadCol)))
    val v = col("_v")
    val rawType = variant_get(v, s"$$.${cfg.logTypeField}", "string")
    val rawTs = variant_get(v, s"$$.${cfg.logTimestampField}", "string")
    val eventTs = lenientTimestamp(rawTs)
    // object-ness is only decisive when the type field is absent — a JSON
    // scalar/array/null must dead-letter as not_json, not missing_type
    val isObject = schema_of_variant(v).startsWith("OBJECT")

    val whitelisted: Column = cfg.effectiveWhitelist match {
      case Some(wl) => rawType.isin(wl.toSeq: _*)
      case None => lit(true)
    }

    val routed = parsed
      .select(col("*"),
        coalesce(rawType, lit(cfg.logTypeUnknownPrefix)).as("log_type"),
        variant_get(v, s"$$.${cfg.logIdField}", "string").as("log_id"),
        eventTs.as("event_ts"),
        when(v.isNull, Route.NotJson)
          .when(rawType.isNull && !isObject, Route.NotJson)
          .when(rawType.isNull, Route.MissingType)
          .when(rawTs.isNull, Route.MissingTimestamp)
          .when(eventTs.isNull, Route.BadTimestamp)
          .when(!whitelisted, Route.NotWhitelisted)
          .otherwise(Route.Good).as("route"))
      .drop("_v")
    if (fence) graft.plans.OptimizationBarrier.fence(routed) else routed
  }

  /** The three disjoint channels of the routed stream. */
  def good(routed: DataFrame): DataFrame =
    routed.filter(col("route") === Route.Good)

  /** Dead-letter channel (validation failures; reference lambda/main.py:96-106). */
  def failed(routed: DataFrame): DataFrame =
    routed.filter(col("route").startsWith("failed:"))

  /** Whitelist rejects — intentionally discarded, not dead-lettered
    * (reference lambda/main.py:104). */
  def dropped(routed: DataFrame): DataFrame =
    routed.filter(col("route").startsWith("dropped:"))
}
