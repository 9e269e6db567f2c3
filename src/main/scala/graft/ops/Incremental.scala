package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for algebraic rollups.
  *
  * The 100-TB aggregation story is NOT "rescan history every day": it is
  * "keep the rollup as mergeable partial state and fold each new (or
  * late-arriving) delta in at O(|MV| + |delta|)". Works for any algebraic
  * measure — (count, sum, min, max) here; avg derives as sum/count at read
  * time. The merge is a union + re-aggregation on the MV key, so Spark
  * plans it as one hash aggregate over inputs that are each tiny compared
  * to history; with both sides bucketed on the key it needs no shuffle at
  * all. The same shape maintains the sketch columns (KMV/CMS/MG are
  * likewise mergeable — the graft.functions package), which is why the
  * engine's sketch family is TypedImperativeAggregate throughout.
  */
object Incremental {

  /** Partial daily rollup of one slice: mergeable (count,sum,min,max) per
    * (event_type, day). Runs once per ingested slice, never re-runs. */
  def partialDaily(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"),
        min("value").as("mn"), max("value").as("mx"))

  /** Fold any number of partials (the standing MV + new deltas) into the
    * merged rollup: sum merges counts and sums, min/max merge themselves. */
  def merge(partials: DataFrame*): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy("event_type", "day")
      .agg(sum("n").as("n"), sum("sv").as("sv"),
        min("mn").as("mn"), max("mx").as("mx"))
}
