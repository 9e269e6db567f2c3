package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Exact per-group heavy hitters with bounded intermediate state — the
  * corpus-scale "find the boilerplate / dominant values" operator.
  *
  * Naive `groupBy(group, value).count()` ships one row per DISTINCT
  * (group, value) across the exchange — at 100 TB the token vocabulary
  * alone makes that the dominant shuffle. This is two-phase instead:
  *
  *  1. candidates: a Misra-Gries summary per group
  *     ([[graft.functions.MisraGries]], bounded TypedImperativeAggregate,
  *     ≤ k counters per group cross the exchange) — guaranteed to contain
  *     every value with frequency > n/k, so with k ≥ 2/support it is a
  *     strict superset of the answer; group totals ride in the same
  *     aggregation (no extra pass);
  *  2. exact recount of the candidate set only: the fact rows are pruned
  *     by a BROADCAST semi-join on (group, value) — the filter sits below
  *     the exchange, so only candidate-value rows shuffle — then counted
  *     exactly.
  *
  * The composition is exact and layout-invariant even though MG's internal
  * counts are arrival-order-dependent: the order affects only WHICH
  * superset survives phase 1, never the phase-2 counts or the final
  * support filter.
  */
object HeavyHitters {

  /** @param support minimum frequency (fraction of the group's rows, on
    *                [1e-6, 0.5]) for a value to qualify
    * @return (groupCol, valueCol, cnt, freq) — exact counts, freq rounded
    *         to 6 places */
  def frequentValues(df: DataFrame, groupCol: String, valueCol: String,
                     support: Double): DataFrame = {
    require(support >= 1e-6 && support <= 0.5,
      s"support must be in [1e-6, 0.5], got $support")
    val k = math.max(8, math.ceil(2.0 / support).toInt)
    val vals = df
      .select(col(groupCol).as("_g"), col(valueCol).cast("string").as("_v"))
      .filter(col("_v").isNotNull)
    // one shuffle: candidates AND group totals from the same aggregation
    val summary = vals.groupBy("_g")
      .agg(MisraGries.mg_candidates(col("_v"), k).as("_cands"),
        count(lit(1)).as("_total"))
    val cands = summary.select(col("_g"), col("_total"),
      explode(col("_cands")).as("_v"))
    // exact recount of candidates only; broadcast prune below the exchange
    vals.join(broadcast(cands), Seq("_g", "_v"), "inner")
      .groupBy("_g", "_v", "_total")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= col("_total") * lit(support))
      .select(col("_g").as(groupCol), col("_v").as(valueCol), col("cnt"),
        round(col("cnt") / col("_total"), 6).as("freq"))
  }
}
