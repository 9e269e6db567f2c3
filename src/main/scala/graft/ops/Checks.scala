package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated in ONE aggregation over
  * one scan — the table-level verification step of a data pipeline
  * (the Deequ idea, re-expressed as plain Catalyst aggregates).
  *
  * Every check compiles to an aggregate expression; `run` fuses all of
  * them into a single `agg` and pivots the one result row into one output
  * row per check via the array-of-struct explode (same machinery as
  * [[Profile]]). Checking N constraints on a 100 TB table costs one scan
  * and one tiny exchange, not N jobs.
  *
  * [[Uniqueness]] uses exact `countDistinct` (Spark plans multi-distinct
  * with one Expand — still one scan, but input×distinct-count rows into
  * the first aggregate); [[ApproxUniqueness]] is the bounded-state
  * alternative for when that cost matters, at KMV's ~1/sqrt(k-2) error.
  */
object Checks {

  sealed trait Check {
    def kind: String
    def column: String
    def threshold: Double
    /** aggregate expression producing the metric in [0, 1] */
    def metric: Column
  }

  /** fraction of rows with a non-null value ≥ threshold */
  final case class Completeness(column: String, threshold: Double) extends Check {
    val kind = "completeness"
    def metric: Column = try_divide(
      count(col(column)).cast("double"), count(lit(1)).cast("double"))
  }

  /** exact distinct values / non-null values ≥ threshold */
  final case class Uniqueness(column: String, threshold: Double) extends Check {
    val kind = "uniqueness"
    def metric: Column = try_divide(
      countDistinct(col(column)).cast("double"), count(col(column)).cast("double"))
  }

  /** KMV-estimated uniqueness — bounded state, no Expand; the 100 TB
    * default when the column is known to be far from the threshold. */
  final case class ApproxUniqueness(column: String, threshold: Double,
                                    k: Int = 1024) extends Check {
    val kind = "approx_uniqueness"
    def metric: Column = try_divide(
      Sketch.kmvEstimate(Sketch.kmvSketch(col(column), k), k),
      count(col(column)).cast("double"))
  }

  /** Scale-aware uniqueness selection — the 100 TB DEFAULT: exact
    * [[Uniqueness]] only while the table's metadata-known row count keeps
    * the multi-distinct Expand trivially cheap (≤ `exactMaxRows`, default
    * 4·k), bounded-state [[ApproxUniqueness]] above it. The row count is
    * an ARGUMENT, not a probe: at scale it is free catalog/parquet-footer
    * metadata ([[graft.Tables.footerRowCount]]), and threading it keeps
    * this a pure, spec-able selection function. Exact-at-any-size stays
    * available by constructing [[Uniqueness]] directly (the opt-in).
    *
    * The KMV contract keeps the switch oracle-checkable: below k distinct
    * values the sketch holds ALL of them, so the approximate metric is
    * bit-for-bit the exact ratio; above k it is the deterministic
    * (k−1)·2⁶⁴/H_k estimate any engine reproduces from the same md5
    * hashes. */
  def uniquenessFor(rows: Long, column: String, threshold: Double,
                    exactMaxRows: Long = 4096, k: Int = 1024): Check =
    if (rows <= exactMaxRows) Uniqueness(column, threshold)
    else ApproxUniqueness(column, threshold, k)

  /** fraction of non-null values inside [lo, hi] ≥ threshold */
  final case class FractionBetween(column: String, lo: Double, hi: Double,
                                   threshold: Double) extends Check {
    val kind = "fraction_between"
    def metric: Column = try_divide(
      sum(when(col(column).between(lo, hi), 1L).otherwise(0L)).cast("double"),
      count(col(column)).cast("double"))
  }

  /** fraction of non-null values in the allowed set ≥ threshold */
  final case class FractionInSet(column: String, allowed: Seq[String],
                                 threshold: Double) extends Check {
    val kind = "fraction_in_set"
    def metric: Column = try_divide(
      sum(when(col(column).isin(allowed: _*), 1L).otherwise(0L)).cast("double"),
      count(col(column)).cast("double"))
  }

  /** One row per check: (kind, col_name, metric, threshold, passed). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"_m$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.kind).as("kind"), lit(c.column).as("col_name"),
          round(col(s"_m$i"), 6).as("metric"),
          lit(c.threshold).as("threshold"),
          // empty input → null metric; a gate must FAIL, not pass vacuously
          coalesce(col(s"_m$i") >= c.threshold, lit(false)).as("passed"))
      }: _*)).as("c"))
      .select("c.*")
  }
}
