package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass, bounded-state table profiling — the ANALYZE/data-quality
  * primitive: per column, the non-null count, null count, and a KMV
  * approximate-distinct estimate.
  *
  * One aggregation over one scan produces every column's statistics
  * simultaneously (an `array(struct(...))` + `explode` pivots the single
  * agg row into one output row per column — no per-column re-scan, no
  * driver collect). State per column is ≤ k retained hashes
  * ([[Sketch.kmvSketch]]), so profiling a 100 TB table costs one pass and
  * ships kilobytes per column across the exchange.
  *
  * Distinct estimates are computed only for columns in `distinctCols` —
  * callers restrict to types whose string rendering is engine-portable
  * (integers/strings); other columns report NULL. The estimate is the
  * md5-based KMV, so an external engine reproduces it bit-for-bit.
  */
object Profile {

  def table(df: DataFrame, distinctCols: Set[String], k: Int = 64): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls")) ++
        (if (distinctCols(c)) Seq(Sketch.kmvSketch(col(c), k).as(s"${c}__kmv"))
         else Nil)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__n").as("n_non_null"),
          col(s"${c}__nulls").as("n_nulls"),
          (if (distinctCols(c))
             round(Sketch.kmvEstimate(col(s"${c}__kmv"), k), 2)
           else lit(null).cast("double")).as("approx_distinct"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
