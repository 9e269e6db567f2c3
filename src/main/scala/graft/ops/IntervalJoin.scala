package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pairs of rows with equal keys whose event times
  * lie within ± tolerance of each other.
  *
  * Spark plans a raw `|t_l − t_r| <= tol` predicate as a cross/nested-loop
  * join per key — quadratic in key frequency. Bucketing time into
  * tolerance-width bins makes it an equi-join: one side is exploded to its
  * bin and both neighbors, the other keeps its single bin, the join runs
  * on (key, bin), and the exact predicate filters the survivors. Each
  * true pair matches in EXACTLY one exploded bin (the right row's own),
  * so no post-join dedup is needed. Work per bucket is bounded by local
  * density × 3 — the property that holds at 100 TB where a naive range
  * join would not.
  */
object IntervalJoin {

  /** @return left row + right row columns (right renamed with `r_` prefix)
    *         for every pair with equal key and |Δt| <= toleranceMs
    *         (inclusive). */
  def within(left: DataFrame, right: DataFrame,
             leftKey: String, rightKey: String,
             leftTime: String, rightTime: String,
             toleranceMs: Long): DataFrame = {
    require(toleranceMs > 0)
    def binOf(t: Column): Column = floor(unix_micros(t) / lit(toleranceMs * 1000L))

    val l = left
      .withColumn("_bin0", binOf(col(leftTime)))
      .withColumn("_bin", explode(array(col("_bin0") - 1, col("_bin0"), col("_bin0") + 1)))
      .drop("_bin0")
    val r = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }.withColumn("_rbin", binOf(col(s"r_$rightTime")))

    l.join(r,
        col(leftKey) === col(s"r_$rightKey") && col("_bin") === col("_rbin") &&
          abs(unix_micros(col(leftTime)) - unix_micros(col(s"r_$rightTime")))
            <= lit(toleranceMs * 1000L))
      .drop("_bin", "_rbin")
  }

  /** Integer-value sibling of [[within]]: pairs with equal keys whose
    * numeric columns differ by at most `tolerance` (inclusive).
    *
    * Same bin-explode construction — a raw `|v_l − v_r| <= tol` is a
    * non-equi predicate, so Spark would fall back to key-equality plus
    * post-filter: all-pairs within each key. Bucketing the value into
    * tolerance-width bins restores an equi-join on (key, bin); each true
    * pair matches in exactly one exploded bin (the right row's own), so
    * no dedup is needed and per-bucket work is local density × 3. */
  def withinValue(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftVal: String, rightVal: String,
                  tolerance: Long): DataFrame = {
    require(tolerance > 0)
    def binOf(v: Column): Column = floor(v / lit(tolerance)).cast("long")

    val l = left
      .withColumn("_bin0", binOf(col(leftVal)))
      .withColumn("_bin", explode(array(col("_bin0") - 1, col("_bin0"), col("_bin0") + 1)))
      .drop("_bin0")
    val r = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }.withColumn("_rbin", binOf(col(s"r_$rightVal")))

    l.join(r,
        col(leftKey) === col(s"r_$rightKey") && col("_bin") === col("_rbin") &&
          abs(col(leftVal) - col(s"r_$rightVal")) <= lit(tolerance))
      .drop("_bin", "_rbin")
  }
}
