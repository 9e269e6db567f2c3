package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row with
  * `rightTime <= leftTime` on matching keys.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union-and-scan pattern: tag both sides, union, single shuffle on the
  * key, then one ordered window pass carrying the most recent right-side
  * attributes forward (`last_value(..., ignoreNulls)`). No range cross
  * join, no per-row subquery — O(n log n) in each key partition, one
  * exchange total, which is what survives a 100× scale-up. Skewed keys
  * shard like any window (salt the key upstream if one key dominates).
  */
object AsOf {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows; rows sharing (key, time)
    *                   must be pre-aggregated to one (else the winner is
    *                   nondeterministic)
    * @param leftKey    join key column in `left`
    * @param rightKey   join key column in `right`
    * @param leftTime   event-time column in `left`
    * @param rightTime  event-time column in `right`
    * @param rightCols  right columns to carry (joined as `asof_<name>`,
    *                   null when no right row precedes the left row)
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    // Carry the right side as ONE struct (null only on left rows): with
    // per-column last(ignoreNulls) a legitimately-null right value would
    // be skipped — returning a stale value, or stitching columns from
    // DIFFERENT right rows into one match. A single struct is null-or-
    // whole-row, so ignoreNulls only ever skips left rows.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val leftSel: Seq[Column] =
      Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side")) ++
        left.columns.map(c => col(c)) :+
        lit(null).cast(rStructType).as("_r")
    val rightSel: Seq[Column] =
      Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("_r")
    val leftTagged = left.select(leftSel: _*)
    val rightTagged = right.select(rightSel: _*)

    // Right rows sort before left rows at equal timestamps, so a right row
    // AT the left row's time matches (<= semantics).
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        rightCols.map(c => col("_r").getField(c).as(s"asof_$c")): _*)
  }
}
