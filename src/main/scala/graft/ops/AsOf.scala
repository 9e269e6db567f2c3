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
  * exchange total, which is what survives a 100× scale-up.
  *
  * Skew: [[join]] windows once per key — a single dominant key serializes
  * onto one task. [[joinSkewSafe]] is the salted variant: the window is
  * partitioned by (key, time-bucket) so a hot key's timeline spreads over
  * many tasks, and a second, tiny per-bucket pass stitches carries across
  * bucket boundaries. Same results row-for-row (equivalence is spec-tested
  * with a hot key in ScaleSpec).
  */
object AsOf {

  /** Tag and union both sides: `_k`/`_t`/`_side` + left columns + the right
    * columns packed as ONE struct `_r` (null only on left rows): with
    * per-column last(ignoreNulls) a legitimately-null right value would
    * be skipped — returning a stale value, or stitching columns from
    * DIFFERENT right rows into one match. A single struct is null-or-
    * whole-row, so ignoreNulls only ever skips left rows. */
  private def tagged(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     rightCols: Seq[String]): DataFrame = {
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
    left.select(leftSel: _*).unionByName(right.select(rightSel: _*))
  }

  private def project(joined: DataFrame, left: DataFrame, rightCols: Seq[String],
                      rCol: String): DataFrame =
    joined.select(left.columns.map(col) ++
      rightCols.map(c => col(rCol).getField(c).as(s"asof_$c")): _*)

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
    // Right rows sort before left rows at equal timestamps, so a right row
    // AT the left row's time matches (<= semantics).
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = tagged(left, right, leftKey, rightKey, leftTime, rightTime, rightCols)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    project(joined, left, rightCols, "_r")
  }

  /** Skew-safe as-of join: identical semantics to [[join]], with the window
    * salted by a time bucket so a hot key parallelizes.
    *
    * Three stages, all skew-free:
    *  1. within-bucket carry: the [[join]] window partitioned by
    *     (key, bucket) — the hot key's rows split across ~timeline/width
    *     tasks;
    *  2. per-(key, bucket) LAST right row (`max_by`, map-side combinable),
    *     then the latest right row from any PRECEDING bucket via a window
    *     over buckets — one row per (key, bucket), thousands of times
    *     smaller than the data;
    *  3. stitch: left rows whose within-bucket carry is null take the
    *     preceding-bucket carry (join on (key, bucket) — same granularity
    *     as the salt, so no hotspot returns).
    *
    * @param bucketWidthSec time-bucket width; pick so a hot key's rows per
    *        bucket fit one task comfortably (e.g. 1 day for event data).
    */
  def joinSkewSafe(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String],
                   bucketWidthSec: Long = 86400L): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    // null times sort first (NULLS FIRST) in [[join]]; map them to the
    // minimal bucket so cross-engine-of-variants ordering is identical
    val bucket = when(col("_t").isNull, lit(Long.MinValue))
      .otherwise(floor(unix_micros(col("_t")) / lit(bucketWidthSec * 1000000L)))
    val withB = tagged(left, right, leftKey, rightKey, leftTime, rightTime, rightCols)
      .withColumn("_b", bucket)

    val w1 = Window.partitionBy("_k", "_b").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phase1 = withB.withColumn("_rin", last(col("_r"), ignoreNulls = true).over(w1))

    // null-time rights sort first in [[join]] (carried until any real-time
    // right appears); max_by skips null ordering keys, so map null to the
    // minimal instant to keep those rows eligible — same total order
    val bucketLast = withB.filter(col("_side") === 0)
      .groupBy("_k", "_b").agg(max_by(col("_r"),
        coalesce(unix_micros(col("_t")), lit(Long.MinValue))).as("_rlast"))
    val wPrev = Window.partitionBy("_k").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevByBucket = withB.select("_k", "_b").distinct()
      .join(bucketLast, Seq("_k", "_b"), "left")
      .withColumn("_rprev", last(col("_rlast"), ignoreNulls = true).over(wPrev))
      .select(col("_k"), col("_b"), col("_rprev"))

    // null-SAFE equality on the stitch join: the plain variant's window
    // groups null keys into one partition, so a null-keyed left row must
    // still find its null-keyed preceding-bucket carry here
    val lhs = phase1.filter(col("_side") === 1)
    val joined = lhs
      .join(prevByBucket,
        lhs("_k") <=> prevByBucket("_k") && lhs("_b") <=> prevByBucket("_b"),
        "left")
      .drop(prevByBucket("_k")).drop(prevByBucket("_b"))
      .withColumn("_rfinal", coalesce(col("_rin"), col("_rprev")))
    project(joined, left, rightCols, "_rfinal")
  }
}
