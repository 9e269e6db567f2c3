package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an irregular series to a fixed
  * step, densify the gaps with a generated per-key spine, and fill —
  * last-observation-carried-forward plus linear interpolation. The
  * resample-then-fill step every metrics/feature pipeline needs before
  * windowed models.
  *
  * Scale: bucketing is a codegen'd integer floor (no UDF); the spine is
  * `sequence(min, max, step)` exploded PER KEY, so its size is bounded by
  * each key's own time span over step — never a global calendar cross
  * join; the fills are two frame-bounded windows over the same (key,
  * bucket) ordering, planned on one exchange. All arithmetic is integer
  * µs + IEEE division, so an external engine reproduces every
  * interpolated value bit-for-bit.
  */
object TimeSeries {

  /** @return (keyCol, b, v_obs, v_locf, v_interp) per spine bucket:
    *         `b` the bucket timestamp, `v_obs` the bucket's observed
    *         aggregate (null in gaps), `v_locf` the last observation
    *         carried forward, `v_interp` linear interpolation between
    *         the neighboring observations (flat at the edges). */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "step must be positive")
    val stepUs = stepSeconds * 1000000L
    val obs = df
      .filter(col(tsCol).isNotNull)
      .withColumn("b", timestamp_micros(
        expr(s"(unix_micros($tsCol) div $stepUs) * $stepUs")))
      .groupBy(col(keyCol), col("b"))
      .agg(round(avg(valueCol), 6).as("v_obs"))
    val spine = obs.groupBy(keyCol)
      .agg(min("b").as("_lo"), max("b").as("_hi"))
      .select(col(keyCol), explode(
        sequence(col("_lo"), col("_hi"),
          expr(s"INTERVAL $stepSeconds SECOND"))).as("b"))
    val joined = spine.join(obs, Seq(keyCol, "b"), "left")
    val wPrev = Window.partitionBy(keyCol).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy("b")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = joined
      .withColumn("_vp", last(col("v_obs"), ignoreNulls = true).over(wPrev))
      .withColumn("_vn", first(col("v_obs"), ignoreNulls = true).over(wNext))
      .withColumn("_tp",
        last(when(col("v_obs").isNotNull, col("b")), ignoreNulls = true).over(wPrev))
      .withColumn("_tn",
        first(when(col("v_obs").isNotNull, col("b")), ignoreNulls = true).over(wNext))
    // Interpolate in integer micro-units with floor(x + 0.5): the fill
    // values are 6-decimal doubles (bit-identical across engines), so
    // scaling them to exact integers and half-up-flooring the interpolant
    // sidesteps decimal rounding semantics — round(x, 6) systematically
    // hits half-way ties (midpoints of 6-decimal endpoints) where
    // engines' tie-breaking rules disagree, while floor of the identical
    // double is the same everywhere.
    val vpu = round(col("_vp") * 1e6)
    val vnu = round(col("_vn") * 1e6)
    filled
      .withColumn("v_locf", col("_vp"))
      .withColumn("v_interp",
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("_vp").isNotNull && col("_vn").isNotNull &&
              col("_tn") =!= col("_tp"),
            floor(vpu + (vnu - vpu) *
              ((unix_micros(col("b")) - unix_micros(col("_tp"))).cast("double") /
                (unix_micros(col("_tn")) - unix_micros(col("_tp"))).cast("double"))
              + 0.5) / 1e6)
          .otherwise(coalesce(col("_vp"), col("_vn"))))
      .select(keyCol, "b", "v_obs", "v_locf", "v_interp")
  }
}
