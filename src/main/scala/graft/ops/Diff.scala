package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data-feed between two versions of a keyed
  * table: every key classified as inserted / deleted / changed, with the
  * old and new attribute values side by side (unchanged keys are
  * dropped). The batch primitive behind audit trails and incremental
  * downstream refresh when no CDC log exists.
  *
  * Scale: ONE full-outer equi-join on the key (null-safe attribute
  * compares, no window, no collect); output is change-sized, not
  * table-sized.
  */
object Diff {

  /** @return (key, change_type, old_<attr>..., new_<attr>...) for every
    *         key whose presence or attributes differ between versions. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val o = oldDf.select(col(keyCol) +:
      attrCols.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("_in_old", lit(true))
    val n = newDf.select(col(keyCol) +:
      attrCols.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("_in_new", lit(true))
    val changed = attrCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("_in_old").isNull, "inserted")
          .when(col("_in_new").isNull, "deleted")
          .when(changed, "changed"))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol) +: col("change_type") +:
        (attrCols.map(c => col(s"old_$c")) ++ attrCols.map(c => col(s"new_$c"))): _*)
  }
}
