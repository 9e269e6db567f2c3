package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the CDC upsert that keeps
  * full attribute history: applying an update batch closes the
  * superseded open row (`valid_to` = update time) and inserts a new open
  * row, so every key's timeline is reconstructable as-of any instant
  * (the Kimball SCD2 pattern; the Delta/Iceberg MERGE equivalent,
  * expressed as plain equi-joins).
  *
  * Scale: every step shuffles on the dimension key only — latest-update
  * dedup (`max_by` partial agg), a left join against the OPEN slice of
  * the history (closed rows never move), an anti/inner join split, and a
  * union. No window over the history, no rewrite of closed partitions;
  * cost is O(open slice + batch), the shape a 100 TB dimension needs.
  * No-op updates (attributes unchanged, null-safe compare) are dropped,
  * so replaying the same batch is idempotent.
  */
object Scd2 {

  /** @param history SCD2 table: key, attrs..., `valid_from`, `valid_to`
    *                (null = open row)
    * @param updates batch: key, attrs..., `tsCol` (effective time);
    *                multiple updates per key resolve to the latest
    * @return        the merged SCD2 table (same schema as `history`) */
  def merge(history: DataFrame, updates: DataFrame, keyCol: String,
            tsCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    // latest update per key; ties on the timestamp resolve by the attr
    // tuple (lexicographic) so the winner is deterministic, not
    // whichever partition merged last
    val latest = updates.groupBy(keyCol)
      .agg(max_by(struct((attrCols :+ tsCol).map(col): _*),
        struct(col(tsCol) +: attrCols.map(col): _*)).as("_u"))
      .select(col(keyCol) +: (attrCols :+ tsCol).map(c => col(s"_u.$c").as(c)): _*)

    val open = history.filter(col("valid_to").isNull)
    val closedHist = history.filter(col("valid_to").isNotNull)

    val cmp = latest.join(
      open.select(col(keyCol) +:
        attrCols.map(c => col(c).as(s"${c}_cur")) :+
        col("valid_from").as("_vf"): _*),
      Seq(keyCol), "left")
    val isNew = col("_vf").isNull
    val isChanged = attrCols.map(c => !(col(c) <=> col(s"${c}_cur"))).reduce(_ || _)
    val toApply = cmp.filter(isNew || isChanged)
      .select(col(keyCol) +: attrCols.map(col) :+ col(tsCol): _*)

    val closeTs = toApply.select(col(keyCol), col(tsCol).as("_close_ts"))
    val closed = open.join(closeTs, Seq(keyCol))
      .withColumn("valid_to", col("_close_ts")).drop("_close_ts")
    val stillOpen = open.join(closeTs, Seq(keyCol), "left_anti")
    val inserted = toApply
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        lit(null).cast(history.schema("valid_to").dataType))
      .drop(tsCol)

    closedHist.unionByName(stillOpen).unionByName(closed)
      .unionByName(inserted)
  }
}
