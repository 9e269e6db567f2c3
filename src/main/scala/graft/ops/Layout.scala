package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side layout clustering: Z-order (Morton) interleaving, so files
  * written in z-value ranges carry tight min/max bounds on EVERY
  * interleaved dimension — the multi-column data-skipping layout
  * (Morton 1966; the technique behind Delta/Databricks OPTIMIZE ZORDER).
  *
  * A linear sort clusters only its leading column: every file spans the
  * full range of the second column, so predicates on it skip nothing.
  * Interleaving the dimensions' bits makes each z-range a bounding box in
  * all dimensions at once; parquet min/max stats then prune files for
  * predicates on either column.
  *
  * Everything is integer shift/mask arithmetic — codegen-friendly,
  * shuffle-free, and reproducible bit-for-bit by any engine with `<<`,
  * `&`, `|` (the oracle replays the identical expansion).
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value (the classic mask ladder). */
  private def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = (m.bitwiseOR(shiftleft(m, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (x in even bits, y in
    * odd). Callers quantize wider domains to 16 bits first. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` for writing: range-partition by the z-value of the two
    * dimensions into `numFiles` output partitions and sort within each —
    * the OPTIMIZE ZORDER shape (distributed, sample-based ranges; for a
    * deterministic bucket diagnostic see `q_zorder_buckets`). */
  def zOrdered(df: DataFrame, numFiles: Int, x: Column, y: Column): DataFrame = {
    val withZ = df.withColumn("_z", zValue2(x, y))
    withZ.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Write `df` as a hash-BUCKETED, per-bucket-sorted managed table —
    * the write-once layout that removes the join shuffle from every
    * downstream query on `key`: two tables bucketed the same way
    * sort-merge-join with NO Exchange on either side (Spark's
    * HashPartitioning(key, buckets) is satisfied by the scan itself).
    * At 100 TB this converts the recurring fact-to-fact join from the
    * cluster's dominant shuffle into a local per-bucket merge — the
    * bucketed-table counterpart of [[zOrdered]]'s skipping layout. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    dropTable(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Plain (unbucketed) managed parquet table with the same
    * stale-warehouse-directory handling as [[writeBucketed]]. */
  def writeTable(df: DataFrame, table: String): Unit = {
    dropTable(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** a FRESH session's in-memory catalog does not know a previous run's
    * managed table, but its warehouse directory survives on disk —
    * CREATE would fail with LOCATION_ALREADY_EXISTS. Drop both. */
  private def dropTable(spark: org.apache.spark.sql.SparkSession,
                        table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }
}
