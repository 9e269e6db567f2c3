package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics that don't change semantics: skew salting, output
  * compaction, bucketed co-located joins. These are the knobs a 100 TB
  * deployment turns; each is exercised by a spec proving result
  * equivalence with the direct form.
  */
object Scale {

  /** Two-phase salted aggregation for skewed keys: phase 1 aggregates on
    * (key, salt) — spreading one hot key over `saltBuckets` reducers —
    * phase 2 merges the partials per key. Works for any algebraic
    * aggregate (sum/count/min/max); the RESULT is identical to the direct
    * groupBy regardless of how rows salt — only the shuffle distribution
    * changes. Salt = input partition id: a hot key whose rows all share
    * one value still spreads (hashing the value would not), and phase 1's
    * map-side combine collapses each task's rows to one partial per key
    * before the exchange. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", pmod(spark_partition_id(), lit(saltBuckets)))
    salted
      .groupBy("k", "_salt")
      .agg(sum("v").as("_s"), count(lit(1)).as("_c"))
      .groupBy("k")
      .agg(sum("_s").as("total"), sum("_c").as("n"))
  }

  /** Compact a DataFrame for writing: target a fixed number of output
    * files sized by row budget — the small-files problem is the classic
    * downstream killer of large pipelines. `maxRecordsPerFile` caps file
    * size; the repartition sets the floor. */
  def compactWrite(df: DataFrame, path: String, targetFiles: Int,
                   maxRecordsPerFile: Long, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.repartition(targetFiles).write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Range-partitioned, sorted data layout: repartitionByRange keeps each
    * output file's key span narrow and sortWithinPartitions orders rows
    * inside, so parquet min/max statistics prune files AND row groups for
    * range predicates — the "sort your facts by their hottest filter key"
    * layout rule for 100 TB scans. */
  def sortedLayoutWrite(df: DataFrame, path: String, partitions: Int,
                        sortCols: Seq[String]): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(partitions, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Write a table bucketed+sorted by a join key. Two tables bucketed the
    * same way join WITHOUT a shuffle (bucket pruning + co-located join) —
    * the pre-partitioning strategy for repeatedly-joined 100 TB facts. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
