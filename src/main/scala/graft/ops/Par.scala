package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism sizing for compute-bound stages.
  *
  * Input partitioning follows bytes (`spark.sql.files.maxPartitionBytes`),
  * which is right for scan-bound work but wrong for compute-bound operators
  * fed by a few small files (a single unsplittable parquet row group runs
  * the whole stage on one core). Ops whose cost is per-row CPU — signature
  * computation, pairwise verification, brute-force scoring — round-robin
  * their input across the cluster's cores first. The exchange moves only
  * the operator's (narrow) input rows, never the heavy intermediate state;
  * at real scale, with well-partitioned inputs, it is a cheap no-op-sized
  * shuffle that still guarantees the stage is CPU-shaped. */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df else df.repartition(cores)
  }
}
