package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism sizing for compute-bound stages.
  *
  * Input partitioning follows bytes (`spark.sql.files.maxPartitionBytes`),
  * which is right for scan-bound work but wrong for compute-bound operators
  * fed by a few small files (a single unsplittable parquet row group runs
  * the whole stage on one core). Ops whose cost is per-row CPU — signature
  * computation, pairwise verification, brute-force scoring — round-robin
  * their input across the cluster's cores first.
  *
  * The exchange is UNCONDITIONAL and purely declarative: no
  * `df.rdd.getNumPartitions` probe (that would force physical planning and
  * splice an RDD-conversion node into every caller's plan just to read a
  * count, defeating plan reuse and AQE). It moves only the operator's
  * (narrow) input rows, never the heavy intermediate state — negligible
  * against per-row compute — and AQE's coalescing handles the
  * already-well-partitioned case at scale. */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
