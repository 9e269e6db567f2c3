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
  * count, defeating plan reuse). A REBALANCE hint is deliberately NOT used:
  * AQE rebalance targets partition BYTES, and compute-bound inputs are
  * small-byte/heavy-CPU — it would coalesce them onto few cores, the exact
  * failure this exists to prevent. The cost when the input is already wide
  * is one shuffle of the operator's narrow input rows — negligible against
  * the per-row compute these stages exist for. */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
