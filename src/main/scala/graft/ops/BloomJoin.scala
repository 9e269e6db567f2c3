package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join pruning — the "ship a sketch of the
  * build side to the probe scan" pattern for 100 TB joins.
  *
  * A semi join against a selective dimension still shuffles (or at best
  * broadcasts-and-probes) EVERY fact row. A bloom filter of the dim keys
  * is a few KB–MB regardless of fact size; evaluating it inside the fact
  * scan's filter drops the overwhelming majority of non-matching rows
  * before the exchange, turning shuffle volume from |fact| into
  * ~|matches| (plus the false-positive margin, bounded by numBits).
  *
  * Spark's AQE injects exactly this automatically for selective
  * sort-merge joins (`spark.sql.optimizer.runtime.bloomFilter.enabled`);
  * this op is the explicit, planner-independent form for when the
  * geometry is known up front (e.g. reused across many queries) — built
  * on the same Catalyst machinery (BloomFilterAggregate /
  * BloomFilterMightContain over xxhash64, codegen'd in the scan filter).
  *
  * The bloom is materialized on the driver and embedded as a literal —
  * the same thing AQE's subquery materialization does; its size is
  * numBits/8 bytes, independent of data volume. False positives are
  * removed by the exact semi join after the prune, so the RESULT is
  * identical to the plain semi join (oracled: q_bloom_semi_join).
  */
object BloomJoin {

  /** Serialized bloom filter of `key` over `dim` (driver-side, small). */
  def buildBloom(dim: DataFrame, key: String,
                 expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    dim.agg(agg.as("bloom")).head.getAs[Array[Byte]](0)
  }

  /** might_contain(bloom, xxhash64(key)) as a filter Column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(xxhash64(key))))

  /** Semi join of `fact` against `dim`, bloom-pruned before the join.
    * Result is exactly `fact.join(dim, factKey === dimKey, "left_semi")`. */
  def semiJoinPruned(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = buildBloom(dim.select(dimKey), dimKey, expectedItems, numBits)
    fact
      .filter(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey), "left_semi")
  }
}
