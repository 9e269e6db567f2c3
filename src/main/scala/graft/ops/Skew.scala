package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation: salted equi-join.
  *
  * A shuffle join on a skewed key sends every row of a hot key to ONE
  * reducer — at 100 TB a single hot user/tenant key can hold a stage
  * hostage for hours. AQE's skew-join handles the sort-merge case
  * adaptively (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * this engine's sessions); salting is the explicit, planner-independent
  * fallback that also composes with aggregations and works when AQE can't
  * split (e.g. bucketed tables, stateful streaming joins).
  *
  * Shape: the fact side gets a deterministic salt in [0, buckets) hashed
  * from `factSaltOn` columns; the dim side is replicated `buckets`× with
  * one copy per salt value; the join key becomes (key, salt), spreading
  * each hot key over `buckets` reducers. Cost: dim side shuffles
  * `buckets`× its size — use only when the dim is too big to broadcast
  * but small relative to the fact (the usual skew geometry).
  *
  * Correctness is layout-independent: the salt is a pure function of the
  * fact row, and every (key, salt) pair finds exactly one dim replica, so
  * the result multiset equals the unsalted join (oracled: q_salted_join).
  */
object Skew {

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     buckets: Int, factSaltOn: Seq[String]): DataFrame = {
    require(buckets > 1 && buckets <= 4096, "buckets must be in (1, 4096]")
    // known_not_null: without it InferFiltersFromConstraints pushes
    // isnotnull(pmod(xxhash64(...))) below this projection and the salt
    // hash is evaluated twice per row (once in a Filter, once here)
    val salted = fact.withColumn("__fact_salt",
      graft.functions.GraftFunctions.known_not_null(
        pmod(xxhash64(factSaltOn.map(col): _*), lit(buckets.toLong))))
    val replicated = dim.withColumn("__dim_salt",
      explode(lit((0L until buckets.toLong).toArray)))
    salted
      .join(replicated,
        col(factKey) === col(dimKey) && col("__fact_salt") === col("__dim_salt"))
      .drop("__fact_salt", "__dim_salt")
  }
}
