package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore

/** Deterministic weighted sampling without replacement — the
  * training-data-mixture primitive (pick k documents with probability
  * proportional to a quality/length weight).
  *
  * Algorithm A-ES (Efraimidis & Spirakis, "Weighted random sampling with a
  * reservoir", IPL 2006): draw u ~ Uniform(0,1) per row, rank by
  * u^(1/w), keep the k largest. Equivalently rank by ln(u)/w, which
  * avoids pow's cross-libm drift. Instead of a PRNG, u derives from the
  * first 8 md5 hex chars of the row id — the same trick as
  * [[TextAnalysis.trainSplit]] — so the sample is a pure function of the
  * data: stable under reprocessing, independent of row order and
  * partitioning, and reproducible bit-for-bit by any engine with md5.
  *
  * Scale: selection runs through [[TopKByScore]], a k-bounded
  * TypedImperativeAggregate — each input partition ships at most k
  * candidates across the exchange (map-side combine), so sampling 100 TB
  * costs one scan plus a k-row merge; no global sort, no window over the
  * corpus. The winners then re-join their full rows via a broadcast hash
  * probe (k rows broadcast, corpus never shuffled).
  */
object Sampling {

  /** The A-ES ranking key ln(u)/w as a Column — larger is more likely
    * selected. Deterministic in `idCol`; requires `weightCol` > 0. */
  def weightedKey(idCol: Column, weightCol: Column): Column = {
    val u = (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    log(u) / weightCol.cast("double")
  }

  /** The k-row weighted sample of `df`: rows with the k largest A-ES keys
    * (ties by id ascending). `idCol` must be a unique BIGINT key. Returns
    * the full input rows of the winners. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame = {
    val eligible = df.filter(weight > 0 && col(idCol).isNotNull)
    val winners = eligible
      .agg(TopKByScore.topk_by_score(
        struct(weightedKey(col(idCol), weight).as("score"),
          col(idCol).cast("long").as("id")), k).as("top"))
      .select(explode(col("top")).as("w"))
      .select(col("w.id").as(idCol))
    df.join(broadcast(winners), idCol)
  }
}
