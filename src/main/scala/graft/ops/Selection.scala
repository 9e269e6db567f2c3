package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed order statistics (selection) without a global sort —
  * iterative histogram refinement in the Munro–Paterson selection
  * tradition: each pass histograms the surviving value range into 2^16
  * buckets (one map-side-combined aggregate, ≤ 65,536 counter rows to the
  * driver), the driver prefix-scans to the bucket containing the k-th
  * value, and the next pass descends into that bucket. A 64-bit domain
  * collapses in ≤ ceil(64/16) = 4 passes, so the exact k-th smallest of
  * N rows costs ≤ 5 scans total (1 stats + ≤4 refinements) with O(2^16)
  * driver state — versus a global sort's full shuffle of N rows. Each
  * refinement filters `lo ≤ v ≤ hi`, which parquet min/max pruning turns
  * into a partial scan on sorted/clustered layouts.
  *
  * This is the exact VERIFIER tier: the sketch family
  * ([[graft.ops.Sketch]] k-min samples, sliding quantiles) remains the
  * one-pass approximate path; this is what you run when the number must
  * be exact (SLA cutoffs, billing thresholds) and 5 scans are acceptable.
  */
object Selection {

  /** Exact k-th smallest (1-based, duplicates counted — the row_number
    * order statistic) of a LONG column. Values may be negative; the
    * value RANGE must fit in a signed 64-bit difference (BigInt-guarded
    * bucket math, loud failure otherwise). */
  def kthSmallest(df: DataFrame, c: String, k: Long,
                  buckets: Int = 1 << 16): Long = {
    val stats = df.agg(count(col(c)).as("n"), min(col(c)).as("lo"),
      max(col(c)).as("hi")).head()
    kthSmallestIn(df, c, k, stats.getLong(0), stats.getLong(1),
      stats.getLong(2), buckets)
  }

  /** [[kthSmallest]] with the (count, min, max) stats pass already paid —
    * lets a multi-statistic caller ([[quantiles]]) share ONE stats scan
    * across all its selections. */
  def kthSmallestIn(df: DataFrame, c: String, k: Long, n: Long,
                    lo0: Long, hi0: Long, buckets: Int = 1 << 16): Long = {
    require(buckets >= 2)
    require(k >= 1 && k <= n, s"k=$k out of range 1..$n")
    var lo = lo0
    var hi = hi0
    require(BigInt(hi) - BigInt(lo) <= BigInt(Long.MaxValue),
      "value range exceeds a signed 64-bit difference")
    var kk = k
    while (lo < hi) {
      val width = ((BigInt(hi) - BigInt(lo)) / buckets + 1).toLong
      val histo = df
        .filter(col(c) >= lo && col(c) <= hi)
        .select(expr(s"($c - ${lo}L) div ${width}L").as("b"))
        .groupBy("b").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var b = 0L
      var acc = 0L
      while (acc + histo.getOrElse(b, 0L) < kk) {
        acc += histo.getOrElse(b, 0L); b += 1
      }
      kk -= acc
      lo = Math.addExact(lo, Math.multiplyExact(b, width))
      hi = math.min(hi, Math.addExact(lo, width - 1))
    }
    lo
  }

  /** Exact order statistics at the given percentages in ONE driver loop:
    * k_p = ceil(p/100 · n) (no interpolation — the value returned is an
    * actual data value, duplicates counted). Returns (p, k, value). */
  def quantiles(df: DataFrame, c: String,
                ps: Seq[Int] = Seq(25, 50, 75)): Seq[(Int, Long, Long)] = {
    val stats = df.agg(count(col(c)).as("n"), min(col(c)).as("lo"),
      max(col(c)).as("hi")).head() // ONE stats scan for every statistic
    val n = stats.getLong(0)
    require(n > 0, "quantiles of an empty relation")
    ps.map { p =>
      require(p >= 1 && p <= 100, s"percentage $p out of 1..100")
      val k = (BigInt(p) * n + 99) / 100 // ceil(p·n/100), overflow-safe
      (p, k.toLong, kthSmallestIn(df, c, k.toLong, n,
        stats.getLong(1), stats.getLong(2)))
    }
  }
}
