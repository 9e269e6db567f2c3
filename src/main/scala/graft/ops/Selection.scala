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
                ps: Seq[Int] = Seq(25, 50, 75),
                buckets: Int = 1 << 16): Seq[(Int, Long, Long)] = {
    require(buckets >= 2)
    val spark = df.sparkSession
    val stats = df.agg(count(col(c)).as("n"), min(col(c)).as("lo"),
      max(col(c)).as("hi")).head() // ONE stats scan for every statistic
    val n = stats.getLong(0)
    require(n > 0, "quantiles of an empty relation")
    require(BigInt(stats.getLong(2)) - BigInt(stats.getLong(1)) <=
      BigInt(Long.MaxValue), "value range exceeds a signed 64-bit difference")
    // ALL selectors refine SIMULTANEOUSLY (the [[groupedMedian]] pattern):
    // each pass is ONE aggregate keyed by (selector, bucket) over a
    // broadcast range frame, so the pass count is the MAX refinement
    // depth (≤ ceil(64/log2(buckets)) = 4) instead of the SUM across
    // selectors — for the default 3 percentiles, ≤ 5 scans total where
    // the per-selector loop paid ~13. Each selector's (lo, hi, k)
    // trajectory uses bucket math identical to [[kthSmallestIn]], so the
    // returned values are bit-equal (spec-pinned). A coarse
    // union-of-ranges filter stays a plain pushed-down predicate, so
    // parquet min/max pruning on clustered layouts survives the shared
    // pass.
    final case class Sel(i: Int, p: Int, k: Long,
                         var lo: Long, var hi: Long, var kk: Long)
    val sels = ps.zipWithIndex.map { case (p, i) =>
      require(p >= 1 && p <= 100, s"percentage $p out of 1..100")
      val k = ((BigInt(p) * n + 99) / 100).toLong // ceil(p·n/100), overflow-safe
      require(k >= 1 && k <= n, s"k=$k out of range 1..$n")
      Sel(i, p, k, stats.getLong(1), stats.getLong(2), k)
    }
    while (sels.exists(s => s.lo < s.hi)) {
      val active = sels.filter(s => s.lo < s.hi)
      val widths = active.map(s =>
        (s.i, s.lo, s.hi, ((BigInt(s.hi) - BigInt(s.lo)) / buckets + 1).toLong))
      val ranges = spark.createDataFrame(widths.toSeq)
        .toDF("_i", "_lo", "_hi", "_wd")
      val gLo = active.map(_.lo).min
      val gHi = active.map(_.hi).max
      val histo = df
        .filter(col(c) >= gLo && col(c) <= gHi) // pushed-down coarse prune
        .join(broadcast(ranges), col(c) >= col("_lo") && col(c) <= col("_hi"))
        .select(col("_i"), expr(s"($c - _lo) div _wd").as("_b"))
        .groupBy("_i", "_b").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      active.foreach { s =>
        val width = ((BigInt(s.hi) - BigInt(s.lo)) / buckets + 1).toLong
        var b = 0L
        var acc = 0L
        while (acc + histo.getOrElse((s.i, b), 0L) < s.kk) {
          acc += histo.getOrElse((s.i, b), 0L); b += 1
        }
        s.kk -= acc
        s.lo = Math.addExact(s.lo, Math.multiplyExact(b, width))
        s.hi = math.min(s.hi, Math.addExact(s.lo, width - 1))
      }
    }
    sels.map(s => (s.p, s.k, s.lo))
  }

  /** Exact PER-GROUP interpolated median of a LONG column — every group's
    * selection refined SIMULTANEOUSLY: each pass is ONE map-side-combined
    * aggregate keyed by (group, selector, bucket), so the pass count stays
    * ≤ ceil(64/log2(buckets)) + 1 regardless of how many groups there are,
    * and per-group state never leaves the ≤ `maxGroups`·buckets·2 driver
    * histogram (the group count is gated — this is for LOW-cardinality
    * dimensions like corpus sources; a high-cardinality grouping belongs
    * to the sketch tier). Both middle order statistics k = ⌈n/2⌉ and
    * ⌈(n+1)/2⌉ are tracked as separate selectors, so an even-sized group
    * interpolates exactly like SQL `median`. The per-pass filter is a
    * broadcast range join (group equi-key + value between the group's
    * surviving range), which parquet min/max pruning turns into a partial
    * scan on clustered layouts.
    *
    * Returns a LOCAL result relation (group: string, n: long,
    * med_2x: long) where med_2x = lower + upper middle value — kept
    * DOUBLED so downstream arithmetic (deviations, MAD tests) stays in
    * exact integers; med itself is med_2x / 2.0. */
  def groupedMedian(df: DataFrame, g: String, c: String,
                    buckets: Int = 1 << 12,
                    maxGroups: Int = 256): DataFrame = {
    require(buckets >= 2)
    val spark = df.sparkSession
    val in = df.select(col(g).cast("string").as("_g"), col(c).as("_v"))
    val stats = in.groupBy("_g")
      .agg(count(lit(1)).as("n"), min("_v").as("lo"), max("_v").as("hi"))
      .collect()
    require(stats.length <= maxGroups,
      s"groupedMedian: ${stats.length} groups > $maxGroups — a " +
        "high-cardinality grouping belongs to the sketch tier")
    // selector state: (group, which) -> (lo, hi, k remaining in range)
    final case class Sel(grp: String, var lo: Long, var hi: Long, var k: Long)
    val sels = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Sel)]
    val ns = scala.collection.mutable.Map.empty[String, Long]
    stats.foreach { r =>
      val (grp, n, lo, hi) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      require(BigInt(hi) - BigInt(lo) <= BigInt(Long.MaxValue),
        s"groupedMedian($grp): value range exceeds a 64-bit difference")
      ns(grp) = n
      sels += ((grp, 1, Sel(grp, lo, hi, (n + 1) / 2)))
      sels += ((grp, 2, Sel(grp, lo, hi, (n + 2) / 2)))
    }
    while (sels.exists { case (_, _, s) => s.lo < s.hi }) {
      val active = sels.filter { case (_, _, s) => s.lo < s.hi }
      val widths = active.map { case (grp, w, s) =>
        (grp, w, s.lo, s.hi, ((BigInt(s.hi) - BigInt(s.lo)) / buckets + 1).toLong)
      }
      val ranges = spark.createDataFrame(widths.toSeq)
        .toDF("_g", "_w", "_lo", "_hi", "_wd")
      val histo = in.join(broadcast(ranges), "_g")
        .filter(col("_v") >= col("_lo") && col("_v") <= col("_hi"))
        .select(col("_g"), col("_w"),
          expr("(_v - _lo) div _wd").as("_b"))
        .groupBy("_g", "_w", "_b").agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      active.foreach { case (grp, w, s) =>
        val width = ((BigInt(s.hi) - BigInt(s.lo)) / buckets + 1).toLong
        var b = 0L
        var acc = 0L
        while (acc + histo.getOrElse((grp, w, b), 0L) < s.k) {
          acc += histo.getOrElse((grp, w, b), 0L); b += 1
        }
        s.k -= acc
        s.lo = Math.addExact(s.lo, Math.multiplyExact(b, width))
        s.hi = math.min(s.hi, Math.addExact(s.lo, width - 1))
      }
    }
    val med2x = sels.groupBy(_._1).map { case (grp, ss) =>
      (grp, ns(grp), ss.map(_._3.lo).sum)
    }
    spark.createDataFrame(med2x.toSeq).toDF("grp", "n", "med_2x")
  }
}
