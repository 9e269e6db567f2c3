package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.KMinStrings

/** KMV (k-minimum-values) distinct-count sketch — the PORTABLE
  * approximate-distinct (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002).
  *
  * HyperLogLog (`approx_count_distinct`) is engine-specific: its register
  * layout and hash are not reproducible outside Spark, so its estimates
  * can only be range-checked. KMV keeps the k smallest distinct hashes of
  * the values instead; with a universal hash (md5), any engine reproduces
  * the exact same retained set and therefore the exact same estimate —
  * DuckDB replays it as `substr(md5(v), 1, 16)` + the same arithmetic.
  *
  * Estimator: with H_k = the kth smallest hash mapped to [0, 2^64), the
  * distinct count ≈ (k-1) * 2^64 / H_k; when fewer than k distinct hashes
  * exist the sketch is exact (it holds all of them). Standard error is
  * about 1/sqrt(k-2) — k=64 gives ~13%, k=1024 ~3%.
  *
  * Scale: the group state is ≤ k 16-char strings regardless of input
  * size, and [[KMinStrings]] is a TypedImperativeAggregate so the combine
  * is map-side partial — each partition ships at most k hashes per group.
  */
object Sketch {

  /** First 8 bytes of md5 as fixed-width lowercase hex. Lexicographic
    * order on the hex equals unsigned numeric order, and DuckDB computes
    * the identical string via substr(md5(v::VARCHAR), 1, 16). */
  def hashHex(c: Column): Column =
    substring(md5(c.cast("string").cast("binary")), 1, 16)

  private val TwoPow64 = math.pow(2, 64) // exactly representable

  /** The KMV estimate from a sorted-ascending hash array (the output of
    * [[KMinStrings]]). Exact (= array size) below k distinct values. */
  def kmvEstimate(arr: Column, k: Int): Column = {
    val hk = conv(element_at(arr, k), 16, 10).cast("double")
    when(size(arr) < k, size(arr).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow64) / hk)
  }

  /** kmin_strings over the md5 hash of `valueCol` — the full sketch as a
    * single aggregate Column, for use inside any groupBy. */
  def kmvSketch(valueCol: Column, k: Int): Column =
    KMinStrings.kmin_strings(hashHex(valueCol), k)

  /** Sketch set-algebra (the theta-sketch trick on KMV): two groups'
    * sketches combine WITHOUT rescanning their data. The k smallest
    * hashes of the union of two k-min sets are exactly the union's k-min
    * set, so [[kmvMerge]] + [[kmvEstimate]] estimates |A ∪ B|; and within
    * that union k-min set, the fraction of hashes present in BOTH input
    * sketches is an unbiased Jaccard estimate (each union-k-min hash is a
    * uniform draw from A ∪ B), giving |A ∩ B| ≈ Ĵ · est(A ∪ B). All of it
    * is deterministic array arithmetic over md5 hashes — an external
    * engine reproduces every estimate bit-for-bit. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Jaccard estimate |A∩B| / |A∪B| from two k-min sketches. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val u = kmvMerge(a, b, k)
    val common = size(filter(u, h => array_contains(a, h) && array_contains(b, h)))
    common.cast("double") / size(u).cast("double")
  }

  /** Intersection-size estimate Ĵ · est(A ∪ B) from two k-min sketches. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column =
    kmvJaccard(a, b, k) * kmvEstimate(kmvMerge(a, b, k), k)

  /** Deterministic uniform sample of up to k `value`s per group: the
    * values attached to the k smallest md5 hashes of a UNIQUE row key
    * ([[graft.functions.KMinPairs]] — ≤ k pairs per group cross the
    * exchange). Order statistics of a universal hash are a uniform
    * sample, but a reproducible one: any engine ranking rows by the same
    * md5 retains the identical sample, so quantile ESTIMATES from it are
    * oracle-checkable bit-for-bit — unlike engine-opaque percentile
    * sketches. */
  def hashSample(uniqueKeyCol: Column, value: Column, k: Int): Column =
    graft.functions.KMinPairs.kmin_pairs(
      md5(uniqueKeyCol.cast("string").cast("binary")), value.cast("double"), k)

  /** Discrete p-quantile of a sampled-values array: the ceil(p·n)-th
    * smallest element (1-indexed, clamped to ≥ 1) — the definition any
    * SQL engine reproduces as sorted_list[greatest(1, ceil(p*n))]. */
  def sampleQuantile(vals: Column, p: Double): Column = {
    require(p > 0.0 && p <= 1.0, s"quantile must be in (0, 1], got $p")
    element_at(array_sort(vals),
      greatest(lit(1), ceil(lit(p) * size(vals)).cast("int")))
  }

  /** MERGEABLE deterministic sample: like [[hashSample]] but keeping the
    * hash keys — array<struct<h,v>> of the k hash-smallest (md5(key),
    * value) pairs. The k smallest pairs of a UNION of such samples are
    * exactly the union's sample (the KMV property), so window frames and
    * MV folds combine per-bucket samples with [[pairSampleMerge]] without
    * ever rescanning rows — the quantile sibling of the sliding-KMV
    * distinct pattern. */
  def pairSample(uniqueKeyCol: Column, value: Column, k: Int): Column =
    graft.functions.KMinPairs.kmin_pair_structs(
      md5(uniqueKeyCol.cast("string").cast("binary")), value.cast("double"), k)

  /** Merge two pair samples: the k hash-smallest pairs of their union —
    * pure array algebra (hashes are distinct, so struct sort order IS
    * hash order), reproducible by any engine. */
  def pairSampleMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** The sampled values of a pair sample, for [[sampleQuantile]]. */
  def pairSampleValues(a: Column): Column = transform(a, x => x.getField("v"))

  /** Count-Min sketch of `valueCol` frequencies as one aggregate Column:
    * a fixed d×w counter array per group (see
    * [[graft.functions.CountMinLongs]]). Point estimates come from
    * [[cmsEstimate]]; sketches of disjoint inputs merge by element-wise
    * array addition (`zip_with(a, b, _ + _)`). */
  def cmsSketch(valueCol: Column, d: Int, w: Int): Column =
    graft.functions.CountMinLongs.count_min(valueCol.cast("string"), d, w)

  /** CMS point-frequency estimate: min over the d rows of the counter at
    * the value's bucket. Every term is the md5-derived bucket an external
    * engine recomputes, so estimates (not just bounds) oracle-check. */
  def cmsEstimate(sketch: Column, valueCol: Column, d: Int, w: Int): Column =
    (0 until d).map { i =>
      val b = (conv(substring(md5(
          concat(lit(s"$i:"), valueCol.cast("string")).cast("binary")), 1, 4),
        16, 10).cast("int") % w).cast("int")
      element_at(sketch, lit(i * w + 1) + b)
    }.reduce(least(_, _))
  /** HYPERLOGLOG distinct-count estimate per group (Flajolet, Fusy,
    * Gandouet & Meunier, AofA 2007) — the constant-state cardinality
    * sketch next to [[kmvSketch]]: m = 64 registers, each holding the
    * max leading-zero rank seen in its hash substream. State crossing
    * every exchange is ≤ 64 (group, register, rank) rows — partial max
    * per map side — regardless of cardinality.
    *
    * Deterministic and engine-replayable like every sketch here: the
    * hash is the first 64 bits of md5 (register = top 6 bits, rank =
    * leading zeros of the remaining 58 + 1, computed EXACTLY via the
    * binary-string length, never floating log2), the register sum
    * Σ 2^(−M_j) is carried as the INTEGER Σ 2^(63−M_j) in DECIMAL(38,0)
    * (a double sum of 59-exponent-spread powers rounds
    * order-dependently), and only the final division and the
    * small-range linear-counting branch (raw ≤ 2.5m with empty
    * registers → m·ln(m/V)) are double — one expression, same value in
    * any IEEE engine. Returns (group, hll_<alias>) rounded to 4. */
  def hllDistinct(df: org.apache.spark.sql.DataFrame, groupCol: String,
                  valueCol: String, alias: String): org.apache.spark.sql.DataFrame =
    hllEstimate(hllRegisters(df, Seq(groupCol), valueCol), groupCol, alias)

  /** The HLL REGISTER TABLE per group — ≤ 64 (group, j, mj) rows, the
    * sketch's whole state. Registers MERGE by plain `max(mj)` over any
    * regrouping (max is associative/commutative/idempotent), which is
    * the 100-TB story: per-partition / per-day register tables roll up
    * to coarser groups WITHOUT rescanning values, and the merged
    * estimate is bit-identical to the direct one ([[hllEstimate]] is a
    * pure function of the registers). */
  def hllRegisters(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                   valueCol: String): org.apache.spark.sql.DataFrame = {
    val (j, rank) = hllJRank(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ j.as("j") :+ rank.as("rank"): _*)
      .groupBy(groupCols.map(col) :+ col("j"): _*).agg(max("rank").as("mj"))
  }

  /** The per-row (register index, rank) pair for a value — the map side
    * of the sketch, exposed so STREAMING register tables can ride the
    * built-in windowed max aggregate (bounded state: ≤ 64 register rows
    * per group-window in the state store). */
  def hllJRank(value: Column): (Column, Column) = {
    val hx = md5(value.cast("string").cast("binary"))
    val topByte = conv(substring(hx, 1, 2), 16, 10).cast("long")
    val low56 = conv(substring(hx, 3, 14), 16, 10).cast("long")
    val j = shiftright(topByte, 2) // top 6 of 64 bits
    val w = (topByte % 4L) * lit(72057594037927936L) + low56 // low 58 bits
    val rank = when(w === 0L, lit(59)).otherwise(lit(59) - length(bin(w)))
    (j, rank)
  }

  /** The estimate tail off a register table (groups…, j, mj) — see
    * [[hllDistinct]] for the arithmetic contract. */
  def hllEstimate(regs: org.apache.spark.sql.DataFrame, groupCol: String,
                  alias: String): org.apache.spark.sql.DataFrame =
    hllEstimate(regs, Seq(groupCol), alias)

  def hllEstimate(regs: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                  alias: String): org.apache.spark.sql.DataFrame = {
    val two63 = lit("9223372036854775808").cast("decimal(38,0)")
    regs
      .groupBy(groupCols.map(col): _*)
      .agg((sum(expr("CAST(shiftleft(1L, 63 - mj) AS decimal(38,0))")) +
          (lit(64) - count(lit(1))).cast("decimal(38,0)") * two63).as("s_int"),
        (lit(64) - count(lit(1))).cast("long").as("v"))
      .withColumn("raw",
        lit(0.709) * lit(64.0) * lit(64.0) * lit(9223372036854775808.0) /
          col("s_int").cast("double"))
      .select(groupCols.map(col) :+
        round(when(col("raw") <= 160.0 && col("v") > 0L,
            lit(64.0) * log(lit(64.0) / col("v").cast("double")))
          .otherwise(col("raw")), 4).as(s"hll_$alias"): _*)
  }
}
