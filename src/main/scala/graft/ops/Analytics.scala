package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: ordered funnels and cohort
  * retention — the OLAP staples a log-analytics engine is asked for first.
  *
  * Scale design: the funnel's chained stage windows all partition by the
  * user key with an unbounded frame, so Catalyst plans ONE exchange on
  * `userCol` reused by every Window operator AND by the per-user rollup
  * that follows (its required distribution is already satisfied) — the
  * events table crosses the network once regardless of stage count.
  * Cohort retention is shuffle-linear: a partial-agg distinct of
  * (user, period) pairs, a user-level first-period table, one equi-join.
  */
object Analytics {

  /** [[skyline2D]]'s small-input cutoff: below this many metadata-known
    * source rows the distinct value-pair relation sorts comfortably in
    * ONE window partition (≈ tens of MB), and the banding ladder's fixed
    * overhead would dominate. 2²² ≈ 4.2M rows. */
  val SkylineSmallRows: Long = 1L << 22

  /** Per-user funnel stage timestamps. Stage 0's time is the user's first
    * `stages(0)` event; stage i's time is the first `stages(i)` event
    * STRICTLY AFTER stage i-1's time (the conversion-ordering semantics —
    * a click before the first view does not convert). Output: one row per
    * user with a nullable `t_<stage>` timestamp per stage.
    */
  def funnelStageTimes(df: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, stages: Seq[String],
                       maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      "stages must be nonempty and distinct")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    val w = Window.partitionBy(userCol)
    val staged = stages.zipWithIndex.foldLeft(
      df.select(userCol, typeCol, tsCol)) { case (acc, (stage, i)) =>
        val hit = col(typeCol) === stage
        val cond =
          if (i == 0) hit
          else {
            val after = hit && col(tsCol) > col(s"_t${i - 1}")
            // conversion deadline: stage i must land within the gap of
            // stage i-1 (real funnels expire; gap in whole seconds so the
            // µs comparison is exact in any engine)
            maxGapSeconds.fold(after)(g => after &&
              unix_micros(col(tsCol)) <=
                unix_micros(col(s"_t${i - 1}")) + g * 1000000L)
          }
        acc.withColumn(s"_t$i", min(when(cond, col(tsCol))).over(w))
    }
    val aggs = stages.zipWithIndex.map { case (stage, i) =>
      max(s"_t$i").as(s"t_$stage") // constant per user; max picks it
    }
    staged.groupBy(userCol).agg(aggs.head, aggs.tail: _*)
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * counts and row-normalized probabilities of each (state → next state)
    * step, ordered by time with a unique tiebreak column. One exchange on
    * the user key for the lag window; the (from, to) count table is
    * |states|² — tiny — so the normalizing row-sum window costs nothing.
    */
  def transitionMatrix(df: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreakCol))
    val counts = df
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")).cast("double"), 6))
  }

  /** Cohort retention: users bucketed by the period of their first event
    * (`date_trunc(unit)`), activity counted per (cohort period, periods
    * elapsed). `periodDays` converts the day difference to the offset —
    * 7 for 'week', 1 for 'day'. Output: (cohort_<unit>, offset, n_active).
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      unit: String = "week", periodDays: Int = 7): DataFrame = {
    val ev = df.select(col(userCol),
      date_trunc(unit, col(tsCol)).cast("date").as("wk"))
    val cohort = ev.groupBy(userCol).agg(min("wk").as(s"cohort_$unit"))
    // (user, wk) pairs are distinct-ed, so count(*) below counts users
    ev.distinct()
      .join(cohort, userCol)
      .groupBy(col(s"cohort_$unit"),
        (datediff(col("wk"), col(s"cohort_$unit")) / periodDays)
          .cast("long").as(s"${unit}_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** [[cohortRetention]] with BOUNDED per-group state: the exact form
    * materializes the distinct (user, period) table — corpus-scale rows
    * through the distinct exchange — while this replaces it with a KMV
    * sketch of the user ids per (cohort, offset) group. State crossing
    * every exchange is ≤ k hashes per group (map-side partial merge
    * included), and the group count is |cohorts|·|offsets| — tiny. The
    * KMV contract keeps it oracle-checkable: below k distinct users the
    * sketch holds ALL of them, so `n_active` is bit-for-bit the exact
    * count; above k it is the deterministic (k−1)·2⁶⁴/H_k estimate any
    * engine reproduces from the same md5 hashes (same contract as
    * [[Checks.ApproxUniqueness]]). */
  def cohortRetentionSketch(df: DataFrame, userCol: String, tsCol: String,
                            unit: String = "week", periodDays: Int = 7,
                            k: Int = 4096): DataFrame = {
    val ev = df.select(col(userCol),
      date_trunc(unit, col(tsCol)).cast("date").as("wk"))
    val cohort = ev.groupBy(userCol).agg(min("wk").as(s"cohort_$unit"))
    // no distinct front: duplicate (user, period) rows collapse inside
    // the sketch's partial aggregation instead of paying their own shuffle
    ev.join(cohort, userCol)
      .groupBy(col(s"cohort_$unit"),
        (datediff(col("wk"), col(s"cohort_$unit")) / periodDays)
          .cast("long").as(s"${unit}_offset"))
      .agg(coalesce( // non-null like exact count(*): a group exists ⇒ rows
        Sketch.kmvEstimate(Sketch.kmvSketch(col(userCol), k), k).cast("long"),
        lit(0L)).as("n_active"))
  }

  /** Scale-aware cohort retention — the [[Checks.uniquenessFor]] pattern
    * applied to retention: exact [[cohortRetention]] while the event
    * table's metadata-known row count keeps the distinct (user, period)
    * exchange trivially cheap, bounded-state [[cohortRetentionSketch]]
    * above the cutoff. `rows` is an ARGUMENT, not a probe: free
    * catalog/parquet-footer metadata ([[graft.Tables.footerRowCount]]),
    * threaded in to keep this a pure, spec-able selection function.
    * Exact-at-any-size stays available by calling [[cohortRetention]]
    * directly. */
  def cohortRetentionFor(rows: Long, df: DataFrame, userCol: String,
                         tsCol: String, unit: String = "week",
                         periodDays: Int = 7,
                         exactMaxRows: Long = 500000,
                         k: Int = 4096): DataFrame =
    if (rows <= exactMaxRows) cohortRetention(df, userCol, tsCol, unit, periodDays)
    else cohortRetentionSketch(df, userCol, tsCol, unit, periodDays, k)

  /** 2-D SKYLINE (pareto frontier — Börzsönyi, Kossmann & Stocker, ICDE
    * 2001): rows not dominated by any other, where a dominates b iff
    * a.`maxCol` ≥ b.`maxCol` ∧ a.`minCol` ≤ b.`minCol` with at least one
    * strict — the multi-objective "best trade-offs" query (price vs
    * size, quality vs cost) that no single ORDER BY expresses.
    *
    * In 2-D a point is on the frontier iff its minCol is strictly below
    * the min of every strictly-(maxCol)-greater point — so the frontier
    * falls out of the (maxCol desc, minCol asc) ordered prefix-min, and
    * that pass DISTRIBUTES by the divide-and-conquer of the paper:
    * range-band the distinct value points on maxCol (deterministic
    * k-min-hash sample boundaries, the q_value_buckets ladder), run the
    * prefix-min window PER BAND, then merge bands through the tiny
    * per-band min(minCol) table — a point also survives only if it beats
    * the min of every higher band. No unpartitioned window ever sees an
    * unbounded relation: the band merge is a buckets²-row broadcast
    * self-join. Banding compares in double space, which is sound because
    * strictly-greater after a monotone cast implies strictly greater in
    * the original ordering (equal values always share a band), while the
    * within-band window orders by the ORIGINAL columns — exactness is
    * never ceded to the cast.
    *
    * Scale: the corpus collapses to distinct value PAIRS first
    * (map-side combined — all downstream work is on the value space,
    * not the rows), bands bound every sort partition at ~|points|/B,
    * and the frontier itself (≈ O(log n) points under independence)
    * broadcasts to the id-recovery join. Returns the input rows at
    * frontier points. */
  def skyline2D(df: DataFrame, maxCol: String, minCol: String,
                bands: Int = 32, sampleK: Int = 4096,
                rows: Long = 0L): DataFrame = {
    require(bands >= 1 && bands <= 1024, s"bands must be in [1,1024]: $bands")
    // small-input gate (`rows` — FREE parquet-footer metadata threaded by
    // the caller, the cohortRetentionFor / Dedup.normJoinHint pattern;
    // <= 0 = unknown): below SkylineSmallRows source rows the banding
    // ladder's fixed overhead (sample aggregate, quantile boundaries,
    // cross-band merge) dominates the sort it shards — measured
    // 1.02 s -> 2.60 s at sf0.1 when the distributed rewrite landed — so
    // collapse to ONE band: the same prefix-min window over one bounded
    // partition, zero sample pass. Unknown/large inputs keep the banded
    // scale path (spec-pinned), and the frontier is band-count-invariant
    // (AnalyticsSpec), so the gate can never change the answer.
    val effBands = if (rows > 0 && rows <= SkylineSmallRows) 1 else bands
    val pts = df.select(col(maxCol).as("_p"), col(minCol).as("_q"))
      .filter(col("_p").isNotNull && col("_q").isNotNull)
      .distinct()
    // deterministic band boundaries on _p: md5-keyed k-min sample →
    // evenly spaced order statistics (double-cast for the sample only).
    // ONE band needs no boundaries AT ALL — the band id is the literal 0,
    // so the gated path skips the boundary job + broadcast + crossJoin
    val banded =
      if (effBands == 1) pts.withColumn("_bkt", lit(0))
      else {
        val bounds = pts
          .agg(Sketch.hashSample(concat_ws(" ", col("_p"), col("_q")),
            col("_p"), sampleK).as("_smp"))
          .select(array((1 until effBands).map(i =>
            Sketch.sampleQuantile(col("_smp"), i.toDouble / effBands)): _*)
            .as("_bl"))
        // band 0 = highest-_p range: count boundaries strictly above _p.
        // Equal _p always lands in ONE band, so every cross-band dominator
        // has strictly greater _p and dominance needs only _q ≤ ours.
        pts.crossJoin(broadcast(bounds))
          .withColumn("_bkt",
            size(filter(col("_bl"), b => b > col("_p").cast("double"))))
          .drop("_bl")
      }
    val w = Window.partitionBy("_bkt").orderBy(col("_p").desc, col("_q").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = banded.withColumn("_m", min("_q").over(w))
      .filter(col("_m").isNull || col("_q") < col("_m"))
    // cross-band merge: the running min _q over all strictly-higher-_p
    // bands, from the ≤`bands`-row per-band min table (broadcast
    // self-join). ONE band makes the merge vacuous — skip its two jobs
    val sky =
      if (effBands == 1) local.select("_p", "_q")
      else {
        val mins = banded.groupBy("_bkt").agg(min("_q").as("_mn"))
        val prior = mins.as("a")
          .join(broadcast(mins.as("b")), col("b._bkt") < col("a._bkt"))
          .groupBy(col("a._bkt").as("_bkt")).agg(min(col("b._mn")).as("_pm"))
        local.join(broadcast(prior), Seq("_bkt"), "left")
          .filter(col("_pm").isNull || col("_q") < col("_pm"))
          .select("_p", "_q")
      }
    df.join(broadcast(sky),
        df(maxCol) === sky("_p") && df(minCol) === sky("_q"))
      .drop("_p", "_q")
  }
}
