package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def fixture = Seq(
    // user 1: full ordered funnel
    (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
    // user 2: click BEFORE the first view — must not convert
    (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
    // user 3: skips the click stage — purchase must not count
    (3L, "view", ts(1)), (3L, "purchase", ts(2)),
    // user 4: converts through click only
    (4L, "view", ts(1)), (4L, "click", ts(2)),
    // user 5: never enters the funnel
    (5L, "purchase", ts(1))
  ).toDF("user_id", "event_type", "ts")

  test("funnel requires stages strictly ordered per user") {
    val st = Analytics.funnelStageTimes(fixture,
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
    val counts = st.agg(count(col("t_view")), count(col("t_click")),
      count(col("t_purchase"))).head()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((4L, 2L, 1L)))
    // user 2's pre-view click is not a conversion, but a LATER click would be
    val u2 = st.filter(col("user_id") === 2L).head()
    assert(u2.isNullAt(u2.fieldIndex("t_click")))
    assert(u2.isNullAt(u2.fieldIndex("t_purchase")))
  }

  test("windowed funnel expires conversions past the deadline") {
    def counts(gap: Option[Long]): (Long, Long, Long) = {
      val r = Analytics.funnelStageTimes(fixture,
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"), gap)
        .agg(count(col("t_view")), count(col("t_click")),
          count(col("t_purchase"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // fixture stage gaps are exactly 60s: a 30s deadline kills every
    // conversion, a 90s deadline readmits them all
    assert(counts(Some(30L)) == ((4L, 0L, 0L)))
    assert(counts(Some(90L)) == ((4L, 2L, 1L)))
    assert(counts(None) == ((4L, 2L, 1L)))
  }

  test("funnel shuffles the event table once: one exchange on the user key") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("q_funnel")(
        spark, "/root/testdata/sf0.001")).toString
    // three chained stage windows + the per-user rollup must share a
    // single hashpartitioning(user_id) exchange; a per-stage reshuffle
    // would scan-shuffle the events table once per funnel stage
    val userExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges == 1, plan.take(4000))
  }

  test("attribution credits the last touch inside the window only") {
    // replicate q_attribution's composition on a hand-built fixture
    val ev = Seq(
      (1L, 1L, "view", ts(1), 5.0), (2L, 1L, "click", ts(2), 0.0),
      (3L, 1L, "purchase", ts(3), 100.0), // last touch = click
      (4L, 2L, "purchase", ts(5), 50.0),  // no touch at all -> none
      (5L, 3L, "view", ts(1), 0.0),
      (6L, 3L, "purchase", ts(2), 25.0)   // view is last touch
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .groupBy("user_id", "ts").agg(max("event_type").as("touch"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val got = AsOf.join(purchases, touches,
        "user_id", "user_id", "ts", "ts", Seq("touch", "ts"))
      .withColumn("channel",
        when(col("asof_ts").isNotNull &&
            col("asof_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
          col("asof_touch")).otherwise(lit("none")))
      .groupBy("channel").agg(sum("value").as("rev"))
      .as[(String, Double)].collect().toMap
    assert(got == Map("click" -> 100.0, "none" -> 50.0, "view" -> 25.0))
  }

  test("cohort retention buckets users by first-activity period") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:00:00")), // cohort wk of Jan 1
      (1L, Timestamp.valueOf("2024-01-10 09:00:00")), // +1 week
      (1L, Timestamp.valueOf("2024-01-16 09:00:00")), // +2 weeks
      (2L, Timestamp.valueOf("2024-01-02 09:00:00")), // same cohort
      (2L, Timestamp.valueOf("2024-01-11 09:00:00")), // +1 week
      (3L, Timestamp.valueOf("2024-01-09 09:00:00"))  // cohort wk of Jan 8
    ).toDF("user_id", "ts")
    val got = Analytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    val jan1 = java.sql.Date.valueOf("2024-01-01")
    val jan8 = java.sql.Date.valueOf("2024-01-08")
    assert(got == Seq((jan1, 0L, 2L), (jan1, 1L, 2L), (jan1, 2L, 1L),
      (jan8, 0L, 1L)))
  }

  test("KMV cohort retention is bit-equal to exact below k, and the " +
      "scale-aware front selects by row count") {
    // duplicate (user, week) activity rows included: they must collapse
    // inside the sketch exactly as the exact path's distinct collapses them
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:00:00")),
      (1L, Timestamp.valueOf("2024-01-03 09:00:00")), // dup (u1, wk0)
      (1L, Timestamp.valueOf("2024-01-10 09:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 09:00:00")),
      (2L, Timestamp.valueOf("2024-01-11 09:00:00")),
      (2L, Timestamp.valueOf("2024-01-12 09:00:00")), // dup (u2, wk1)
      (3L, Timestamp.valueOf("2024-01-09 09:00:00"))
    ).toDF("user_id", "ts")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("cohort_week", "week_offset")
        .as[(java.sql.Date, Long, Long)].collect().toSeq
    val exact = rows(Analytics.cohortRetention(df, "user_id", "ts"))
    val sketch = rows(Analytics.cohortRetentionSketch(df, "user_id", "ts"))
    assert(sketch == exact)
    // selection is purely by the threaded row count
    assert(rows(Analytics.cohortRetentionFor(100L, df, "user_id", "ts")) == exact)
    assert(rows(Analytics.cohortRetentionFor(1000001L, df, "user_id", "ts")) == exact)
    // the schema is identical on both sides of the cutoff (long n_active)
    assert(Analytics.cohortRetentionSketch(df, "user_id", "ts").schema ==
      Analytics.cohortRetention(df, "user_id", "ts").schema)
  }

  test("2-D skyline equals the brute-force dominance scan") {
    // duplicates at a frontier point, an interior duplicate, ties on one
    // dimension only, and a strictly-dominated chain
    val rows = Seq((1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 7), (4L, 8.0, 3),
      (5L, 8.0, 3), (6L, 7.0, 9), (7L, 12.0, 8), (8L, 3.0, 2), (9L, 3.0, 2))
    val df = rows.toDF("id", "p", "q")
    def brute = rows.filter { case (_, p, q) =>
      !rows.exists { case (_, p2, q2) =>
        p2 >= p && q2 <= q && (p2 > p || q2 < q) }
    }.map(_._1).toSet
    val got = Analytics.skyline2D(df, "p", "q")
      .select("id").as[Long].collect().toSet
    assert(got == brute)
    assert(got == Set(1L, 2L, 4L, 5L, 7L, 8L, 9L))
    // layout invariance: the frontier is a pure function of the values
    val big = (1L to 500L).map(i =>
      (i, ((i * 37) % 101).toDouble, ((i * 53) % 97).toInt)).toDF("id", "p", "q")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.skyline2D(d, "p", "q").select("id").as[Long].collect().toSet
    assert(run(big.repartition(1)) == run(big.repartition(7)))
  }

  test("skyline band count never changes the frontier") {
    // the distributed merge (per-band local skyline + cross-band
    // prefix-min) must be invariant to banding: exercise bands ≪, ≈ and
    // ≫ the distinct-p cardinality, including undersampled boundaries
    val rows = (1L to 400L).map(i =>
      (i, ((i * 17) % 59).toDouble, ((i * 31) % 47).toInt))
    val df = rows.toDF("id", "p", "q")
    val brute = rows.filter { case (_, p, q) =>
      !rows.exists { case (_, p2, q2) =>
        p2 >= p && q2 <= q && (p2 > p || q2 < q) }
    }.map(_._1).toSet
    for (b <- Seq(1, 2, 8, 64, 512); k <- Seq(16, 4096))
      assert(Analytics.skyline2D(df, "p", "q", bands = b, sampleK = k)
        .select("id").as[Long].collect().toSet == brute,
        s"bands=$b sampleK=$k")
  }

  test("skyline small-input gate: one band below the cutoff, banded above") {
    val rows = (1L to 300L).map(i =>
      (i, ((i * 17) % 59).toDouble, ((i * 31) % 47).toInt))
    val df = rows.toDF("id", "p", "q")
    val brute = rows.filter { case (_, p, q) =>
      !rows.exists { case (_, p2, q2) =>
        p2 >= p && q2 <= q && (p2 > p || q2 < q) }
    }.map(_._1).toSet
    def plan(metaRows: Long) = Analytics.skyline2D(df, "p", "q", rows = metaRows)
      .queryExecution.executedPlan.toString
    // below the cutoff: no sample/quantile ladder in the plan, same frontier
    assert(!plan(1000L).contains("kmin_pairs"),
      "gated plan still carries the band-boundary sample aggregate")
    assert(Analytics.skyline2D(df, "p", "q", rows = 1000L)
      .select("id").as[Long].collect().toSet == brute)
    // above the cutoff (and at rows = 0 = unknown): the banded scale path
    assert(plan(Analytics.SkylineSmallRows + 1).contains("kmin_pairs"),
      "large metadata row count must keep the banded path")
    assert(plan(0L).contains("kmin_pairs"),
      "unknown size must keep the banded path")
  }

  test("skyline plans only partitioned windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1L to 50L).map(i => (i, i.toDouble, (i % 7).toInt))
      .toDF("id", "p", "q")
    val bad = Analytics.skyline2D(df, "p", "q")
      .queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"unpartitioned Window in skyline plan:\n$bad")
  }
}
