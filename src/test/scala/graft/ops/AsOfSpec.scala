package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before the left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 11:30:00"), 900.0)
    ).toDF("q_key", "q_time", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")), // → 100.0
      (11L, 1L, ts("2024-01-01 11:00:00")), // exact match → 110.0
      (12L, 1L, ts("2024-01-01 23:00:00")), // → 120.0
      (13L, 2L, ts("2024-01-01 09:00:00")), // no prior quote → null
      (14L, 3L, ts("2024-01-01 12:00:00"))  // unknown key → null
    ).toDF("trade_id", "t_key", "t_time")

    val joined = AsOf.join(trades, quotes, "t_key", "q_key", "t_time", "q_time",
      Seq("price"))
      .select("trade_id", "asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(joined(10L).contains(100.0))
    assert(joined(11L).contains(110.0))
    assert(joined(12L).contains(120.0))
    assert(joined(13L).isEmpty)
    assert(joined(14L).isEmpty)
  }

  test("skew-safe as-of equals the plain window variant on a hot key") {
    // one hot key with 2000 left rows + 500 right rows spanning many
    // 1-hour buckets (including right-empty buckets), plus normal keys
    // and a key with no rights at all
    val rnd = new scala.util.Random(7)
    def t(minute: Int) = new Timestamp(ts("2024-01-01 00:00:00").getTime + minute * 60000L)
    val rights =
      (0 until 500).map(i => (1L, t(rnd.nextInt(5000)), i.toDouble)) ++
      (0 until 20).map(i => (2L, t(i * 100), 1000.0 + i))
    val lefts =
      (0 until 2000).map(i => (i.toLong, 1L, t(rnd.nextInt(6000)))) ++
      (2000 until 2100).map(i => (i.toLong, 2L, t(rnd.nextInt(3000)))) ++
      (2100 until 2120).map(i => (i.toLong, 3L, t(rnd.nextInt(3000)))) // no rights
    // de-dup (key, time) on the right per the contract
    val quotes = rights.toDF("q_key", "q_time", "price").dropDuplicates("q_key", "q_time")
    val trades = lefts.toDF("trade_id", "t_key", "t_time")

    val plain = AsOf.join(trades, quotes, "t_key", "q_key", "t_time", "q_time", Seq("price"))
      .select("trade_id", "asof_price").as[(Long, Option[Double])].collect().toMap
    val salted = AsOf.joinSkewSafe(trades, quotes, "t_key", "q_key", "t_time", "q_time",
      Seq("price"), bucketWidthSec = 3600L)
      .select("trade_id", "asof_price").as[(Long, Option[Double])].collect().toMap
    assert(salted.size == plain.size)
    assert(salted == plain)
    assert(plain.exists(_._2.isEmpty)) // the no-rights key really exercised nulls

    // and the salt actually spreads the hot key: phase-1 window partitions
    // by (key, bucket), visible as a hashpartitioning on _k AND _b
    val plan = AsOf.joinSkewSafe(trades, quotes, "t_key", "q_key", "t_time", "q_time",
      Seq("price"), bucketWidthSec = 3600L).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_k") && plan.contains("_b"),
      s"expected (key, bucket) partitioning:\n$plan")
  }

  test("skew-safe as-of: left rows in right-empty buckets take the preceding carry") {
    val quotes = Seq((1L, ts("2024-01-01 00:30:00"), 7.0))
      .toDF("q_key", "q_time", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 00:10:00")), // before any right → null
      (11L, 1L, ts("2024-01-01 00:45:00")), // same bucket as the right
      (12L, 1L, ts("2024-01-05 09:00:00"))  // buckets later, none with rights
    ).toDF("trade_id", "t_key", "t_time")
    val got = AsOf.joinSkewSafe(trades, quotes, "t_key", "q_key", "t_time", "q_time",
      Seq("price"), bucketWidthSec = 3600L)
      .select("trade_id", "asof_price").as[(Long, Option[Double])].collect().toMap
    assert(got(10L).isEmpty)
    assert(got(11L).contains(7.0))
    assert(got(12L).contains(7.0))
  }

  test("skew-safe as-of matches plain variant when right rows have null times") {
    val quotes = Seq(
      (1L, None, 3.0),                              // null-time right: sorts first
      (1L, Some(ts("2024-01-01 01:00:00")), 9.0))
      .toDF("q_key", "q_time", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 00:30:00")),  // only the null-time right precedes
      (11L, 1L, ts("2024-01-01 02:00:00")))  // the 01:00 right wins
      .toDF("trade_id", "t_key", "t_time")
    val plain = AsOf.join(trades, quotes, "t_key", "q_key", "t_time", "q_time", Seq("price"))
      .select("trade_id", "asof_price").as[(Long, Option[Double])].collect().toMap
    val salted = AsOf.joinSkewSafe(trades, quotes, "t_key", "q_key", "t_time", "q_time",
      Seq("price"), bucketWidthSec = 3600L)
      .select("trade_id", "asof_price").as[(Long, Option[Double])].collect().toMap
    assert(plain(10L).contains(3.0) && plain(11L).contains(9.0))
    assert(salted == plain)
  }

  test("as-of join carries legitimately-null right values (no stale stitch)") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), "a"),
      (1L, ts("2024-01-01 11:00:00"), None, "b") // later row: null price, size b
    ).toDF("q_key", "q_time", "price", "sz")
    val trades = Seq((10L, 1L, ts("2024-01-01 12:00:00")))
      .toDF("trade_id", "t_key", "t_time")
    val row = AsOf.join(trades, quotes, "t_key", "q_key", "t_time", "q_time",
      Seq("price", "sz"))
      .select("trade_id", "asof_price", "asof_sz")
      .as[(Long, Option[Double], String)].head()
    // the 11:00 row is the as-of match: its null price must NOT fall back
    // to 10:00's 100.0, and sz must come from the same (11:00) row
    assert(row._2.isEmpty && row._3 == "b")
  }
}
