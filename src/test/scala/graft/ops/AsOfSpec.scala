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
