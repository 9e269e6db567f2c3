package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resample densifies gaps, carries forward and interpolates") {
    // key 'a': observations at minutes 0 and 30 (values 10, 40) with a
    // 10-min step -> spine 0,10,20,30; gaps at 10 and 20
    val df = Seq(
      ("a", ts("2024-01-01 10:00:05"), 10.0),
      ("a", ts("2024-01-01 10:00:55"), 10.0), // same bucket, avg stays 10
      ("a", ts("2024-01-01 10:30:10"), 40.0),
      ("b", ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("k", "t", "v")
    val got = TimeSeries.resample(df, "k", "t", "v", stepSeconds = 600L)
      .orderBy("k", "b")
      .select("k", "v_obs", "v_locf", "v_interp")
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("a", Some(10.0), Some(10.0), Some(10.0)),
      ("a", None, Some(10.0), Some(20.0)),       // 1/3 of the way to 40
      ("a", None, Some(10.0), Some(30.0)),       // 2/3
      ("a", Some(40.0), Some(40.0), Some(40.0)),
      ("b", Some(7.0), Some(7.0), Some(7.0))))   // single point, no spine
  }

  test("resample is layout-invariant") {
    val df = (1 to 2000).map { i =>
      (s"k${i % 3}", ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"),
        (i % 50).toDouble)
    }.toDF("k", "t", "v")
    def run(parts: Int) =
      TimeSeries.resample(df.repartition(parts), "k", "t", "v", 3600L)
        .orderBy("k", "b")
        .as[(String, Timestamp, Option[Double], Option[Double], Option[Double])]
        .collect().toSeq
    assert(run(1) == run(13))
  }

  test("transition matrix counts ordered consecutive pairs per user") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 10:01:00"), 2L),
      (1L, "a", ts("2024-01-01 10:02:00"), 3L),
      (2L, "a", ts("2024-01-01 10:00:00"), 4L),
      (2L, "b", ts("2024-01-01 10:01:00"), 5L),
      (3L, "c", ts("2024-01-01 10:00:00"), 6L) // singleton: no transition
    ).toDF("user_id", "event_type", "t", "eid")
    val got = Analytics.transitionMatrix(df, "user_id", "event_type", "t", "eid")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }
}
