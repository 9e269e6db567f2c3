package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (Some("a"), Some(1.0), "x"),
    (Some("b"), None, "x"),
    (Some("a"), Some(3.0), "y"),
    (None, Some(4.0), "y"),
    (Some("c"), None, "y")
  ).toDF("s", "v", "g")

  test("profile counts nulls and non-nulls exactly, NULL estimate off-list") {
    val rows = Profile.table(fixture, distinctCols = Set("s", "g"))
      .orderBy("col_name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("g", "s", "v"))
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(byName("s") == ((4L, 1L, Some(3.0))))  // exact below k
    assert(byName("g") == ((5L, 0L, Some(2.0))))
    assert(byName("v") == ((3L, 2L, None)))       // not in distinctCols
  }

  test("profile is invariant to partitioning layout") {
    val big = (1 to 2000)
      .map(i => (s"u${i % 137}", if (i % 7 == 0) null else s"t${i % 311}"))
      .toDF("a", "b")
    def run(parts: Int) = Profile.table(big.repartition(parts),
        distinctCols = Set("a", "b"), k = 32)
      .orderBy("col_name").collect().toSeq
    assert(run(1) == run(13))
  }

  test("profile plan reads the table once with bounded partial aggs") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("q_profile_events")(
        spark, "/root/testdata/sf0.001")).toString
    // every column's stats come from ONE scan + ONE partial/final agg
    // pair; a per-column re-scan (the naive ANALYZE shape) would show here
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1, plan.take(3000))
    // the four distinct-profiled columns each keep a bounded KMV partial
    assert(plan.sliding("partial_kmin_strings".length)
      .count(_ == "partial_kmin_strings") == 4, plan.take(3000))
  }
}
