package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (Some(1L), Some(10.0), "a"),
    (Some(2L), Some(20.0), "a"),
    (Some(2L), None, "b"),
    (None, Some(999.0), "zzz")
  ).toDF("id", "v", "cat")

  test("checks compute metrics and pass/fail in one shot") {
    val rows = Checks.run(fixture, Seq(
        Checks.Completeness("id", 0.7),
        Checks.Uniqueness("id", 0.9),
        Checks.FractionBetween("v", 0.0, 100.0, 0.9),
        Checks.FractionInSet("cat", Seq("a", "b"), 0.5)))
      .orderBy("kind", "col_name").collect()
    val byKind = rows.map(r => r.getString(0) ->
      (r.getDouble(2), r.getBoolean(4))).toMap
    assert(byKind("completeness") == ((0.75, true)))   // 3 of 4 non-null
    assert(byKind("uniqueness") == ((round6(2.0 / 3.0), false)))
    assert(byKind("fraction_between") == ((round6(2.0 / 3.0), false)))
    assert(byKind("fraction_in_set") == ((0.75, true)))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("approx uniqueness tracks the exact ratio") {
    val df = (1 to 5000).map(i => s"k${i % 2500}").toDF("c")
    val row = Checks.run(df, Seq(Checks.ApproxUniqueness("c", 0.3, k = 256)))
      .head()
    assert(row.getBoolean(4), row.toString) // true ratio 0.5, ~8% error at k=256
    assert(math.abs(row.getDouble(2) - 0.5) < 0.15, row.toString)
  }

  test("uniquenessFor picks exact below the cutoff, bounded-state above") {
    assert(Checks.uniquenessFor(4096, "c", 0.5) == Checks.Uniqueness("c", 0.5))
    assert(Checks.uniquenessFor(4097, "c", 0.5) ==
      Checks.ApproxUniqueness("c", 0.5, 1024))
    // opt-out stays available: a tightened cutoff keeps exact longer
    assert(Checks.uniquenessFor(100000, "c", 0.5, exactMaxRows = 1000000) ==
      Checks.Uniqueness("c", 0.5))
  }

  test("KMV-exact-below-k: the approx metric IS the exact ratio under k distinct") {
    // 300 distinct values < k=1024 → the sketch holds every hash and the
    // metric is bit-for-bit count(DISTINCT)/count, not an estimate
    val df = (1 to 3000).map(i => s"k${i % 300}").toDF("c")
    val approx = Checks.run(df, Seq(Checks.ApproxUniqueness("c", 0.05)))
      .head().getDouble(2)
    assert(approx == 0.1)
  }

  test("the approx-uniqueness path still fuses into one scan") {
    val df = (1 to 3000).map(i => (s"k${i % 300}", i.toLong)).toDF("c", "id")
    val out = Checks.run(df, Seq(
      Checks.uniquenessFor(1000000, "c", 0.05),
      Checks.uniquenessFor(1000000, "id", 0.9),
      Checks.Completeness("c", 0.9)))
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(out).toString
    assert(!plan.contains("Expand"), plan.take(3000)) // no multi-distinct Expand
    val rows = out.orderBy("col_name").collect()
    assert(rows.forall(_.getString(0) != "uniqueness")) // both went approx
  }

  test("checks on an empty table fail rather than pass vacuously") {
    val empty = fixture.filter(col("id") === -1L)
    val rows = Checks.run(empty, Seq(Checks.Completeness("id", 0.5))).collect()
    assert(rows.length == 1 && !rows.head.getBoolean(4))
    assert(rows.head.isNullAt(2)) // metric is honestly null, not 0
  }

  test("q_quality_checks plan reads events once") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("q_quality_checks")(
        spark, "/root/testdata/sf0.001")).toString
    // all six constraints must fuse into one scan: N separate quality
    // jobs at 100 TB is the anti-pattern this operator exists to avoid
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1, plan.take(3000))
  }
}
