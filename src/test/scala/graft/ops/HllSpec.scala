package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HyperLogLog: register-state bound, max-merge ≡ direct, estimate
  * accuracy at m=64 (~13% standard error), linear-counting branch. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int, groups: Int) =
    (1 to n).map(i => (s"g${i % groups}", s"user_$i")).toDF("g", "v")

  test("register table is bounded at 64 rows per group at any cardinality") {
    val regs = Sketch.hllRegisters(data(20000, 2), Seq("g"), "v")
    val per = regs.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(per.values.forall(_ <= 64L), per.toString)
  }

  test("max-merged fine-grained registers give the bit-identical estimate") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"d${i % 7}", s"user_$i"))
      .toDF("g", "sub", "v")
    val direct = Sketch.hllDistinct(df, "g", "v", "n")
      .as[(String, Double)].collect().toMap
    val merged = Sketch.hllEstimate(
      Sketch.hllRegisters(df, Seq("g", "sub"), "v")
        .groupBy("g", "j").agg(max("mj").as("mj")),
      "g", "n").as[(String, Double)].collect().toMap
    assert(direct == merged)
  }

  test("estimate lands within 4 standard errors of the truth") {
    // m=64 ⇒ se ≈ 1.04/√64 = 13%; 4σ = 52% — a loose but real bound
    val est = Sketch.hllDistinct(data(6000, 1), "g", "v", "n")
      .as[(String, Double)].collect().head._2
    assert(est > 6000 * 0.48 && est < 6000 * 1.52, s"est=$est")
  }

  test("small cardinalities take the exact-ish linear-counting branch") {
    val est = Sketch.hllDistinct(data(8, 1), "g", "v", "n")
      .as[(String, Double)].collect().head._2
    // 64·ln(64/V) with V >= 56 empty registers stays within ±2 of 8
    assert(math.abs(est - 8.0) <= 2.0, s"est=$est")
  }

  test("estimate is layout-invariant (max-registers commute)") {
    val df = data(3000, 4)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.hllDistinct(d, "g", "v", "n").as[(String, Double)].collect().toMap
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }
}
