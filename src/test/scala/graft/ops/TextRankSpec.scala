package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** TextRank: exact fixed-point values on a hand-solvable graph, the
  * stop/shape filter, hub dominance, and layout invariance. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "and", "of")

  private def ranks(df: DataFrame): Map[String, Long] =
    TextAnalysis.textRank(df, "text", stops, iters = 5, minW = 2L)
      .as[(String, Long)].collect().toMap

  test("a two-word graph holds the exact fixed point") {
    // (alpha, beta) w=3 >= minW; tw=3 both sides, n=2:
    // p0 = 5e11, round: 75e9 + (5e11*85*3)//(100*3) = 5e11 — stationary
    val df = Seq.fill(3)("alpha beta").toDF("text")
    assert(ranks(df) == Map("alpha" -> 500000000000L, "beta" -> 500000000000L))
  }

  test("stopwords, short and non-alpha tokens never enter the graph") {
    // 'the' stopped, 'ab' too short, 'x9y' has a digit — only
    // (alpha, beta) survives the filter
    val df = Seq.fill(2)("the alpha beta ab x9y the").toDF("text")
    assert(ranks(df).keySet == Set("alpha", "beta"))
  }

  test("pairs below minW are dropped") {
    val df = Seq("alpha beta", "gamma delta").toDF("text")
    assert(ranks(df.union(Seq("alpha beta").toDF("text"))).keySet ==
      Set("alpha", "beta")) // (gamma, delta) seen once < 2
  }

  test("the hub of a star out-ranks its leaves") {
    val df = Seq.fill(2)("hub aaa hub bbb hub ccc").toDF("text")
    val r = ranks(df)
    assert(Seq("aaa", "bbb", "ccc").forall(w => r("hub") > r(w)))
  }

  test("ranks are bit-identical across partition layouts") {
    val df = (1 to 40).map(i =>
      s"alpha beta gamma delta w$i${"x" * (i % 3)}z alpha gamma").toDF("text")
    assert(ranks(df.repartition(1)) == ranks(df.repartition(7)))
  }

  test("driver gate replays the distributed loop bit-for-bit") {
    val df = (1 to 30).map(i =>
      s"one two three four five six one three five w${i % 4}ord").toDF("text")
    def run(gate: Long) = TextAnalysis
      .textRank(df, "text", stops, iters = 5, minW = 2L, localMaxEdges = gate)
      .as[(String, Long)].collect().toMap
    assert(run(0L) == run(65536L)) // distributed path == driver gate
  }

  test("stops are validated before SQL interpolation") {
    // a quoted stopword would otherwise be spliced into the filter
    // expression's literal list — reject it up front
    val df = Seq("alpha beta").toDF("text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.textRank(df, "text", stops = Seq("the", "o'brien"))
    }
    assert(e.getMessage.contains("stops must be"))
  }

  test("driver gate clamps, never wraps, above Int.MaxValue") {
    // localMaxEdges = 1L << 31 used to wrap to limit(1); clamped it still
    // routes this tiny graph through the driver solve with equal ranks
    val df = Seq.fill(3)("alpha beta").toDF("text")
    val got = TextAnalysis.textRank(df, "text", stops,
        iters = 5, minW = 2L, localMaxEdges = 1L << 31)
      .as[(String, Long)].collect().toMap
    assert(got == Map("alpha" -> 500000000000L, "beta" -> 500000000000L))
  }
}
