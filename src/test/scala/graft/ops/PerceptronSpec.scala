package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch perceptron: bit-equality with the textbook driver loop, and the
  * partitioning-independence the all-integer arithmetic exists to buy. */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  // (y, x0 bias, x1, x2) rows: linearly separable on x1 - x2
  private val rows = Seq(
    (1L, 1L, 9L, 1L), (1L, 1L, 7L, 2L), (1L, 1L, 8L, 0L),
    (-1L, 1L, 1L, 9L), (-1L, 1L, 2L, 7L), (-1L, 1L, 0L, 8L),
    (1L, 1L, 6L, 3L), (-1L, 1L, 3L, 6L))

  private def brute(epochs: Int): Seq[Array[Long]] = {
    var w = Array(0L, 0L, 0L)
    (1 to epochs).map { _ =>
      val upd = Array(0L, 0L, 0L)
      for ((y, x0, x1, x2) <- rows) {
        val m = w(0) * x0 + w(1) * x1 + w(2) * x2
        if (y * m <= 0L) { upd(0) += y * x0; upd(1) += y * x1; upd(2) += y * x2 }
      }
      w = Array(w(0) + upd(0), w(1) + upd(1), w(2) + upd(2))
      w.clone()
    }
  }

  private def run(df: DataFrame, epochs: Int): Seq[(Int, Seq[Long])] =
    TextAnalysis.perceptronTrain(df, "y", Seq("x0", "x1", "x2"), epochs)
      .map { case (e, ws) => (e, ws.toSeq) }

  test("batch perceptron replays the textbook driver loop bit-for-bit") {
    val got = run(rows.toDF("y", "x0", "x1", "x2"), 6)
    val want = brute(6).zipWithIndex.map { case (w, i) => (i + 1, w.toSeq) }
    assert(got == want)
  }

  test("learned weights are partitioning-independent (integer Σ commutes)") {
    val df = rows.toDF("y", "x0", "x1", "x2")
    assert(run(df.repartition(1), 5) == run(df.repartition(7), 5))
  }

  test("a separable fixture is actually separated by the final weights") {
    val w = run(rows.toDF("y", "x0", "x1", "x2"), 8).last._2
    val perfect = rows.forall { case (y, x0, x1, x2) =>
      val m = w(0) * x0 + w(1) * x1 + w(2) * x2
      (m > 0L) == (y == 1L)
    }
    assert(perfect, s"weights $w do not separate the fixture")
  }
}
