package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed exact-arithmetic k-means ([[Similarity.kmeansReport]]). */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated point clouds in 64-dim: cluster A at +0.4·e_d,
  // cluster B at -0.4·e_d, small deterministic per-row jitter
  private def twoClusters(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      val v = Array.tabulate(64)(d => sign * 0.4 + ((i * 31 + d * 7) % 11) * 1e-3)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("two separated clusters: each cell holds exactly one cloud, mse is the jitter") {
    val df = twoClusters(200)
    val r = Similarity.kmeansReport(df, "vec_id", "embedding", k = 2, maxIters = 10)
      .collect()
    assert(r.map(_.getLong(1)).sorted.toSeq == Seq(100L, 100L))
    // jitter amplitude 1e-2 → per-dim variance ≤ 1e-4; mse = 64-dim sum
    assert(r.forall(_.getDouble(3) < 64 * 1e-4))
    assert(r.forall(_.getDouble(3) >= 0.0))
    // centroid norm ≈ sqrt(64 · 0.4²) = 3.2, within jitter
    assert(r.forall(x => math.abs(x.getDouble(2) - 3.2) < 0.1))
  }

  test("layout-invariant: identical rows across partitionings") {
    val df = twoClusters(150)
    def run(d: DataFrame) =
      Similarity.kmeansReport(d, "vec_id", "embedding", k = 3, maxIters = 8)
        .collect().map(_.toSeq).toSeq
    val base = run(df)
    assert(run(df.repartition(13)) == base)
    assert(run(df.coalesce(1)) == base)
  }

  test("detected convergence is a true fixed point: early stop == longer cap") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.table(spark, dir, "embeddings")
    def run(maxIters: Int, detect: Boolean) =
      Similarity.kmeansReport(e, "vec_id", "embedding", k = 8,
        maxIters = maxIters, detectConverged = detect)
        .collect().map(_.toSeq).toSeq
    val capped = run(25, detect = false)
    assert(run(25, detect = true) == capped)   // detection never changes the answer
    assert(run(26, detect = true) == capped)   // fixture reaches the fixed point ≤ 25
  }

  test("small-corpus gate is bit-identical to the forced-distributed path") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.table(spark, dir, "embeddings")
    def run(localMax: Long) =
      Similarity.kmeansReport(e, "vec_id", "embedding", k = 8, maxIters = 25,
        localMaxRows = localMax).collect().map(_.toSeq).toSeq
    assert(run(0L) == run(Long.MaxValue))
  }

  test("kmeansAssign agrees with the report's cell populations, gated or not") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.table(spark, dir, "embeddings")
    val fromReport = Similarity.kmeansReport(e, "vec_id", "embedding", k = 8, maxIters = 25)
      .select("cell", "n").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    def counts(localMax: Long) =
      Similarity.kmeansAssign(e, "vec_id", "embedding", k = 8, maxIters = 25,
          localMaxRows = localMax)
        .groupBy("cell").count().orderBy("cell")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(counts(Long.MaxValue) == fromReport)
    assert(counts(0L) == fromReport) // forced-distributed iterations agree
  }

  test("assignment counts are exhaustive and nonempty-cell-only") {
    val df = twoClusters(120)
    val r = Similarity.kmeansReport(df, "vec_id", "embedding", k = 4, maxIters = 6)
      .collect()
    assert(r.map(_.getLong(1)).sum == 120L)
    assert(r.forall(_.getLong(1) > 0L))
    // cells are a subset of 0..k-1, strictly increasing (orderBy cell)
    val cells = r.map(_.getInt(0)).toSeq
    assert(cells == cells.sorted && cells.distinct == cells)
    assert(cells.forall(c => c >= 0 && c < 4))
  }
}
