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

  // adversarial shape for the hash-min init: one dense cluster (930
  // points on axis 0) plus 7 sparse far clusters (10 points each on
  // axes 1..7) — md5 order samples ∝ population, so hash-min seeds
  // land almost surely inside the dense cluster, while the k-means‖
  // init samples candidates ∝ squared-distance mass and the greedy
  // weighted k-center recluster spreads the seeds across all clusters
  private def clumped(): DataFrame = {
    val rows = (0 until 1000).map { i =>
      val cl = if (i < 930) 0 else 1 + (i - 930) / 10
      val v = Array.tabulate(64)(d =>
        (if (d == cl) 0.8 else 0.0) + ((i * 31 + d * 7) % 11) * 1e-3)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("k-means‖ init escapes the clumped-seed failure mode") {
    val df = clumped()
    def distortion(parInit: Boolean) =
      Similarity.kmeansReport(df, "vec_id", "embedding", k = 8, maxIters = 25,
          parallelInit = parInit)
        .agg(sum(col("mse") * col("n"))).head.getDouble(0)
    val hashmin = distortion(parInit = false)
    val kpar = distortion(parInit = true)
    // measured: 38.83 vs 0.64 — Lloyd's cannot crawl the clumped seeds
    // out of the dense cluster; the distance-aware init recovers every
    // true cluster (jitter-level distortion)
    assert(kpar < hashmin / 10)
    assert(kpar < 1.0)
  }

  test("k-means‖ IVF quantizer keeps every cell populated on clumped data") {
    val df = clumped()
    def nonemptyCells(cs: Array[Array[Double]]): Long =
      Similarity.assignCells(df, "vec_id", "embedding", cs)
        .select("cell").distinct().count()
    val hashmin = nonemptyCells(
      Similarity.trainCenters(df, "vec_id", "embedding", 8, 4096))
    val kpar = nonemptyCells(
      Similarity.trainCentersKpar(df, "vec_id", "embedding", 8, 4096))
    // measured: hash-min leaves 4 of 8 cells empty (all seeds in the
    // dense cluster); k-means‖ isolates each true cluster in its own
    // cell — at 100 TB, the merged sparse clusters are the probe tails
    assert(kpar == 8L && hashmin < 8L)
  }

  test("k-means‖ init: gate is bit-identical and layout-invariant") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.table(spark, dir, "embeddings")
    def run(localMax: Long, d: DataFrame = e) =
      Similarity.kmeansReport(d, "vec_id", "embedding", k = 8, maxIters = 25,
        localMaxRows = localMax, parallelInit = true)
        .collect().map(_.toSeq).toSeq
    val base = run(Long.MaxValue)
    assert(run(0L) == base) // forced-distributed Lloyd's, same init path
    assert(run(Long.MaxValue, e.repartition(13)) == base)
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
