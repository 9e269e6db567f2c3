package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  test("weighted sample returns k rows, deterministic and layout-invariant") {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    def ids(parts: Int): Seq[Long] =
      Sampling.weightedSample(df.repartition(parts), "id", col("w"), 25)
        .select("id").as[Long].collect().sorted.toSeq
    val once = ids(1)
    assert(once.size == 25)
    assert(once == ids(13))
  }

  test("weighted sample favors heavy rows and excludes non-positive weights") {
    // 20 rows at weight 10000 vs 980 at weight 0.01: the 10-row sample
    // should be dominated by the heavy rows (selection prob ratio ~1e6)
    val rows = (1L to 1000L).map(i => (i, if (i <= 20) 10000.0 else 0.01)) ++
      Seq((2000L, 0.0), (2001L, -3.0))
    val sampled = Sampling.weightedSample(
        rows.toDF("id", "w"), "id", col("w"), 10)
      .select("id").as[Long].collect().toSeq
    assert(sampled.size == 10)
    assert(sampled.count(_ <= 20) >= 8, s"heavy rows underrepresented: $sampled")
    assert(!sampled.contains(2000L) && !sampled.contains(2001L))
  }

  test("sample below eligible-row count returns all eligible rows") {
    val df = (1L to 5L).map(i => (i, 1.0)).toDF("id", "w")
    assert(Sampling.weightedSample(df, "id", col("w"), 50).count() == 5)
  }

  test("txt_weighted_sample plan: bounded partial top-k, broadcast re-join") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("txt_weighted_sample")(
        spark, "/root/testdata/sf0.001")).toString
    // the k-bounded heap must run partially (map-side combine) so only
    // <=k candidates per partition cross the exchange; the winners must
    // come back via a broadcast probe, never shuffling the corpus
    assert(plan.contains("partial_topk_by_score"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }
}
