package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CountMinLongs

/** Count-Min sketch: the one-sided error guarantee, element-wise
  * mergeability (the property that makes pre-aggregated sketches
  * compose), portability of the bucket hash between the imperative
  * aggregate and the SQL expression path, and the fixed-state bound. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val d = 4
  private val w = 64

  private lazy val values: Seq[String] =
    (1 to 500).map(i => s"k${i % 37}") ++ Seq.fill(100)("hot")

  test("cms estimate is >= exact count for every key (one-sided error)") {
    val df = values.toDF("v")
    val sk = df.agg(Sketch.cmsSketch(col("v"), d, w).as("sk"))
    val exact = df.groupBy("v").agg(count(lit(1)).as("n"))
    val rows = exact.crossJoin(sk)
      .select(col("v"), col("n"),
        Sketch.cmsEstimate(col("sk"), col("v"), d, w).as("est"))
      .collect()
    assert(rows.length == 38)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"underestimate for ${r.getString(0)}")
    }
  }

  test("a single-key sketch estimates exactly") {
    val df = Seq.fill(42)("only").toDF("v")
    val sk = df.agg(Sketch.cmsSketch(col("v"), d, w).as("sk"))
    val est = sk.select(Sketch.cmsEstimate(col("sk"), lit("only"), d, w))
      .head().getLong(0)
    assert(est == 42L)
  }

  test("sketches of disjoint halves merge to the full sketch element-wise") {
    val (l, r) = values.splitAt(values.size / 2)
    val full = values.toDF("v").agg(Sketch.cmsSketch(col("v"), d, w)).head().getSeq[Long](0)
    val a = l.toDF("v").agg(Sketch.cmsSketch(col("v"), d, w)).head().getSeq[Long](0)
    val b = r.toDF("v").agg(Sketch.cmsSketch(col("v"), d, w)).head().getSeq[Long](0)
    assert(a.zip(b).map { case (x, y) => x + y } == full)
  }

  test("bucket hash matches the portable SQL expression for every row") {
    val df = values.distinct.toDF("v")
    (0 until d).foreach { i =>
      val sqlBucket = (conv(substring(md5(
          concat(lit(s"$i:"), col("v")).cast("binary")), 1, 4), 16, 10)
        .cast("int") % w).cast("int")
      val rows = df.select(col("v"), sqlBucket.as("b")).collect()
      rows.foreach { r =>
        assert(CountMinLongs.bucket(i, r.getString(0), w) == r.getInt(1))
      }
    }
  }

  test("constructor bounds reject degenerate sketch shapes") {
    intercept[IllegalArgumentException](CountMinLongs(null, 0, 64))
    intercept[IllegalArgumentException](CountMinLongs(null, 4, 1))
    intercept[IllegalArgumentException](CountMinLongs(null, 17, 64))
    intercept[IllegalArgumentException](
      graft.ops.Dedup.prefixJaccardCandidates(values.toDF("v"), "v", "v", 0.0))
    intercept[IllegalArgumentException](
      graft.functions.WinnowFps(null, 1, 4))
    intercept[IllegalArgumentException](
      graft.ops.Graph.pageRank(values.toDF("v"), "v", "v", "v", iters = 0))
  }

  test("state is exactly d*w counters and total mass is d * row count") {
    val sk = values.toDF("v").repartition(7)
      .agg(Sketch.cmsSketch(col("v"), d, w)).head().getSeq[Long](0)
    assert(sk.size == d * w)
    assert(sk.sum == d.toLong * values.size)
  }
}
