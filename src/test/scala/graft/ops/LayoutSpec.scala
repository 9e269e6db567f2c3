package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** reference Morton interleave for the cross-check */
  private def mortonRef(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("zValue2 matches the bit-interleave reference") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535),
      (12345, 54321), (40000, 7), (1, 65535))
    val df = pts.map { case (x, y) => (x.toLong, y.toLong) }.toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y")).as("z"))
    val got = df.as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => mortonRef(x, y) })
  }

  test("bucketed tables sort-merge-join with zero Exchange in the join subtree") {
    val facts = (1L to 400L).map(i => (i % 50, i)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
    Layout.writeBucketed(facts, "graft_t_facts", "k", 4)
    Layout.writeBucketed(dims, "graft_t_dims", "k", 4)
    val joined = spark.table("graft_t_facts").hint("merge")
      .join(spark.table("graft_t_dims").withColumnRenamed("k", "k2"),
        col("k") === col("k2"))
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(joined).toString
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 400L)
  }

  test("z-ordered partitions are bounding boxes in BOTH dimensions") {
    // 64x64 grid; 16 partitions -> a perfect z-layout confines each
    // partition to a quadrant-ish box, while a linear x-sort leaves y
    // spanning its full range in every partition
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val parts = Layout.zOrdered(grid, 16, col("x"), col("y"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .as[(Int, Long, Long)].collect()
    assert(parts.length == 16)
    val avgX = parts.map(_._2).sum.toDouble / parts.length
    val avgY = parts.map(_._3).sum.toDouble / parts.length
    // full range is 63; both dims must be clustered, not just one
    assert(avgX < 32, s"x ranges too wide: $avgX")
    assert(avgY < 32, s"y ranges too wide: $avgY")
  }

  test("zOrdered plan range-partitions by the z-value") {
    val df = (0L until 100L).map(i => (i % 10, i / 10)).toDF("x", "y")
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      Layout.zOrdered(df, 4, col("x"), col("y"))).toString
    assert(plan.contains("rangepartitioning(_z"), plan.take(2000))
  }
}
