package graft.tools

import org.apache.spark.sql.functions._

/** One-off probe: phase/round counts of the iterative graph ops on the
  * real sf fixtures, for README scale notes. Run with
  * `sbt "Test/runMain graft.tools.PhaseProbe [sfDir]"`. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    // same co-purchase pair derivation as q_components (support >= 2)
    val li = graft.Tables.table(spark, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("it")).distinct()
    val a = li.select(col("bk"), col("it").as("item_a"))
    val b = li.select(col("bk"), col("it").as("item_b"))
    val pairs = a.join(b, Seq("bk")).filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    val (hist, phases) = graft.ops.Graph.connectedComponentsStarWithPhases(
      pairs, "item_a", "item_b")
    val nComp = hist.agg(sum("n_components")).head().getLong(0)
    println(s"PROBE star phases=$phases components=$nComp dir=$dir")
    spark.stop()
  }
}
