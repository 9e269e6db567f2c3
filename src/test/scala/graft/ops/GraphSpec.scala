package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank: mass conservation, symmetry, hub dominance, and
  * the bit-identical-across-layouts property the integer arithmetic
  * exists to provide. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .toDF("src", "dst", "w")

  private def ranks(e: DataFrame): Map[Long, Long] =
    Graph.pageRank(e, "src", "dst", "w").as[(Long, Long)].collect().toMap

  test("two symmetric nodes split the mass exactly evenly") {
    val r = ranks(sym((1L, 2L, 3L)))
    assert(r(1L) == r(2L))
    // mass ~1e12, minus bounded flooring loss per round
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.sum > 999999999000L)
  }

  test("hub of a star out-ranks every leaf") {
    val r = ranks(sym((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 1L)))
    val hub = r(1L)
    (2L to 5L).foreach(l => assert(hub > r(l)))
    (3L to 5L).foreach(l => assert(r(l) == r(2L))) // leaves identical
  }

  test("heavier edges pull proportionally more rank") {
    // 1-2 strongly tied, 3 attached weakly to 2
    val r = ranks(sym((1L, 2L, 10L), (2L, 3L, 1L)))
    assert(r(1L) > r(3L))
  }

  test("ranks are bit-identical across partition layouts") {
    val e = sym((1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 5L), (4L, 1L, 1L), (2L, 4L, 3L))
    val a = ranks(e.repartition(1))
    val b = ranks(e.repartition(7))
    assert(a == b)
  }
}
