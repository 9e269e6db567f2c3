package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Exact-integer power iteration: bit-equality with a brute driver
  * replay (distributed moment pass included), dominant-direction
  * recovery, and layout invariance. */
class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vecs: Seq[Array[Float]], iters: Int): (Seq[Long], Long) = {
    val d = vecs.head.length
    val x = vecs.map(_.map(e => BigInt(math.floor(e.toDouble * 1048576.0).toLong)))
    val n = BigInt(x.length)
    val s = Array.tabulate(d)(j => x.map(_(j)).sum)
    val m = Array.tabulate(d, d)((j, k) => x.map(r => r(j) * r(k)).sum)
    val c = Array.tabulate(d, d)((j, k) => n * m(j)(k) - s(j) * s(k))
    var v = Array.fill(d)(BigInt(1048576))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * v(k)).sum)
      val mx = w.map(_.abs).max
      v = w.map(_ * 1048576 / mx)
    }
    val num = (for (j <- 0 until d; k <- 0 until d) yield v(j) * c(j)(k) * v(k)).sum
    val den = v.map(q => q * q).sum * n * n
    (v.map(_.toLong).toSeq, (num / den).toLong)
  }

  private def run(df: DataFrame, d: Int): (Seq[Long], Long) = {
    val rows = Similarity.topPrincipalComponent(df, "e", dims = d, iters = 8)
      .orderBy("dim").as[(Int, Long, Long)].collect()
    (rows.map(_._2).toSeq, rows.head._3)
  }

  // deterministic pseudo-noise fixture: dominant variance on axis 0
  private val vecs: Seq[Array[Float]] = (1 to 40).map { i =>
    Array(
      (i % 11).toFloat - 5.0f, // wide spread
      ((i * 7) % 3).toFloat * 0.1f, // narrow
      ((i * 13) % 5).toFloat * 0.05f)
  }

  test("engine replays the brute BigInt pipeline bit-for-bit") {
    val got = run(vecs.map(v => Tuple1(v)).toDF("e"), 3)
    assert(got == brute(vecs, 8))
  }

  test("the dominant axis carries the largest loading and variance is positive") {
    val (v, lambda) = run(vecs.map(v => Tuple1(v)).toDF("e"), 3)
    assert(v.map(math.abs).zipWithIndex.maxBy(_._1)._2 == 0, v.toString)
    assert(lambda > 0L)
  }

  test("component is bit-identical across partition layouts") {
    val df = vecs.map(v => Tuple1(v)).toDF("e")
    assert(run(df.repartition(1), 3) == run(df.repartition(7), 3))
  }

  test("all-but-the-top projection is EXACTLY orthogonal to the component") {
    // x'ᵀṽ = (xᵀṽ)(ṽᵀṽ) − (xᵀṽ)(ṽᵀṽ) = 0 in exact integer arithmetic —
    // not approximately: the scaled projector cancels algebraically
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "e")
    val pc = Similarity.topPrincipalComponent(df, "e", dims = 3, iters = 8)
      .orderBy("dim").as[(Int, Long, Long)].collect().map(_._2)
    val vt = pc.map(_ / 1024L)
    val proj = Similarity.allButTop(df, "id", "e", pc)
      .as[(Long, Seq[Double])].collect()
    proj.foreach { case (id, va) =>
      // coordinates are exact integers inside double range — dot in BigInt
      val d = va.zip(vt)
        .map { case (a, b) => BigInt(a.toLong) * BigInt(b) }.sum
      assert(d == BigInt(0), s"id=$id residual=$d")
    }
    // and the projection actually moved something
    assert(proj.exists(_._2.exists(_ != 0.0)))
  }
}
