package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE trainer: symbol lists on the driver, the textbook
    * formulation (count weighted adjacent pairs, argmax with (count desc,
    * pair asc) tiebreak, left-to-right non-overlapping merge). */
  private def bruteBpe(words: Map[String, Long],
                       merges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= merges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((step, l, r, n))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val m = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              m += l + r; i += 2
            } else { m += syms(i); i += 1 }
          }
          m.result()
        }(_._2)(_ + _)
        step += 1
      }
    }
    out.result()
  }

  test("bpeTrain replays the textbook merge sequence") {
    // repeated-symbol runs (aaaa: left-to-right non-overlap), a tie on
    // count (lexicographic pair tiebreak), and a merged symbol that
    // itself pairs again in later steps
    val words = Map("aaaa" -> 3L, "aabb" -> 2L, "abab" -> 2L,
      "banana" -> 5L, "bandana" -> 1L, "low" -> 7L, "lowest" -> 2L)
    val df = words.toSeq.toDF("w", "freq")
    val got = TextAnalysis.bpeTrain(df, "w", "freq", merges = 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == bruteBpe(words, 12))
  }

  test("bpeTrain stops when no pair remains") {
    val words = Map("ab" -> 1L, "cd" -> 2L)
    val df = words.toSeq.toDF("w", "freq")
    val got = TextAnalysis.bpeTrain(df, "w", "freq", merges = 10)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    // merge 1: (c,d) n=2; merge 2: (a,b) n=1; then single symbols only
    assert(got == Seq((1, "c", "d", 2L), (2, "a", "b", 1L)))
  }
}
