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

  test("bpeTrain replays the textbook merge sequence on BOTH paths") {
    // repeated-symbol runs (aaaa: left-to-right non-overlap), a tie on
    // count (lexicographic pair tiebreak), and a merged symbol that
    // itself pairs again in later steps
    val words = Map("aaaa" -> 3L, "aabb" -> 2L, "abab" -> 2L,
      "banana" -> 5L, "bandana" -> 1L, "low" -> 7L, "lowest" -> 2L)
    val df = words.toSeq.toDF("w", "freq")
    def run(localMaxRows: Long) =
      TextAnalysis.bpeTrain(df, "w", "freq", merges = 12, localMaxRows)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val brute = bruteBpe(words, 12)
    // the distributed loop (string-replace merges) and the driver gate
    // (vector merges) must both replay the reference bit-for-bit
    assert(run(localMaxRows = 0) == brute)
    assert(run(localMaxRows = 65536) == brute)
  }

  test("bpeEncodeReport applies merges and counts symbols per group") {
    // "ab" expands and merges; "ab3" is opaque (digit) and is NEVER
    // touched even though it contains the merged pair's letters; "cd"
    // expands but no merge hits it; "aab" exercises left-to-right order
    val docs = Seq(
      ("s1", "ab ab3 cd"), // 2+1+2 = 5 before; merge(a,b): 1+1+2 = 4
      ("s1", "aab"),       // 3 before; a|ab after (a,b) merge -> 2
      ("s2", "ab ab")      // 4 before -> 2 after
    ).toDF("source", "text")
    val got = TextAnalysis
      .bpeEncodeReport(docs, "text", "source", Seq(("a", "b")))
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("s1", 2L, 8L, 6L, 0.75),
      ("s2", 1L, 4L, 2L, 0.5)))
    // a second-generation merge consumes the first's output symbol
    val got2 = TextAnalysis
      .bpeEncodeReport(docs, "text", "source", Seq(("a", "b"), ("ab", "ab")))
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // s2: "ab ab" -> (a,b): two "ab" words (separate words never merge
    // across the '|' boundary) -> still 2 symbols
    assert(got2 == Seq(
      ("s1", 2L, 8L, 6L, 0.75),
      ("s2", 1L, 4L, 2L, 0.5)))
  }

  test("bpeTrain stops when no pair remains") {
    val words = Map("ab" -> 1L, "cd" -> 2L)
    val df = words.toSeq.toDF("w", "freq")
    for (gate <- Seq(0L, 65536L)) {
      val got = TextAnalysis.bpeTrain(df, "w", "freq", merges = 10, gate)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      // merge 1: (c,d) n=2; merge 2: (a,b) n=1; then single symbols only
      assert(got == Seq((1, "c", "d", 2L), (2, "a", "b", 1L)), s"gate=$gate")
    }
  }

  test("bpeTrain fails loudly on contract-violating symbols, never injects") {
    // a vocab word carrying a quote would otherwise be interpolated into
    // the distributed loop's literal replace() expression
    val dirty = Seq(("a'b", 5L)).toDF("w", "freq")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(dirty, "w", "freq", merges = 2, localMaxRows = 0)
    }
    assert(e.getMessage.contains("contract violated"))
  }

  test("bpeTrain driver gate clamps, never wraps, above Int.MaxValue") {
    // localMaxRows = 1L << 31 used to wrap to limit(1) and pass the gate
    // on any corpus; clamped, it still routes this tiny vocab locally
    val words = Map("ab" -> 1L, "cd" -> 2L)
    val got = TextAnalysis.bpeTrain(words.toSeq.toDF("w", "freq"),
        "w", "freq", merges = 10, localMaxRows = 1L << 31)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "c", "d", 2L), (2, "a", "b", 1L)))
  }
}
