package graft.ops

import graft.SparkSpec

/** Exact repeated-substring (span) dedup: corpus-wide duplicated k-gram
  * coverage and keep-first removal (Lee et al. 2022 semantics). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // d1 and d2 share the 4-token span "the quick brown fox"; d2 also
  // repeats "x y z" internally; d3 is all-unique; d4 is shorter than k.
  private def docs = Seq(
    (1L, "the quick brown fox jumps high"),
    (2L, "lazy dog sat the quick brown fox x y z then x y z end"),
    (3L, "completely unique words only here"),
    (4L, "too short")
  ).toDF("doc_id", "text")

  test("coverage marks exactly the tokens inside corpus-duplicated k-grams") {
    val cov = SpanDedup.coverage(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // d1: "the quick brown" + "quick brown fox" cover positions 1-4 → 4
    // d2: shared span covers {4..7}; "x y z" twice covers {8..10,12..14} → 10
    // d3: nothing duplicated; d4: shorter than k, zero coverage
    assert(cov == Seq(
      (1L, 6L, 4L, 0.6667),
      (2L, 15L, 10L, 0.6667),
      (3L, 5L, 0L, 0.0),
      (4L, 2L, 0L, 0.0)))
  }

  test("removeDupSpans keeps the globally-first occurrence, drops the rest") {
    val cleaned = SpanDedup.removeDupSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toMap
    // d1 owns the first occurrence of the shared span (doc 1 < doc 2)
    assert(cleaned(1L) == "the quick brown fox jumps high")
    // d2 loses the shared span AND the second "x y z" (first kept at pos 8-10)
    assert(cleaned(2L) == "lazy dog sat x y z then end")
    assert(cleaned(3L) == "completely unique words only here")
    assert(cleaned(4L) == "too short")
  }

  test("a document made entirely of one repeated span collapses to its first window") {
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val cov = SpanDedup.coverage(d, "doc_id", "text", k = 2)
      .as[(Long, Long, Long, Double)].head()
    // every adjacent pair ("a b", "b a") occurs ≥2× → all 6 tokens covered
    assert(cov == ((1L, 6L, 6L, 1.0)))
    val cleaned = SpanDedup.removeDupSpans(d, "doc_id", "text", k = 2)
      .as[(Long, String)].head()
    // non-first occurrences "a b"@2,@4 and "b a"@3 cover positions {3..6};
    // only the first window survives
    assert(cleaned == ((1L, "a b")))
  }

  test("cdcChunks: identical docs share every chunk; an instance table partitions the doc") {
    val d = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"),
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"),
      (3L, "totally different words everywhere nothing shared at all")
    ).toDF("doc_id", "text")
    val ch = SpanDedup.cdcChunks(d, "doc_id", "text")
      .as[(Long, Long, Long, String, Int)].collect()
    // chunks partition each doc: word counts per doc sum to the doc length
    val perDoc = ch.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc == Map(1L -> 16L, 2L -> 16L, 3L -> 8L))
    // doc 2 is byte-identical to doc 1 → same boundaries, same hashes,
    // every doc-2 instance ranked second
    val h1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._4).toSeq
    val h2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._4).toSeq
    assert(h1 == h2)
    assert(ch.filter(_._1 == 1L).forall(_._5 == 1))
    assert(ch.filter(_._1 == 2L).forall(_._5 == 2))
  }

  test("cdcChunks boundaries are shift-robust: a prefix edit re-aligns downstream") {
    // 120 deterministic pseudo-words; the edited doc prepends one word
    val base = (0 until 120).map(i => s"tok${(i * 37) % 50}x$i").mkString(" ")
    val d = Seq((1L, base), (2L, s"INSERTED $base")).toDF("doc_id", "text")
    val ch = SpanDedup.cdcChunks(d, "doc_id", "text")
      .as[(Long, Long, Long, String, Int)].collect()
    val h1 = ch.filter(_._1 == 1L).map(_._4).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._4).toSet
    // content-defined boundaries re-synchronize after the edit: most
    // chunks survive identically (fixed-stride windows would share none)
    val shared = (h1 & h2).size
    assert(shared * 2 >= h1.size,
      s"only $shared of ${h1.size} chunks re-aligned after a prefix insert")
  }

  test("plan guard: census + join-back, nothing pairwise") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      SpanDedup.coverage(docs, "doc_id", "text", k = 3)).toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }
}
