package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchSpec extends SparkSpec {

  import spark.implicits._

  test("bm25 ranks exact-match and term-dense docs first") {
    val docs = Seq(
      (1L, "spark spark spark"),          // dense in the rare term
      (2L, "spark table table table"),    // one hit, longer doc
      (3L, "table row column filter"),    // no hits
      (4L, "spark"),                      // one hit, shortest doc
      (5L, "row row row row row row")     // no hits
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .orderBy(desc("score"), col("doc_id"))
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 4L, 2L)) // only matching docs appear
    assert(got.forall(_._2 > 0))
    // tf saturation: doc 1 (tf=3) beats doc 4 (tf=1), but not by 3x
    assert(got.head._2 < 3 * got(1)._2)
  }

  test("bm25 is layout-invariant") {
    val docs = (1L to 400L)
      .map(i => (i, s"term${i % 13} term${i % 7} filler word number$i"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Search.bm25TopK(docs.repartition(parts), "doc_id", "text",
        Seq("term3", "term5"), k = 15).orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
    assert(run(1) == run(13))
  }

  test("index MV merge scores exactly like the full-corpus index") {
    val docs = (1L to 300L)
      .map(i => (i, s"term${i % 11} term${i % 5} filler word number$i"))
      .toDF("doc_id", "text")
    val terms = Seq("term3", "term4")
    def score(ix: Search.Bm25Index) =
      Search.scoreIndex(ix, terms, k = 15).orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
    val full = score(Search.buildIndex(docs, "doc_id", "text"))
    // three disjoint arrival batches folded left — merge must be
    // associative-in-effect and never depend on batch sizes
    val batches = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
      .map(Search.buildIndex(_, "doc_id", "text"))
    assert(score(batches.reduce(Search.mergeIndex)) == full)
  }

  test("persisted bucketed postings: pruned reads, Δ append, same scores") {
    val docs = (1L to 300L)
      .map(i => (i, s"term${i % 11} term${i % 5} filler word number$i"))
      .toDF("doc_id", "text")
    val terms = Seq("term3", "term4")
    val prefix = "graft_test_bm25ix"
    Search.persistIndex(
      Search.buildIndex(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text"),
      prefix, buckets = 8)
    val baseFiles = spark.table(s"${prefix}_postings").inputFiles.toSet
    Search.appendIndex(
      Search.buildIndex(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text"),
      prefix)
    // Δ-sized maintenance: the append only ADDS bucket files — every
    // base postings file survives byte-identical (never reread/rewritten)
    val afterFiles = spark.table(s"${prefix}_postings").inputFiles.toSet
    assert(baseFiles.subsetOf(afterFiles) && afterFiles.size > baseFiles.size)
    // read path equality: catalog MV ≡ in-memory merged MV ≡ full index
    val scored = Search.scoreIndex(Search.loadIndex(spark, prefix), terms, 15)
      .orderBy("doc_id")
    val full = Search.scoreIndex(
        Search.buildIndex(docs, "doc_id", "text"), terms, 15)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(scored.as[(Long, Double)].collect().toSeq == full)
    // bucket pruning: the term IN (...) filter must open only the query
    // terms' buckets — a full postings scan at 100 TB is the difference
    // between an index lookup and a corpus pass
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(scored).toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n${plan.take(3000)}")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"postings scan opened every bucket: ${sel.get.matched}")
  }

  test("txt_bm25_topk plan: filter on the generator, bounded final top-k") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("txt_bm25_topk")(
        spark, "/root/testdata/sf0.001")).toString
    // the query-term filter must sit inside/directly over the Generate so
    // only matching postings materialize, and the ranking must be the
    // partial (map-side) bounded heap, not a global sort of all scores
    val genIdx = plan.linesIterator.indexWhere(_.contains("Generate explode"))
    assert(genIdx >= 0, plan.take(3000))
    assert(plan.contains("partial_topk_by_score"), plan.take(3000))
    val globalSorts = plan.linesIterator.count(l =>
      l.contains("Sort ") && l.contains("score"))
    assert(globalSorts == 0, plan.take(3000))
  }
}
