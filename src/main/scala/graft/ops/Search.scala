package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore

/** Keyword search: BM25 ranking (Robertson & Walker, SIGIR 1994; the
  * Okapi formulation with the Lucene-style floored idf) over a document
  * corpus, planned like an inverted index rather than a corpus scan per
  * query.
  *
  * Scale design: the posting list is built by exploding tokens and
  * IMMEDIATELY filtering to the query terms — the filter sits directly on
  * the generator, so only query-term postings ever materialize (at 100 TB
  * the explode-filter is the streaming analogue of an inverted-index
  * lookup). Document frequencies and the corpus stats (N, avgdl) are
  * term-level / scalar aggregates broadcast to the scoring join; the final
  * ranking is the k-bounded [[TopKByScore]] heap, so at most k candidates
  * per partition cross the exchange — no global sort.
  */
object Search {

  /** Top-k documents by BM25 score for a bag-of-words query.
    * Output: (doc_id, score) sorted by (score desc, doc_id asc). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val base = docs
      .filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        lower(col(textCol)).as("txt"))
      .withColumn("dl", TextAnalysis.tokenCount(col("txt")))
    val postings = base
      .select(col("doc_id"), col("dl"),
        explode(TextAnalysis.tokens(col("txt"))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = postings.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("s").as("score"))
      .agg(TopKByScore.topk_by_score(
        struct(col("score"), col("doc_id")), k).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id").as("doc_id"), round(col("t.score"), 4).as("score"))
  }

  /** The BM25 index as a maintainable MATERIALIZED VIEW — the three
    * relations a real inverted index persists, each merged under
    * append-only document arrival without touching the base corpus:
    * postings merge by UNION (disjoint doc ids → no combine), term
    * document-frequencies by per-term ADDITION, corpus stats by scalar
    * addition (dl kept as an integer SUM, so avgdl = sum_dl/n_docs is
    * exact merge-order-free arithmetic — a merged double `avg` would
    * not be). This is `ops/Incremental`'s rollup/KMV/IVF pattern applied
    * to text search: the index the whole corpus would produce, obtained
    * from delta-sized work. */
  final case class Bm25Index(postings: DataFrame, dfreq: DataFrame,
                             stats: DataFrame)

  /** Build the full-vocabulary index relations for one corpus slice. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val base = docs
      .filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        lower(col(textCol)).as("txt"))
      .withColumn("dl", TextAnalysis.tokenCount(col("txt")))
    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(TextAnalysis.tokens(col("txt"))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    Bm25Index(
      tf,
      tf.groupBy("term").agg(count(lit(1)).as("df")),
      base.agg(count(lit(1)).as("n_docs"),
        sum("dl").cast("long").as("sum_dl")))
  }

  /** Merge two index MVs (disjoint doc ids): postings append, df add,
    * stats add — Δ-sized, the base postings are never rescanned. */
  def mergeIndex(a: Bm25Index, b: Bm25Index): Bm25Index = Bm25Index(
    a.postings.unionByName(b.postings),
    a.dfreq.unionByName(b.dfreq)
      .groupBy("term").agg(sum("df").cast("long").as("df")),
    a.stats.unionByName(b.stats)
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("sum_dl").cast("long").as("sum_dl")))

  /** Score a bag-of-words query against an index MV — the read path of
    * the inverted index: postings filtered to the query terms (at scale
    * the postings MV is bucketed by term, so this is a pruned lookup,
    * not a corpus scan), term/scalar stats broadcast, k-bounded heap. */
  def scoreIndex(ix: Bm25Index, queryTerms: Seq[String], k: Int = 20,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val tf = ix.postings.filter(col("term").isin(queryTerms: _*))
    tf.join(broadcast(ix.dfreq.filter(col("term").isin(queryTerms: _*))), "term")
      .crossJoin(broadcast(ix.stats
        .select(col("n_docs"),
          (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))))
      .withColumn("idf", log(
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("s").as("score"))
      .agg(TopKByScore.topk_by_score(
        struct(col("score"), col("doc_id")), k).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id").as("doc_id"), round(col("t.score"), 4).as("score"))
  }
}
