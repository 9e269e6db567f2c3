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
    score(tf, dfreq, stats, k, k1, b)
  }

  /** The ONE BM25 scoring tail (Okapi tf-saturation, Lucene-floored idf,
    * k-bounded heap) shared by [[bm25TopK]] and [[scoreIndex]] — two
    * copies of a ranking formula WILL drift. `tf` carries
    * (doc_id, dl, term, tf); `dfreq` (term, df); `stats`
    * (n_docs, avgdl) as one row. */
  private def score(tf: DataFrame, dfreq: DataFrame, stats: DataFrame,
                    k: Int, k1: Double, b: Double): DataFrame =
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

  /** Persist an index MV as catalog tables: postings BUCKETED (and
    * sorted) by term — the on-disk inverted-index layout, so the read
    * path ([[scoreIndex]]'s `term IN (...)` filter) opens only the
    * query terms' buckets (bucket pruning, plan-guarded in SearchSpec)
    * instead of scanning the corpus-sized postings relation; dfreq and
    * stats are vocab-sized / 1-row side tables. */
  def persistIndex(ix: Bm25Index, prefix: String, buckets: Int = 8): Unit = {
    Layout.writeBucketed(ix.postings, s"${prefix}_postings", "term", buckets)
    Layout.writeTable(ix.dfreq, s"${prefix}_dfreq")
    Layout.writeTable(ix.stats, s"${prefix}_stats")
  }

  /** Δ-sized maintenance of a persisted index under append-only arrival
    * (disjoint new doc ids): delta postings APPEND into the bucketed
    * table (new files per bucket — the base postings are never read,
    * rewritten or shuffled), dfs fold by per-term addition and stats by
    * scalar addition (vocab-sized / 1-row tables, localCheckpointed so
    * the overwrite never reads the files it replaces). */
  def appendIndex(delta: Bm25Index, prefix: String): Unit = {
    val spark = delta.postings.sparkSession
    delta.postings.write.mode("append").format("parquet")
      .bucketBy(bucketCount(spark, s"${prefix}_postings"), "term")
      .sortBy("term").saveAsTable(s"${prefix}_postings")
    val dfreq = spark.table(s"${prefix}_dfreq").unionByName(delta.dfreq)
      .groupBy("term").agg(sum("df").cast("long").as("df"))
      .localCheckpoint(true)
    Layout.writeTable(dfreq, s"${prefix}_dfreq")
    val stats = spark.table(s"${prefix}_stats").unionByName(delta.stats)
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("sum_dl").cast("long").as("sum_dl"))
      .localCheckpoint(true)
    Layout.writeTable(stats, s"${prefix}_stats")
  }

  /** The persisted index as an MV handle for [[scoreIndex]]. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                prefix: String): Bm25Index =
    Bm25Index(spark.table(s"${prefix}_postings"),
      spark.table(s"${prefix}_dfreq"), spark.table(s"${prefix}_stats"))

  private def bucketCount(spark: org.apache.spark.sql.SparkSession,
                          table: String): Int =
    spark.sql(s"DESCRIBE EXTENDED `$table`")
      .filter(col("col_name") === "Num Buckets")
      .head().getString(1).trim.toInt

  /** Score a bag-of-words query against an index MV — the read path of
    * the inverted index: postings filtered to the query terms (at scale
    * the postings MV is bucketed by term, so this is a pruned lookup,
    * not a corpus scan), term/scalar stats broadcast, k-bounded heap. */
  def scoreIndex(ix: Bm25Index, queryTerms: Seq[String], k: Int = 20,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    score(
      ix.postings.filter(col("term").isin(queryTerms: _*)),
      ix.dfreq.filter(col("term").isin(queryTerms: _*)),
      ix.stats.select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl")),
      k, k1, b)
  }
}
