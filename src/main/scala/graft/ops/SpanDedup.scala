package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact repeated-substring (span) dedup — the corpus-level operator of
  * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better": any k-token span occurring ≥ 2 times ACROSS the corpus
  * (including twice within one document) is a duplicated span. Two forms:
  *
  *  - [[coverage]]: per-document duplicated-span statistics (tokens lying
  *    inside any duplicated span) — the metric that decides whether a
  *    corpus needs span-level dedup at all, and the oracle-checkable form.
  *  - [[removeDupSpans]]: cleaned text with the KEEP-FIRST policy — the
  *    globally first occurrence of a duplicated k-gram (min (doc, pos))
  *    keeps its tokens; every later occurrence's tokens are dropped.
  *    Overlapping spans merge naturally because removal is by covered
  *    token POSITION, not by span.
  *
  * Scale shape (100 TB): token count T in, ~T k-gram rows out — the whole
  * pipeline is linear in T with constant factor k. One shuffle groups
  * k-grams for the frequency census (map-side partial aggregation shrinks
  * the exchange to distinct k-grams), one shuffle joins occurrences back
  * to the duplicated subset (AQE skew-splits the template-heavy keys), and
  * one shuffle re-assembles per-document coverage. Nothing is quadratic:
  * a k-gram occurring a million times contributes a million coverage rows,
  * not a million² pairs. Position explosion is k rows per duplicated
  * occurrence, bounded by k·T.
  */
object SpanDedup {

  /** One row per k-token window: (doc_id, n_tokens, pos0 0-based, kgram).
    * Documents shorter than k tokens survive with a null kgram row so
    * coverage can still report them (n_dup = 0). */
  private def kgrams(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 2, s"span length k=$k must be >= 2")
    Par.spread(docs.select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("_toks")))
      .withColumn("_kgs",
        when(size(col("_toks")) >= k,
          expr(s"transform(sequence(0, size(_toks) - $k), " +
            s"i -> concat_ws(' ', slice(_toks, i + 1, $k)))"))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), size(col("_toks")).as("n_tokens"),
        posexplode_outer(col("_kgs")).as(Seq("pos0", "kgram")))
  }

  /** k-grams occurring ≥ 2 times corpus-wide, with their globally first
    * occurrence (lexicographic min of (doc_id, pos0)) for keep-first. */
  private def duplicated(kg: DataFrame): DataFrame =
    kg.where(col("kgram").isNotNull)
      .groupBy("kgram")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos0"))).as("first_occ"))
      .where(col("cnt") >= 2)

  /** Per-document duplicated-span coverage:
    * (doc_id, n_tokens, n_dup, dup_frac) where n_dup counts tokens inside
    * ANY k-gram that occurs ≥ 2 times corpus-wide. */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val kg = kgrams(docs, idCol, textCol, k)
    val cov = kg.join(duplicated(kg).select("kgram"), Seq("kgram"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos0 + 1, pos0 + $k)")).as("cpos"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    kg.groupBy("doc_id").agg(max(col("n_tokens")).as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)) * lit(1.0) / col("n_tokens"), 4)
          .as("dup_frac"))
  }

  /** Cleaned corpus under keep-first: (doc_id, text) where every token
    * covered by a NON-FIRST occurrence of a duplicated k-gram is removed
    * (the first occurrence — and every unique span — is untouched). */
  /** CONTENT-DEFINED chunking (word-level CDC) + chunk-level dedup
    * report — the storage-dedup primitive applied to training text.
    * Fixed-stride chunking breaks under a one-word insertion (every
    * later chunk shifts); content-defined boundaries are a pure function
    * of the local 3-gram, so an edit only re-cuts the chunk it touches
    * and every identical passage downstream re-aligns — the shift-robust
    * complement to [[coverage]]'s fixed-k census. A boundary falls after
    * word p when `md5(w[p-2] w[p-1] w[p])` starts with '0' or '1'
    * (2/16 → mean chunk ≈ 8 words); chunk identity is the md5 of its
    * space-joined words; an instance is REDUNDANT when an identical
    * chunk exists at a smaller (doc_id, seg).
    *
    * Scale shape: token count T in, T window rows, one per-doc window
    * pass (documents are bounded, so the per-doc sort is bounded), one
    * shuffle on chunk hash for the redundancy rank (distinct chunks
    * after map-side combine), one shuffle back per doc. Nothing
    * quadratic, nothing driver-side.
    *
    * Returns one row per chunk INSTANCE:
    * (doc_id, seg, chunk_hash, n_words, dup_rank). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Par.spread(docs
        .select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .filter(col("text").isNotNull))
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val seg = words
      .withColumn("b",
        when(col("pos") >= 2 &&
            substring(md5(concat_ws(" ",
              lag("w", 2).over(byPos), lag("w", 1).over(byPos), col("w"))), 1, 1)
              .isin("0", "1"), 1L)
          .otherwise(0L))
      // a boundary after p starts a new chunk at p+1: this row's segment
      // counts only boundaries strictly BEFORE it
      .withColumn("seg", coalesce(
        sum(col("b")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val chunks = seg.groupBy("doc_id", "seg")
      .agg(count(lit(1)).as("n_words"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          p => p.getField("w")), " ")).as("chunk_hash"))
    chunks.withColumn("dup_rank", row_number().over(
      Window.partitionBy("chunk_hash").orderBy("doc_id", "seg")))
  }

  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    val kg = kgrams(docs, idCol, textCol, k)
    val removedPos = kg.join(duplicated(kg).select("kgram", "first_occ"), Seq("kgram"))
      .where(col("first_occ.doc_id") =!= col("doc_id") ||
             col("first_occ.pos0") =!= col("pos0"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos0 + 1, pos0 + $k)")).as("cpos"))
      .distinct()
    Par.spread(docs.select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("_toks")))
      .select(col("doc_id"), posexplode(col("_toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("cpos"), col("tok"))
      .join(removedPos, Seq("doc_id", "cpos"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(cpos, tok))), s -> s.tok)"))
        .as("text"))
  }
}
