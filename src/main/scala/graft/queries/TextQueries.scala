package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IntervalJoin, Multimodal, TextAnalysis}

/** Text-analysis / dedup / multimodal queries over `documents`.
  * Oracle-checked where DuckDB can express the same computation; the
  * hash/LSH operators (engine-specific hash functions) are declared without
  * oracle → driver rows-only check. */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.table(s, dir, "documents")

  /** RAKE phrase-boundary stopwords — part of the operator contract,
    * embedded identically in the engine and the oracle SQL. */
  private val RakeStops = Seq("the", "a", "an", "of", "and", "in", "to",
    "is", "on", "for", "with", "as", "by", "at")
  /** txt_bpe_vocab oracle: the 48 BPE merge steps unrolled as chained
    * CTE triples (pair counts → argmax → replace), each step the exact
    * relational statement of [[graft.ops.TextAnalysis.bpeTrain]]'s
    * iteration. Symbol strings are space-wrapped (" s1  s2 ") so the
    * replace literal can never match inside a symbol; DuckDB's replace
    * is left-to-right non-overlapping like the JVM's — the BPE rule. */
  /** txt_bm25_append AND txt_bm25_bucketed oracle: FULL recompute over
    * the whole corpus — any MV maintenance path (in-memory merge or
    * persisted bucketed table + delta append) must reproduce it exactly;
    * avgdl as sum/count mirrors the engine's integer-sum stats merge. */
  private val bm25FullRecomputeSql: String =
    """WITH base AS (
      |  SELECT doc_id, lower(text) AS txt,
      |         len(string_split_regex(trim(lower(text)), '\s+')) AS dl
      |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
      |p AS (SELECT doc_id, dl,
      |             unnest(string_split_regex(trim(txt), '\s+')) AS term
      |      FROM base),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      |       WHERE term IN ('spark', 'vector', 'merge') GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs,
      |                 CAST(sum(dl) AS BIGINT)::DOUBLE / count(*) AS avgdl
      |          FROM base),
      |sc AS (SELECT tf.doc_id,
      |              ln(((n_docs - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
      |                * tf::DOUBLE * 2.2::DOUBLE
      |                / (tf::DOUBLE + 1.2::DOUBLE *
      |                   (0.25::DOUBLE + 0.75::DOUBLE * dl::DOUBLE / avgdl)) AS s
      |       FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats),
      |agg AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY 1),
      |top AS (SELECT doc_id, score FROM agg
      |        ORDER BY score DESC, doc_id ASC LIMIT 20)
      |SELECT doc_id, round(score, 4) AS score FROM top ORDER BY doc_id""".stripMargin

  /** The shared BPE-training CTE chain (w0 word vocab + per-step pair
    * count / argmax / merge-apply CTEs, all MATERIALIZED so DuckDB
    * replays the chain linearly instead of inlining it exponentially) —
    * the relational statement of [[graft.ops.TextAnalysis.bpeTrain]],
    * used by both the vocab and encode oracles. */
  private def bpeChainSql(merges: Int): String = {
    val iters = (1 to merges).map { i =>
      s"""x$i AS MATERIALIZED (SELECT unnest(list_transform(t[2:], (x, j) ->
         |                      struct_pack(l := t[j], r := x))) AS p, freq
         |        FROM (SELECT str_split(trim(s), '  ') AS t, freq
         |              FROM w${i - 1})),
         |p$i AS MATERIALIZED (SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS n
         |        FROM x$i GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (SELECT replace(w.s, ' ' || m.l || '  ' || m.r || ' ',
         |                       ' ' || m.l || m.r || ' ') AS s, w.freq
         |        FROM w${i - 1} w, m$i m)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS s,
       |         CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |        FROM documents WHERE text IS NOT NULL)
       |  WHERE regexp_matches(w, '^[a-z]{2,}$$')
       |  GROUP BY 1),
       |$iters""".stripMargin
  }

  /** txt_bpe_vocab oracle: the learned merge table off the chain. */
  private def bpeVocabSql(merges: Int): String = {
    val union = (1 to merges).map(i =>
      s"SELECT $i AS step, l, r, n FROM m$i").mkString("\nUNION ALL\n")
    s"""WITH ${bpeChainSql(merges)}
       |SELECT CAST(step AS INT) AS step, l AS left_sym, r AS right_sym, n
       |FROM ($union)
       |ORDER BY step""".stripMargin
  }

  /** txt_bpe_encode oracle: the training chain, then the merges folded
    * over the document corpus — one replace CTE per step, LEFT-joined to
    * its merge row so an exhausted merge table leaves documents
    * unchanged (mirroring the engine's early stop). */
  private def bpeEncodeSql(merges: Int): String = {
    val docIters = (1 to merges).map { i =>
      s"""e$i AS MATERIALIZED (
         |  SELECT d.source, d.n_before,
         |         CASE WHEN m.l IS NULL THEN d.s
         |              ELSE replace(d.s, ' ' || m.l || '  ' || m.r || ' ',
         |                           ' ' || m.l || m.r || ' ') END AS s
         |  FROM e${i - 1} d LEFT JOIN m$i m ON true)""".stripMargin
    }.mkString(",\n")
    val nSyms = "len(list_filter(string_split_regex(s, ' +'), " +
      "x -> x <> '' AND x <> '|'))"
    s"""WITH ${bpeChainSql(merges)},
       |e0 AS MATERIALIZED (
       |  SELECT source, s, $nSyms AS n_before
       |  FROM (SELECT source,
       |               array_to_string(list_transform(
       |                 string_split_regex(trim(lower(text)), '\\s+'), w ->
       |                   CASE WHEN regexp_matches(w, '^[a-z]+$$')
       |                        THEN regexp_replace(w, '(.)', ' \\1 ', 'g')
       |                        ELSE ' ' || w || ' ' END), '|') AS s
       |        FROM documents WHERE text IS NOT NULL)),
       |$docIters
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(n_before) AS BIGINT) AS sym_before,
       |       CAST(sum($nSyms) AS BIGINT) AS sym_after,
       |       round(sum($nSyms)::DOUBLE / sum(n_before)::DOUBLE, 6) AS ratio
       |FROM e$merges GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private def rakeStopsSql: String =
    RakeStops.map(w => s"'$w'").mkString(", ")

  /** The integer surface-feature table shared by the perceptron queries
    * (one row per doc): y = ±1 on lang='en', x1 = per-mille English
    * stopword ratio, x2 = per-mille all-lowercase-alpha token ratio,
    * x3 = mean token length ×10, x4 = per-mille digit-bearing token
    * ratio, x5 = capped token count, x0 = bias. Every feature is an
    * exact 64-bit floor-division value — no float anywhere, so the
    * whole training loop replays bit-for-bit in the oracle. */
  private def perceptronFeats(d: DataFrame): DataFrame =
    d.filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .withColumn("t", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("n", size(col("t")).cast("long"))
      .select(col("source"),
        when(col("lang") === "en", 1L).otherwise(lit(-1L)).as("y"),
        lit(1L).as("x0"),
        expr("(1000 * cast(size(filter(t, x -> x IN " +
          "('the','a','of','and','to','in','is'))) AS BIGINT)) div n").as("x1"),
        expr("(1000 * cast(size(filter(t, x -> x rlike '^[a-z]+$')) " +
          "AS BIGINT)) div n").as("x2"),
        expr("(10 * aggregate(t, cast(0 AS BIGINT), " +
          "(acc, x) -> acc + length(x))) div n").as("x3"),
        expr("(1000 * cast(size(filter(t, x -> x rlike '[0-9]')) " +
          "AS BIGINT)) div n").as("x4"),
        least(col("n"), lit(500L)).as("x5"))

  private val PerceptronX = Seq("x0", "x1", "x2", "x3", "x4", "x5")
  private val PerceptronEpochs = 8

  /** The perceptron-training CTE chain: `feat` (mirroring
    * [[perceptronFeats]]) and one (margin, update-sum, weight) CTE
    * triple per epoch — the exact integer recurrence of
    * [[graft.ops.TextAnalysis.perceptronTrain]] unrolled (the
    * emb_kmeans / txt_bpe_vocab pattern). */
  private def perceptronChainSql(epochs: Int): String = {
    val xs = PerceptronX
    val margin = xs.map(c => s"f.$c * w.w_$c").mkString(" + ")
    val iters = (1 to epochs).map { i =>
      val upd = xs.map(c =>
        s"COALESCE(sum(CASE WHEN y * m <= 0 THEN y * $c END), 0) AS d_$c")
        .mkString(",\n         ")
      val next = xs.map(c => s"w.w_$c + u.d_$c AS w_$c").mkString(", ")
      s"""m$i AS MATERIALIZED (
         |  SELECT f.y, ${xs.map(c => s"f.$c").mkString(", ")}, $margin AS m
         |  FROM feat f, w${i - 1} w),
         |u$i AS (SELECT $upd FROM m$i),
         |w$i AS (SELECT $next FROM w${i - 1} w, u$i u)""".stripMargin
    }.mkString(",\n")
    s"""feat AS MATERIALIZED (
       |  SELECT source,
       |         CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
       |              ELSE CAST(-1 AS BIGINT) END AS y,
       |         CAST(1 AS BIGINT) AS x0,
       |         (1000 * CAST(len(list_filter(t, x -> x IN
       |            ('the','a','of','and','to','in','is'))) AS BIGINT)) // n AS x1,
       |         (1000 * CAST(len(list_filter(t, x ->
       |            regexp_matches(x, '^[a-z]+$$'))) AS BIGINT)) // n AS x2,
       |         (10 * CAST(list_sum(list_transform(t, x -> len(x)))
       |            AS BIGINT)) // n AS x3,
       |         (1000 * CAST(len(list_filter(t, x ->
       |            regexp_matches(x, '[0-9]'))) AS BIGINT)) // n AS x4,
       |         least(n, 500) AS x5
       |  FROM (SELECT source, lang,
       |               string_split_regex(trim(lower(text)), '\\s+') AS t,
       |               CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
       |                    AS BIGINT) AS n
       |        FROM documents
       |        WHERE text IS NOT NULL AND length(trim(text)) > 0)),
       |w0 AS (SELECT ${PerceptronX.map(c => s"CAST(0 AS BIGINT) AS w_$c").mkString(", ")}),
       |$iters""".stripMargin
  }

  /** txt_perceptron_weights oracle: the per-epoch weight trajectory. */
  private def perceptronWeightsSql(epochs: Int): String = {
    val union = (1 to epochs).map(i =>
      s"SELECT $i AS epoch, ${PerceptronX.map(c => s"w_$c").mkString(", ")} FROM w$i")
      .mkString("\nUNION ALL\n")
    s"""WITH ${perceptronChainSql(epochs)}
       |SELECT CAST(epoch AS INT) AS epoch,
       |       ${PerceptronX.map(c => s"CAST(w_$c AS BIGINT) AS w_$c").mkString(", ")}
       |FROM ($union)
       |ORDER BY epoch""".stripMargin
  }

  /** txt_perceptron oracle: train, then score every doc with the final
    * weights (pred = margin > 0 — the y·m ≤ 0 update test's decision
    * side) and fold the per-source confusion. */
  private def perceptronReportSql(epochs: Int): String = {
    val margin = PerceptronX.map(c => s"f.$c * w.w_$c").mkString(" + ")
    s"""WITH ${perceptronChainSql(epochs)},
       |sc AS (SELECT f.source, f.y, $margin AS m FROM feat f, w$epochs w)
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS n_en,
       |       CAST(count(*) FILTER (WHERE m > 0) AS BIGINT) AS pred_en,
       |       CAST(count(*) FILTER (WHERE (m > 0) = (y = 1)) AS BIGINT)
       |         AS n_correct,
       |       (10000 * CAST(count(*) FILTER (WHERE (m > 0) = (y = 1))
       |                     AS BIGINT)) // CAST(count(*) AS BIGINT) AS acc_fp
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** txt_textrank oracle: the co-occurrence graph (adjacent content
    * words after the stop/shape filter, undirected, weight = corpus
    * pair count ≥ 2) pushed through the SAME integer PageRank unroll as
    * q_pagerank — per round every word earns teleport Total·15%//n plus
    * its floor-divided in-mass. */
  private def textrankSql(iters: Int): String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""p$i AS (SELECT e.dst AS id,
         |             150000000000 // nn.n
         |               + CAST(sum((p.pr * 85 * e.w) // (100 * e.tw)) AS BIGINT) AS pr
         |      FROM e JOIN $prev p ON p.id = e.src, nn
         |      GROUP BY e.dst, nn.n)""".stripMargin
    }
    s"""WITH tk AS (
       |  SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |           x -> regexp_matches(x, '^[a-z]{3,}$$')
       |                AND x NOT IN ($rakeStopsSql)) AS ft
       |  FROM documents WHERE text IS NOT NULL),
       |pr0 AS (SELECT unnest(list_transform(ft[2:], (x, j) ->
       |                 struct_pack(l := ft[j], r := x))) AS p
       |        FROM tk),
       |pe AS MATERIALIZED (
       |       SELECT least(p.l, p.r) AS a, greatest(p.l, p.r) AS b,
       |              CAST(count(*) AS BIGINT) AS w
       |       FROM pr0 WHERE p.l <> p.r GROUP BY 1, 2 HAVING count(*) >= 2),
       |edges AS MATERIALIZED (
       |          SELECT a AS src, b AS dst, w FROM pe
       |          UNION ALL SELECT b, a, w FROM pe),
       |ow AS MATERIALIZED (
       |       SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
       |e AS MATERIALIZED (
       |      SELECT edges.src, edges.dst, edges.w, ow.tw
       |      FROM edges JOIN ow ON ow.src = edges.src),
       |nn AS (SELECT count(*) AS n FROM ow),
       |p0 AS (SELECT ow.src AS id, 1000000000000 // nn.n AS pr FROM ow, nn),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT id AS word, CAST(pr AS BIGINT) AS rank_fp FROM p$iters
       |ORDER BY rank_fp DESC, word LIMIT 30""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token statistics per language bucket
    "txt_token_stats" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .groupBy("lang")
        .agg(sum("n_tokens").as("total_tokens"),
          round(avg("n_tokens"), 4).as("avg_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // BPE-ish subword statistics: the LLM-token-count proxy next to the
    // whitespace count — fertility (subwords per whitespace token) is the
    // standard tokenizer-pressure signal per language bucket
    "txt_subword_stats" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("n_sub", TextAnalysis.subwordCount(col("text")))
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
        .groupBy("lang")
        .agg(sum("n_sub").as("total_subwords"),
          round(avg("n_sub"), 4).as("avg_subwords"),
          round(avg(col("n_sub").cast("double") / col("n_tok")), 4).as("fertility"))
        .orderBy("lang")),

    // Quality scoring aggregates
    "txt_quality" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("alpha_ratio", TextAnalysis.alphaRatio(col("text")))
        .withColumn("stop_hits", TextAnalysis.stopwordHits(col("text")))
        .withColumn("awl", TextAnalysis.avgWordLen(col("text")))
        .groupBy("lang")
        .agg(round(avg("alpha_ratio"), 4).as("avg_alpha_ratio"),
          sum("stop_hits").as("total_stop_hits"),
          round(avg("awl"), 4).as("avg_word_len"))
        .orderBy("lang")),

    // Language-ID heuristic distribution. (Measured: a Par.spread head
    // here LOSES — shuffling the full text column costs more than the
    // extra scan parallelism buys; the scorer rides the scan.)
    "txt_langid" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("lang_guess", TextAnalysis.langIdGuess(col("text")))
        .groupBy("lang_guess").agg(count(lit(1)).as("n"))
        .orderBy("lang_guess")),

    // Quality-gate filter — the canonical training-data selection op:
    // keep documents passing ratio/length thresholds, count the survivors
    "txt_quality_filter" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .withColumn("alpha_ratio", TextAnalysis.alphaRatio(col("text")))
        .filter(col("n_tokens") >= 30 && col("alpha_ratio") >= 0.6)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("kept_tokens"))
        .orderBy("lang")),

    // Corpus-drift / mixture QA: Jensen-Shannon divergence between each
    // source's unigram distribution and the whole corpus's — WITHOUT the
    // dense (source × vocab) grid. For a token absent from source s
    // (p = 0): m = q/2, so its term is 0.5·q·ln(q/(q/2)) = 0.5·ln2·q,
    // and the whole absent-token mass per source collapses to the closed
    // form 0.5·ln2·(1 − Σ_present q). That means the JSD needs only the
    // PRESENT (source, token) rows — a vocab-sized EQUI-join of the
    // per-source counts with the global counts on `token` (shuffle join;
    // the vocabulary is heaps-law unbounded at web scale, so it must
    // never broadcast — only the 1-row total and the |sources|-row
    // per-source totals do). Probabilities are exact BIGINT ratios, so
    // both engines feed ln identical doubles; present rows all have
    // p > 0 and q > 0, no guard needed.
    "txt_source_divergence" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      val sc = toks.groupBy("source", "token").agg(count(lit(1)).as("c"))
      val st = sc.groupBy("source").agg(sum("c").as("n_s"))
      val gc = toks.groupBy("token").agg(count(lit(1)).as("g"))
      val gt = gc.agg(sum("g").as("n_tot"))
      sc.join(gc.hint("merge"), Seq("token"))
        .join(broadcast(st), Seq("source"))
        .crossJoin(broadcast(gt))
        .withColumn("p", col("c").cast("double") / col("n_s"))
        .withColumn("q", col("g").cast("double") / col("n_tot"))
        .withColumn("m", (col("p") + col("q")) / 2)
        .withColumn("term",
          lit(0.5) * col("p") * log(col("p") / col("m"))
            + lit(0.5) * col("q") * log(col("q") / col("m")))
        .groupBy("source")
        .agg(max(col("n_s")).as("n_tokens"),
          sum("term").as("present_term"),
          sum("q").as("q_present"))
        .withColumn("jsd", round(col("present_term")
          + lit(0.5) * log(lit(2.0)) * (lit(1.0) - col("q_present")), 6))
        .select(col("source"), col("n_tokens"), col("jsd"))
        .orderBy("source")
    }),

    // Vocabulary analysis: top-10 terms per language (explode → map-side
    // combinable agg → small window over the vocabulary)
    // Top terms per language via the k-bounded [[TopKByCount]] aggregate:
    // the row_number-window form range-shuffles and sorts the whole
    // per-lang VOCABULARY (Heaps-law unbounded at corpus scale); the
    // typed aggregate ships ≤ 10 (count, token) pairs per lang per map
    // partition across the exchange and sorts nothing. Identical output
    // (total order (n DESC, token) matches the window's ORDER BY
    // bit-for-bit — the oracle is unchanged); a plan guard pins the
    // window-free shape.
    "txt_top_terms" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
        .groupBy("lang")
        .agg(graft.functions.TopKByCount.topk_by_count(
          struct(col("n"), col("token")), 10).as("tk"))
        .select(col("lang"), posexplode(col("tk")))
        .select(col("lang"), col("col.key").as("token"), col("col.n").as("n"),
          (col("pos") + 1).cast("long").as("rnk"))
        .orderBy("lang", "rnk")),

    // Zipf power-law fit per source: OLS of ln(freq) on ln(rank) over the
    // top 500 token ranks — the corpus-health screen (natural text sits
    // near slope −1; log-log linearity breaks on templated/synthetic
    // text). Contract shared exactly with the oracle: tokens with f ≥ 2
    // (the heavy tail never reaches rank 500, so the pre-filter cuts the
    // per-source window input from vocab-sized to near-bounded at scale),
    // rank by (f DESC, token), fit the first 500. Sums are 500 doubles per
    // source; round(4) absorbs summation-order ulps (txt_entropy
    // precedent).
    "txt_zipf_fit" -> ((s, dir) => {
      import graft.functions.TopKByCount.topk_by_count
      // top-500 (f DESC, token) ranks per source through the k-bounded
      // aggregate — the same window-free switch txt_top_terms took: the
      // row_number form range-shuffles and sorts the per-source f≥2
      // vocabulary (Heaps-law unbounded); this ships ≤500 (f, token)
      // pairs per source per map partition. The OLS sums then fold the
      // ≤500-element array IN PLACE (sequential, deterministic) — no
      // second exchange, no per-rank rows. Sources with a single rank
      // are excluded in both engines: x = ln(1) = 0 makes the OLS
      // denominator exactly 0 (Spark NaN vs DuckDB NULL — an
      // engine/oracle divergence on degenerate input, not a fit).
      val tk = docs(s, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("source", "t").agg(count(lit(1)).as("f"))
        .filter(col("f") >= 2)
        .groupBy("source")
        .agg(topk_by_count(struct(col("f"), col("t")), 500).as("tk"))
        .filter(size(col("tk")) >= 2)
      def asum(c: Column) = aggregate(c, lit(0.0), (a, x) => a + x)
      val xs = transform(col("tk"), (_, i) => log((i + 1).cast("double")))
      val ys = transform(col("tk"), e => log(e.getField("n").cast("double")))
      val fit = tk.select(col("source"),
        size(col("tk")).cast("long").as("n_ranks"),
        asum(xs).as("sx"), asum(ys).as("sy"),
        asum(zip_with(xs, ys, (x, y) => x * y)).as("sxy"),
        asum(transform(xs, x => x * x)).as("sxx"))
      val slope = (col("n_ranks") * col("sxy") - col("sx") * col("sy")) /
        (col("n_ranks") * col("sxx") - col("sx") * col("sx"))
      fit.select(col("source"), col("n_ranks"),
          round(slope, 4).as("zipf_slope"),
          round((col("sy") - slope * col("sx")) / col("n_ranks"), 4).as("ln_c"))
        .orderBy("source")
    }),

    // RAKE keyphrase extraction (Rose et al. 2010): candidate phrases are
    // maximal stopword-free token runs (both engines share the same
    // separator trick: stopwords → '|', join, split — no positional
    // window needed), capped at 5 tokens; word score = deg/freq over all
    // phrase occurrences per source, in 1e-9 integer fixed point
    // ((deg·1e9) div freq — floor division of positives, exact in both
    // engines) so phrase scores are INTEGER sums with deterministic
    // (score DESC, phrase) ranking; top 15 per source ship through the
    // k-bounded TopKByCount aggregate, never a phrase-vocabulary sort.
    "txt_keyphrases" -> ((s, dir) => {
      import graft.functions.TopKByCount.topk_by_count
      val marked = transform(TextAnalysis.tokens(col("text")),
        t => when(t.isInCollection(RakeStops), lit("|")).otherwise(t))
      val phrases = docs(s, dir)
        .select(col("source"),
          explode(split(concat_ws(" ", marked), "\\s*\\|\\s*")).as("p"))
        .filter(col("p") =!= "")
        .withColumn("ws", split(col("p"), " "))
        .filter(size(col("ws")) <= 5)
      val words = phrases.select(col("source"),
        size(col("ws")).cast("long").as("plen"), explode(col("ws")).as("t"))
      val wfp = words.groupBy("source", "t")
        .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        // 128-bit intermediate for deg·1e9 (the hits-l1norm pattern): a
        // long multiply overflows past deg ≈ 9.2e9 — plausible corpus
        // degree at 100 TB; div returns BIGINT either way, and the
        // quotient itself is bounded (deg/freq ≤ 5 tokens per phrase)
        .withColumn("wfp", expr("(cast(deg as decimal(38,0)) * 1000000000) div freq"))
      val scored = phrases.select("source", "p").distinct()
        .withColumn("t", explode(split(col("p"), " ")))
        .join(wfp.select("source", "t", "wfp"), Seq("source", "t"))
        .groupBy("source", "p").agg(sum("wfp").as("score_fp"))
      scored.groupBy("source")
        .agg(topk_by_count(struct(col("score_fp"), col("p")), 15).as("tk"))
        .select(col("source"), posexplode(col("tk")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.key").as("phrase"), col("col.n").as("score_fp"))
        .orderBy("source", "rnk")
    }),

    // Gopher-style quality signals: char-entropy (gibberish/repetition
    // detector, custom codegen expression) and top-bigram share (the
    // most-repeated word pair's fraction of all bigrams)
    "txt_entropy" -> ((s, dir) =>
      // empty docs are excluded on BOTH sides: the engine would average
      // them in as 0.0 while the oracle's unnest drops them — a real
      // semantic divergence, not just an fp nit
      docs(s, dir)
        .filter(length(col("text")) > 0)
        .withColumn("ent", graft.functions.GraftFunctions.char_entropy(col("text")))
        .groupBy("lang")
        .agg(round(avg("ent"), 4).as("avg_entropy"))
        .orderBy("lang")),

    "txt_repetition" -> ((s, dir) =>
      // one hashmap pass per document (custom expression) — the exploded
      // groupBy formulation shuffles every bigram in the corpus twice
      docs(s, dir)
        .select(col("lang"), graft.functions.GraftFunctions
          .bigram_top_share(TextAnalysis.tokens(col("text"))).as("share"))
        .filter(col("share").isNotNull)
        .groupBy("lang")
        .agg(round(avg("share"), 4).as("avg_top_bigram_share"))
        .orderBy("lang")),

    // PII redaction: deterministic contact strings derived from doc_id are
    // appended to a slice of the corpus (pure transform of driver data),
    // then scrubbed; the oracle reproduces construction + scrub in DuckDB
    "txt_redact" -> ((s, dir) => {
      val aug = docs(s, dir).withColumn("aug",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com via http://ex.com/d"), col("doc_id")))
          .otherwise(col("text")))
      aug
        .withColumn("n_emails", TextAnalysis.emailCount(col("aug")))
        .withColumn("n_urls", TextAnalysis.urlCount(col("aug")))
        .withColumn("len_delta",
          length(col("aug")) - length(TextAnalysis.redactPII(col("aug"))))
        .groupBy("lang")
        .agg(sum("n_emails").as("emails_redacted"),
          sum("n_urls").as("urls_redacted"),
          sum("len_delta").as("bytes_removed"),
          sum(when(col("n_emails") + col("n_urls") > 0, 1L).otherwise(0L)).as("docs_touched"))
        .orderBy("lang")
    }),

    // Deterministic md5-hash train/val/test split — leakage-safe, stable
    // under reprocessing, engine-reproducible
    "txt_train_split" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("split", TextAnalysis.trainSplit(col("doc_id")))
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .orderBy("split")),

    // Vocabulary coverage: build a top-500 token vocab from the TRAIN
    // split, then measure the out-of-vocabulary token rate per source on
    // the held-out splits — the tokenizer-fit signal a pretraining corpus
    // is screened with. Scale: the vocab is bounded (500 rows) and
    // broadcast, so the eval-side token stream never shuffles for the
    // membership test; the top-500 itself is TakeOrderedAndProject over
    // the partial-aggregated counts, never a global sort of the vocab.
    "txt_vocab_coverage" -> ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("split", TextAnalysis.trainSplit(col("doc_id")))
      val vocab = d.filter(col("split") === "train")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(500)
        .select(col("token"), lit(1L).as("in_v"))
      d.filter(col("split") =!= "train")
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
        .orderBy("source")
    }),

    // Stratified sample: majority-language downsampling (en 30%, zh 60%,
    // rest kept) via the deterministic id-hash rate filter
    "txt_stratified_sample" -> ((s, dir) =>
      docs(s, dir)
        .filter(TextAnalysis.stratifiedKeep(col("doc_id"), col("lang"),
          Map("en" -> 0.3, "zh" -> 0.6)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("lang")),

    // BM25 keyword search: top-20 documents for a 3-term query, planned
    // inverted-index style (explode filtered to query terms at the
    // generator, term stats broadcast, bounded top-k heap — no corpus
    // sort, no full posting materialization)
    "txt_bm25_topk" -> ((s, dir) =>
      graft.ops.Search.bm25TopK(docs(s, dir), "doc_id", "text",
          Seq("spark", "vector", "merge"), k = 20)
        .orderBy("doc_id")),

    // Incremental BM25 index MV: the inverted index's three relations
    // (postings, term dfs, corpus stats) built for the base corpus
    // (doc_id % 5 != 0) and MAINTAINED under an append batch (% 5 == 0)
    // by union / per-term addition / scalar addition — Δ-sized merge,
    // base postings never rescanned; then the same query scored on the
    // merged MV. The oracle recomputes BM25 over the WHOLE corpus from
    // scratch, so the hash match proves merge ≡ full recompute. avgdl
    // kept as integer sum_dl / n_docs (a merged double avg would not be
    // merge-order-free).
    "txt_bm25_append" -> ((s, dir) => {
      import graft.ops.Search
      val d = docs(s, dir)
      val ix = Search.mergeIndex(
        Search.buildIndex(d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text"),
        Search.buildIndex(d.filter(col("doc_id") % 5 === 0), "doc_id", "text"))
      Search.scoreIndex(ix, Seq("spark", "vector", "merge"), k = 20)
        .orderBy("doc_id")
    }),

    // The BM25 index MV PERSISTED as its on-disk layout: postings
    // bucketed+sorted by term (write-once keyed by source dir, the
    // q_bucketed_join pattern), base written whole, the %5==0 batch
    // APPENDED as new per-bucket files — base postings never reread or
    // shuffled — dfs/stats folded Δ-style; then the query scored off the
    // catalog tables, where the term IN (...) filter opens ONLY the
    // query terms' buckets (SelectedBucketsCount plan guard in
    // SearchSpec). Oracle: full recompute — merge ≡ from-scratch.
    "txt_bm25_bucketed" -> ((s, dir) => {
      import graft.ops.Search
      val d = docs(s, dir)
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val prefix = s"graft_bm25_$tag"
      if (!s.catalog.tableExists(s"${prefix}_postings")) {
        Search.persistIndex(
          Search.buildIndex(d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text"),
          prefix, buckets = 8)
        Search.appendIndex(
          Search.buildIndex(d.filter(col("doc_id") % 5 === 0), "doc_id", "text"),
          prefix)
      }
      Search.scoreIndex(Search.loadIndex(s, prefix),
          Seq("spark", "vector", "merge"), k = 20)
        .orderBy("doc_id")
    }),

    // Weighted sample: 40 documents drawn with probability proportional
    // to n_chars (length-proportional mixture construction) via the
    // deterministic A-ES key — bounded top-k agg, corpus never sorted
    "txt_weighted_sample" -> ((s, dir) =>
      graft.ops.Sampling.weightedSample(
          docs(s, dir).select("doc_id", "lang", "source", "n_chars"),
          "doc_id", col("n_chars"), k = 40)
        .orderBy("doc_id")),

    // Context-window packing: sequential fill into 4096-token bins
    "txt_pack_bins" -> ((s, dir) => {
      val withTokens = docs(s, dir)
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      TextAnalysis.packBins(withTokens, "doc_id", "n_tokens", budget = 4096L)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
        .orderBy("bin")
    }),

    // Exact heavy-hitter bigrams per language (boilerplate-phrase
    // detection): two-phase Misra-Gries — bounded candidate summary
    // (≤ k counters per group cross the exchange, NOT the full bigram
    // vocabulary) + exact recount of candidates only. Oracle-checked:
    // the two-phase output is EXACT, so DuckDB reproduces it with a
    // plain group-count + threshold.
    "txt_heavy_bigrams" -> ((s, dir) => {
      val t = TextAnalysis.tokens(col("text"))
      // fence after tokenizing: without it CollapseProject inlines the
      // split into every per-element lambda reference (2 splits/bigram)
      val toks = graft.plans.OptimizationBarrier.fence(
        docs(s, dir).select(col("lang"), t.as("t")).filter(size(t) >= 2))
      val bg = toks.select(col("lang"), explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
      graft.ops.HeavyHitters.frequentValues(bg, "lang", "bigram", support = 0.0023)
        .orderBy("lang", "bigram")
    }),

    // Per-document canonical fingerprint (exact-dedup key)
    "txt_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Exact dedup survivors (min doc_id per fingerprint)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")
        .select("doc_id").orderBy("doc_id")),

    // MinHash+LSH near-dup pairs, exact-Jaccard verified at ≥ 0.8.
    // Oracle-checked: 32 bands × 2 rows make the LSH miss probability at
    // j=0.8 equal (1−0.8²)³² ≈ 4e−15, so the verified output is the exact
    // ≥0.8 pair set DuckDB reproduces via a size-window all-pairs scan
    // (j ≥ t implies |A|,|B| within factor 1/t — a lossless prefilter).
    "dedup_minhash_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.jaccardVerify(
        Dedup.minhashCandidatePairs(d, "doc_id", "text", numPerm = 64, bands = 32),
        d, "doc_id", "text")
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Winnowing (MOSS) shared-substring pairs: window-min k-gram
    // fingerprints guarantee any shared run of >= w+k-1 chars yields a
    // common fingerprint — substring-level overlap detection that
    // Jaccard-style whole-set measures can't see. Boilerplate
    // fingerprints (df > 20) are dropped before the pair join (MOSS's
    // common-fingerprint filter — the same skew/bucket-blowup defense as
    // prefix filtering's rare-first order).
    // Exact repeated-substring coverage (Lee et al. 2022 span dedup): per
    // doc, the fraction of tokens inside any 8-gram that occurs >= 2 times
    // corpus-wide. Linear in corpus tokens (see ops/SpanDedup scale note);
    // summarized per source so the row count stays bounded while every
    // doc's coverage still feeds the hash.
    "txt_dup_spans" -> ((s, dir) => {
      val cov = graft.ops.SpanDedup.coverage(
        docs(s, dir).filter(col("text").isNotNull), "doc_id", "text", k = 8)
      docs(s, dir).select("doc_id", "source").join(cov, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_dup").as("dup_tokens"),
          round(sum("n_dup") * lit(1.0) / sum("n_tokens"), 4).as("dup_token_frac"),
          sum(when(col("n_dup") * lit(1.0) / col("n_tokens") >= 0.5, 1L)
            .otherwise(0L)).as("n_mostly_dup"))
        .orderBy("source")
    }),

    // Content-defined chunking dedup report: CDC boundaries from the
    // local 3-gram hash (shift-robust — a one-word edit re-cuts only
    // the chunk it touches, unlike fixed-stride windows), chunk
    // identity by content hash, an instance redundant when the same
    // chunk already exists at a smaller (doc, seg). Per-source: chunk
    // instances, redundant instances, redundant-token share, mean
    // chunk length — the sub-document storage-dedup signal next to
    // txt_dup_spans' fixed-k span census.
    "txt_cdc_chunks" -> ((s, dir) => {
      val ch = graft.ops.SpanDedup.cdcChunks(
        docs(s, dir).filter(col("text").isNotNull), "doc_id", "text")
      docs(s, dir).select("doc_id", "source").join(ch, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("dup_rank") > 1, 1L).otherwise(0L)).as("n_redundant"),
          round(sum(when(col("dup_rank") > 1, col("n_words")).otherwise(0L))
            * lit(1.0) / sum("n_words"), 4).as("redundant_token_share"),
          round(avg("n_words"), 4).as("avg_chunk_words"))
        .orderBy("source")
    }),

    // RAG chunking profile: 64-token windows at stride 48 (16-token
    // overlap) — per-source chunk counts, total chunk tokens (overlap
    // included: the embedding-cost number) and mean chunk size
    "txt_chunk_windows" -> ((s, dir) => {
      val chunks = TextAnalysis.chunkWindows(
        docs(s, dir).filter(col("text").isNotNull), "doc_id", "text",
        win = 64, stride = 48)
      docs(s, dir).select("doc_id", "source")
        .join(chunks, Seq("doc_id"))
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum("n_tokens").as("chunk_tokens"),
          round(avg("n_tokens"), 4).as("avg_chunk_tokens"))
        .orderBy("source")
    }),

    // Span-dedup YIELD: tokens before vs after keep-first removal — the
    // corpus-reduction number the removal operator buys. Counting
    // tokens_after from the RECONSTRUCTED text (single-space split of
    // removeDupSpans output) makes the oracle verify the remover itself,
    // not just the coverage arithmetic; the oracle derives the same
    // counts as n_tokens − removed-position count.
    "txt_span_yield" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("text").isNotNull)
      val cleaned = graft.ops.SpanDedup.removeDupSpans(d, "doc_id", "text", k = 8)
        .select(col("doc_id"),
          when(length(col("text")) === 0, 0L)
            .otherwise(size(split(col("text"), " ")).cast("long")).as("toks_after"))
      d.select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("toks_before"))
        .join(cleaned, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("toks_before").as("tokens_before"),
          sum(coalesce(col("toks_after"), lit(0L))).as("tokens_after"),
          round(sum(coalesce(col("toks_after"), lit(0L))) * lit(1.0)
            / sum("toks_before"), 4).as("keep_frac"))
        .orderBy("source")
    }),

    "txt_winnow_pairs" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("text").isNotNull)
      val fps = d.select(col("doc_id"),
        explode(TextAnalysis.winnowFingerprints(col("text"), k = 8, w = 8)).as("fp"))
      val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20).select("fp")
      val f = fps.join(rare, "fp")
      val sizes = f.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
      val shared = f.as("a").join(f.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
      shared
        .join(sizes.select(col("doc_id").as("id_a"), col("nfp").as("nfp_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("nfp").as("nfp_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("n_shared"),
          round(col("n_shared").cast("double") / least(col("nfp_a"), col("nfp_b")), 4)
            .as("containment"))
        .orderBy(desc("n_shared"), col("id_a"), col("id_b"))
        .limit(100)
    }),

    // Prefix-filtered near-dup pairs: the LOSSLESS candidate generator
    // (rare-first global shingle order, |x|−ceil(t|x|)+1 prefixes,
    // equi-join on prefix shingles — see Dedup.prefixJaccardCandidates).
    // Where MinHash banding argues a 4e-15 miss bound, prefix filtering
    // PROVES exact recall, so the oracle is the naive all-pairs scan: a
    // hash match certifies the optimization drops no qualifying pair.
    "dedup_prefix_jaccard" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.jaccardVerify(
        Dedup.prefixJaccardCandidates(d, "doc_id", "text", threshold = 0.8),
        d, "doc_id", "text")
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash near-dup pairs (custom expression + banding), md5 token-hash
    // variant so the DuckDB oracle reproduces signatures, bands, Hamming
    // distances AND the banding's partial recall above Hamming 3 exactly
    // (maxHamming=16 > the 4×16-band guarantee of 3 — extra pairs appear
    // only when they share a band, identically on both engines).
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 16,
          algo = graft.functions.SimHash64.Md5)
        .orderBy(col("hamming"), col("id_a"), col("id_b"))
        .limit(100)),

    // n-gram Jaccard near-dups with blocking (same source + similar
    // length) — candidate universe stays near-linear in corpus size, the
    // verifier scales with |pairs|. The length band is a non-equi
    // predicate, so it rides on IntervalJoin.withinValue: n_chars bucketed
    // into width-32 bins, equi-join on (source, bin) with ±1-bin explode,
    // exact |Δn_chars| <= 32 kept as the post-filter — per-source work is
    // local length-density × 3, not all-pairs. Oracle-checked: the
    // blocking is relational and the Jaccard arithmetic is exact integer
    // division, identical across engines (shingle-hash collisions aside).
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir)
      val keyed = d.select(col("doc_id"), col("source"), col("n_chars"))
      val pairs = IntervalJoin.withinValue(
          keyed.toDF("id_a", "source", "nc_a"),
          keyed.toDF("id_b", "source", "nc_b"),
          leftKey = "source", rightKey = "source",
          leftVal = "nc_a", rightVal = "nc_b", tolerance = 32)
        .filter(col("id_a") < col("r_id_b"))
        .select(col("id_a"), col("r_id_b").as("id_b"))
      Dedup.jaccardVerify(pairs, d, "doc_id", "text")
        .filter(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
        .limit(100)
    }),

    // Asymmetric CONTAINMENT dedup (Broder 1997's other measure): a short
    // doc living inside a long one — excerpts, quoted posts, boilerplate
    // wrappers — scores near 1.0 on containment while its Jaccard can be
    // arbitrarily low, so every resemblance-based family above misses it.
    // One exploded-shingle equi-join is both candidate generator and exact
    // counter; stop-shingles (df > 128) are dropped from the universe on
    // both engines, bounding the postings join at Σ df² ≤ 128·|postings|.
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5, maxDf = 128L,
          docRows = graft.Tables.footerRowCount(dir, "documents"))
        .select(col("id_a"), col("id_b"), col("common"),
          round(col("containment"), 4).as("containment"))
        .orderBy(round(col("containment"), 4).desc, col("id_a"), col("id_b"))
        .limit(100)),

    // Shingle-frequency COSINE dedup — the vector-model angle on word
    // trigram FREQUENCIES, third measure of the family (resemblance /
    // containment / cosine): repetition-aware where shingle SETS are
    // blind. Integer end-to-end: cos² in 1e-12 fixed point from
    // (dot², ‖a‖²·‖b‖²) with DECIMAL(38,0) intermediates, the ≥0.8 test
    // run as an exact integer comparison. Candidates and exact dots from
    // ONE df ≤ 128-capped postings-bucket mechanism (numerator and norms
    // both count the capped universe — the contract both engines share),
    // pair volume bounded at maxDf × |postings|.
    "dedup_cosine_tf" -> ((s, dir) =>
      Dedup.cosinePairsTf(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 128L,
          docRows = graft.Tables.footerRowCount(dir, "documents"))
        .orderBy(col("cos2_fp").desc, col("id_a"), col("id_b"))
        .limit(100)),

    // Robust per-source length outliers — median/MAD, the estimator that
    // survives the very outliers it hunts (mean/stddev is dragged by
    // them; Gopher-style fixed thresholds need per-corpus tuning).
    // EXACT medians at scale via Selection.groupedMedian: every source's
    // selection refined simultaneously, ≤ 6 histogram passes total
    // REGARDLESS of corpus size, O(sources × 4096) driver state, no
    // per-group sort. All arithmetic in doubled/quadrupled integers
    // (med_2x, mad_4x), so the |x−med| > 3·MAD test is an exact integer
    // comparison — bit-replayable by the oracle from plain medians.
    "txt_doc_outliers" -> ((s, dir) => {
      import graft.ops.Selection
      val d = docs(s, dir).select(col("source"), col("n_chars"))
      val med = Selection.groupedMedian(d, "source", "n_chars")
        .select(col("grp").as("source"), col("n").as("n_docs"),
          col("med_2x"))
      // dev2 = 2·|x − med| (integer); its doubled median = 4·MAD
      val dev = d.join(broadcast(med.select("source", "med_2x")), "source")
        .select(col("source"),
          abs(col("n_chars") * 2 - col("med_2x")).as("dev2"))
      val mad = Selection.groupedMedian(dev, "source", "dev2")
        .select(col("grp").as("source"), col("med_2x").as("mad_4x"))
      val out = dev.join(broadcast(mad), "source")
        .groupBy("source")
        .agg(sum(when(col("dev2") * 2 > col("mad_4x") * 3, 1L)
          .otherwise(0L)).as("n_outliers"))
      med.join(mad, "source").join(out, "source")
        .select(col("source"), col("n_docs"),
          (col("med_2x") / 2.0).as("med_chars"),
          (col("mad_4x") / 4.0).as("mad_chars"),
          col("n_outliers"))
        .orderBy("source")
    }),

    // Cross-snapshot dedup: incoming docs (doc_id % 7 != 0) that
    // near-duplicate any reference-corpus doc (doc_id % 7 == 0) at
    // Jaccard ≥ 0.8. Candidates come from banded LSH (incoming bands ×
    // reference bands, never incoming × reference); the oracle reproduces
    // the exact ≥0.8 cross-corpus pair set with an all-pairs scan (same
    // 4e-15 LSH miss-probability argument as dedup_minhash_pairs).
    "dedup_against_snapshot" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.againstReference(
        d.filter(col("doc_id") % 7 =!= 0), d.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", threshold = 0.8)
        .orderBy("doc_id")
    }),

    // Eval-contamination report: corpus docs (doc_id % 13 != 0) whose
    // trigram-shingle overlap with the benchmark slice (doc_id % 13 == 0)
    // reaches 50%. Engine hashes shingles (one-pass expression); the
    // oracle uses string shingles — overlap counts are hash-invariant.
    "txt_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.contaminationReport(
        d.filter(col("doc_id") % 13 =!= 0), d.filter(col("doc_id") % 13 === 0),
        "doc_id", "text", n = 3, minOverlap = 0.5)
        .orderBy("doc_id")
    }),

    // Token-budget mixture: admit docs per language in deterministic
    // md5-of-id order until the language's token budget is spent — the
    // epoch-mixture builder. Aggregated per language for the check.
    "txt_token_budget" -> ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      TextAnalysis.tokenBudgetSample(d, "doc_id", "n_tokens", "lang",
          Map("en" -> 3000L, "zh" -> 1500L), defaultBudget = 2000L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_kept"))
        .orderBy("lang")
    }),

    // Training-mixture domain weighting: temperature-scaled sampling
    // weights per source (w_i ∝ n_i^α with α = 1/2 — sqrt is correctly
    // rounded in every IEEE libm, so both engines get bit-identical
    // weights, unlike pow()). Downsamples the huge domains, upsamples the
    // small ones; `epochs_at_1m` is how many passes over a source a
    // 1M-token budget implies — the UniMax-style oversampling signal. The
    // Σ n_i^α normalizer is a broadcast scalar: one map-side-combined agg
    // of #sources rows, never a driver collect or an unpartitioned window.
    "txt_mixture_weights" -> ((s, dir) => {
      val perSource = docs(s, dir)
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .groupBy("source").agg(sum("n_tokens").as("n_tokens"))
      val z = perSource.agg(sum(sqrt(col("n_tokens"))).as("z"))
      perSource.crossJoin(broadcast(z))
        .select(col("source"), col("n_tokens"),
          round(sqrt(col("n_tokens")) / col("z"), 6).as("weight"),
          round(sqrt(col("n_tokens")) / col("z") * lit(1000000.0) / col("n_tokens"), 4)
            .as("epochs_at_1m"))
        .orderBy("source")
    }),

    // Dedup clusters: connected components over the MinHash-verified ≥0.8
    // pair set — cluster sizes tell how much the corpus shrinks.
    // Oracle-checked: same exact edge set as dedup_minhash_pairs (see
    // there), components reproduced in DuckDB by a recursive CTE.
    // All four cluster consumers below read Dedup.clusterMV — the
    // once-per-session materialized (id, cluster) relation — instead of
    // re-deriving the LSH + verify + components lineage per query (the
    // round-8 rehearsal flagged the replays at 2.5–2.7×).
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusterMV(docs(s, dir), dir, "doc_id", "text")
        .groupBy("cluster").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("cluster"))
        .limit(100)),

    // Incremental cluster-MV maintenance: the corpus splits into an
    // accepted base (doc_id % 10 != 0, its MV built once per session) and
    // a 10% delta; the delta folds in via Dedup.clusterAppend — delta
    // signatures LSH-screened within the delta and against the base,
    // Δ-sized label-graph contraction, base pairs/components never
    // re-derived (spec-guarded). The ORACLE is the full recompute: the
    // same all-pairs recursive-CTE census dedup_clusters replays over the
    // whole corpus — incremental maintenance must be invisible in the
    // result.
    "dedup_cluster_append" -> ((s, dir) => {
      val d = docs(s, dir)
      val delta = d.filter(col("doc_id") % 10 === 0)
      val base = d.filter(col("doc_id") % 10 =!= 0)
      val baseMv = Dedup.clusterMV(base, dir + "#base", "doc_id", "text")
      // the persisted-signature-table stand-in: base bands + shingle sets
      // materialized once per session, so the append never reads base text
      val screen = Dedup.screenMV(base, dir + "#base", "doc_id", "text")
      Dedup.clusterAppend(baseMv, base, delta, "doc_id", "text",
          baseScreen = Some(screen))
        .groupBy("cluster").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("cluster"))
        .limit(100)
    }),

    // Canonical-doc retention: the dedup ENDGAME — cluster near-dups
    // (same verified ≥0.8 edge set as dedup_clusters), then keep the
    // best copy per cluster (longest text, tie → smallest id) plus all
    // singletons. Oracle-checked against the recursive-CTE components
    // with a window argmax.
    "dedup_keep_best" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.keepBestPerCluster(d, Dedup.clusterMV(d, dir, "doc_id", "text"),
        "doc_id", "n_chars")
        .select("doc_id").orderBy("doc_id")
    }),

    // Dedup yield report: docs and tokens before vs after canonical-copy
    // retention — the number every corpus-reduction decision is based on
    "txt_effective_tokens" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = Dedup.keepBestPerCluster(d,
        Dedup.clusterMV(d, dir, "doc_id", "text"), "doc_id", "n_chars")
      def stats(df: org.apache.spark.sql.DataFrame, stage: String) =
        df.agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"))
          .withColumn("stage", lit(stage))
      stats(d, "raw").unionByName(stats(kept, "deduped"))
        .select("stage", "n_docs", "total_tokens")
        .orderBy("stage")
    }),

    // Per-dimension robust stats of the embedding corpus (median + IQR
    // from the portable k-min-hash sample): the robust-scaler fit for
    // feature normalization, with no engine-opaque percentile sketch
    "sim_dim_stats" -> ((s, dir) => {
      import graft.ops.Sketch
      graft.Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(Sketch.hashSample(
          concat(col("vec_id"), lit(":"), col("dim")), col("x"), 256).as("smp"))
        .select(col("dim"),
          round(Sketch.sampleQuantile(col("smp"), 0.5), 6).as("median"),
          round(Sketch.sampleQuantile(col("smp"), 0.75) -
            Sketch.sampleQuantile(col("smp"), 0.25), 6).as("iqr"))
        .orderBy("dim")
    }),

    // Canonical text form: NFC (custom codegen expr) + lower + control
    // strip + whitespace collapse, fingerprinted per doc — the
    // normalization step before any equality-based dedup
    "txt_canonicalize" -> ((s, dir) =>
      docs(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          md5(TextAnalysis.canonicalize(col("text"))).as("canon_md5"),
          length(TextAnalysis.canonicalize(col("text"))).as("n_canon_chars"))
        .orderBy("doc_id")),

    // BPE merge-candidate mining — one byte-pair-encoding iteration: the
    // most frequent adjacent character pairs, counted over the WORD
    // VOCABULARY weighted by word frequency (the BPE trick: work is
    // vocab-bounded, the corpus is never rescanned per iteration)
    "txt_bpe_pairs" -> ((s, dir) => {
      val words = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq"))
      words.select(col("freq"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
    }),

    // FULL BPE tokenizer training (Sennrich 2016) — txt_bpe_pairs run to
    // a vocabulary: 48 merge iterations over the word-frequency table
    // (vocab-sized state, the only corpus pass is the word count),
    // max-count pair per step with lexicographic tiebreak, merges applied
    // by literal left-to-right replace. The oracle unrolls the identical
    // 48 steps as chained CTEs (the emb_kmeans pattern) and replays the
    // merge table bit-for-bit. Contract: ^[a-z]{2,}$ words.
    "txt_bpe_vocab" -> ((s, dir) => {
      val words = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      graft.ops.TextAnalysis.bpeTrain(words, "w", "freq", merges = 48)
        .orderBy("step")
    }),

    // BPE ENCODE — the apply side of txt_bpe_vocab: the 48 learned
    // merges folded over every document in ONE corpus pass (a chain of
    // literal replaces in a single projection, no shuffle before the
    // per-source rollup), reporting symbol counts before/after — the
    // token-budget compression number. Oracle replays training AND
    // encoding (merge CTEs left-joined so an early-exhausted merge
    // table degrades identically in both engines).
    "txt_bpe_encode" -> ((s, dir) => {
      val words = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val merges = graft.ops.TextAnalysis
        .bpeTrain(words, "w", "freq", merges = 48)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.ops.TextAnalysis.bpeEncodeReport(docs(s, dir), "text", "source", merges)
        .orderBy("source")
    }),

    // BATCH PERCEPTRON language classifier (Rosenblatt 1958) — the
    // trained linear filter of the GPT-3/CCNet curation recipe: learn
    // lang='en' from integer surface features (stopword/alpha/digit
    // per-mille ratios, mean token length, capped length) in 8 batch
    // epochs of EXACT 64-bit arithmetic — integer sums commute across
    // partitions, so the learned weights are partitioning-independent
    // (the property per-sample SGD lacks) and the oracle replays
    // training bit-for-bit. Output: per-source confusion + accuracy.
    "txt_perceptron" -> ((s, dir) => {
      val f = perceptronFeats(docs(s, dir)).localCheckpoint(true)
      val hist = graft.ops.TextAnalysis
        .perceptronTrain(f, "y", PerceptronX, PerceptronEpochs)
      val w = hist.last._2
      val margin = PerceptronX.zipWithIndex
        .map { case (c, i) => col(c) * lit(w(i)) }.reduce(_ + _)
      f.select(col("source"), col("y"), margin.as("m"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_en"),
          sum(when(col("m") > 0L, 1L).otherwise(0L)).as("pred_en"),
          sum(when((col("m") > 0L) === (col("y") === 1L), 1L)
            .otherwise(0L)).as("n_correct"))
        .withColumn("acc_fp", expr("(10000 * n_correct) div n_docs"))
        .orderBy("source")
    }),

    // The weight trajectory of the same training run — each epoch's
    // weight vector is an exact integer, so the full learning curve
    // hash-matches the oracle's unrolled recurrence.
    "txt_perceptron_weights" -> ((s, dir) => {
      import s.implicits._
      graft.ops.TextAnalysis
        .perceptronTrain(perceptronFeats(docs(s, dir)), "y",
          PerceptronX, PerceptronEpochs)
        .map { case (e, ws) => (e, ws(0), ws(1), ws(2), ws(3), ws(4), ws(5)) }
        .toDF("epoch", "w_x0", "w_x1", "w_x2", "w_x3", "w_x4", "w_x5")
        .orderBy("epoch")
    }),

    // TEXTRANK keywords (Mihalcea 2004): integer PageRank over the
    // word co-occurrence graph — the unsupervised keyword extractor
    // next to RAKE's (txt_keyphrases) heuristic one. Same fixed-point
    // recurrence as q_pagerank, replayed exactly by the oracle.
    "txt_textrank" -> ((s, dir) =>
      graft.ops.TextAnalysis.textRank(docs(s, dir), "text", RakeStops,
          iters = 5, minW = 2L)
        .orderBy(col("rank_fp").desc, col("word"))
        .limit(30)),

    // Statistical LM quality scoring (the CCNet-style perplexity filter):
    // every document scored by its average bigram log-probability under
    // the corpus's own add-1-smoothed bigram model. Count tables are
    // vocabulary-bounded aggregates; scoring is an equi-join on the
    // bigram — no model artifact, no UDF, one pass to train + one to
    // score.
    "txt_lm_quality" -> ((s, dir) => {
      val toks = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
      val bigrams = toks.select(col("doc_id"), explode(expr(
        "transform(slice(t, 2, size(t) - 1), (w, i) -> struct(t[i] AS w1, w AS w2))"))
        .as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val bgCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
      // prefix counts derive from the bigram counts (c_w1 = Σ_w2 c_bg) and
      // pre-join them vocab-side, so the CORPUS-sized bigram table joins
      // exactly once — joining it per count table doubles the corpus
      // shuffle as soon as the vocab outgrows the broadcast threshold
      val prefCounts = bgCounts.groupBy("w1").agg(sum("c_bg").as("c_w1"))
      val counts = bgCounts.join(prefCounts, Seq("w1"))
      val vocab = toks.select(explode(col("t")).as("w"))
        .agg(countDistinct("w").as("v"))
      bigrams
        .join(counts, Seq("w1", "w2"))
        .crossJoin(broadcast(vocab))
        .withColumn("logp", log(
          (col("c_bg") + 1L).cast("double") / (col("c_w1") + col("v")).cast("double")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg("logp"), 6).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
    // of the BM25 keyword arm and the vector-similarity arm — the modern
    // two-tower search pattern. Each arm is its own bounded top-k
    // pipeline; fusion is a full-outer join of two 20-row rank lists, so
    // the fuse step costs nothing at any scale.
    "txt_hybrid_rrf" -> ((s, dir) => {
      val textArm = graft.ops.Search.bm25TopK(docs(s, dir), "doc_id", "text",
          Seq("spark", "vector", "merge"), k = 20)
        .withColumn("r_text", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("score"), col("doc_id"))))
        .select(col("doc_id"), col("r_text"))
      val e = graft.Tables.table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val vecArm = graft.ops.Similarity.bruteForceTopK(
          e, q, "vec_id", "embedding", "qid", "qv", k = 20)
        .select(col("id").as("doc_id"), col("rank").as("r_vec"))
      textArm.join(vecArm, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60.0) + col("r_text")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_vec")), lit(0.0)), 6))
        .orderBy(desc("rrf"), col("doc_id")).limit(10)
        .select("doc_id", "r_text", "r_vec", "rrf")
    }),

    // Leakage-safe split: near-dups land in the SAME split (hash the
    // cluster label, not the doc id) — the contamination-proof version
    // of txt_train_split; same verified >=0.8 edge set as dedup_clusters
    "txt_leakage_split" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.leakageSafeSplit(d, Dedup.clusterMV(d, dir, "doc_id", "text"), "doc_id")
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .orderBy("split")
    }),

    // Multimodal manifest: blob accounting per source (real plumbing,
    // bytes == UTF-8 text bytes so the oracle can reproduce it)
    "mm_manifest" -> ((s, dir) =>
      Multimodal.asMediaTable(docs(s, dir)).toDF()
        .groupBy("source")
        .agg(count(lit(1)).as("n_blobs"),
          sum(octet_length(col("content"))).as("total_bytes"))
        .orderBy("source")),

    // Multimodal frame sampling: every-4th 256-byte frame per blob,
    // counted per source (the video-frame-extraction plumbing, verified
    // relationally)
    "mm_frames" -> ((s, dir) => {
      val media = docs(s, dir).select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"))
      Multimodal.sampleFrames(media, frameBytes = 256, everyNth = 4)
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled_frames"))
        .orderBy("source")
    }),

    // Multimodal feature extraction through the per-partition kernel
    // (stubbed codec, real batch plumbing). Oracle-checked: the stub's
    // checksum is plain MD5 over the blob bytes and n_frames is integer
    // arithmetic, both DuckDB-expressible.
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.asMediaTable(docs(s, dir)),
        Multimodal.StubKernels.imageFeature)
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("checksum"), col("n_frames"))
        .orderBy("media_id")),

    // REAL image decode through javax.imageio: deterministic rasters
    // (pure integer functions of doc_id) are PNG-encoded executor-side,
    // then decoded by the JDK codec and reduced to width/height/mean-RGB.
    // Oracle-checked: PNG is lossless, so DuckDB reproduces the decoded
    // features analytically from the same raster formula — the codec
    // round-trip is what the hash match proves.
    "mm_features_real" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).orderBy("doc_id")
        .limit(20).as[Long]
      val media = ids.map(id =>
        Multimodal.MediaRow(id, Multimodal.Synth.png(id), "image/png", "synth"))
      Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("media_id")
    }),

    // Real decode + EXACT box downsample (2x): each output pixel is the
    // integer mean of its source block, so the resized channel sums are
    // pure integer arithmetic the oracle recomputes from the known
    // rasters — a resize KERNEL whose correctness is hash-provable,
    // unlike implementation-defined Graphics2D filter taps.
    "mm_resize_real" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).orderBy("doc_id")
        .limit(20).as[Long]
      val media = ids.map(id =>
        Multimodal.MediaRow(id, Multimodal.Synth.png(id), "image/png", "synth"))
      Multimodal.resizeImages(media, factor = 2).toDF()
        .filter(col("decodable"))
        .select("media_id", "src_w", "src_h", "out_w", "out_h",
          "sum_r", "sum_g", "sum_b")
        .orderBy("media_id")
    }),

    // Shot-boundary detection on REAL decodes — the video-segmentation
    // step of a multimodal curation pipeline: 8 synthetic videos × 20
    // PNG frames (5-frame shots share a raster; odd frames carry the
    // one-pixel pngNear perturbation, so WITHIN-shot deltas are small
    // but nonzero), decoded executor-side by javax.imageio, reduced to
    // mean-RGB, then a per-video lag window flags frames whose max
    // channel delta vs the previous frame exceeds 5.0. The oracle
    // recomputes every mean analytically from the raster formula
    // (lossless PNG — the same contract as mm_features_real), so the
    // hash match proves codec round-trip + the cut metric end to end.
    // Scale: decode is mapPartitions (embarrassingly parallel); the lag
    // window shuffles once by video and is narrow within it.
    "mm_shot_cuts" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val media = s.range(0, 8L * 20).map { i =>
        val (v, f) = (i / 20 + 1, i % 20)
        val base = v * 101L + f / 5
        val bytes = if (f % 2 == 1) Multimodal.Synth.pngNear(base)
                    else Multimodal.Synth.png(base)
        Multimodal.MediaRow(v * 1000 + f, bytes, "image/png", "synth")
      }
      val w = Window.partitionBy("video").orderBy("frame")
      val feats = Multimodal.decodeImages(media).toDF()
        .select(expr("media_id div 1000").as("video"),
          (col("media_id") % 1000).as("frame"),
          col("mean_r"), col("mean_g"), col("mean_b"))
      feats
        .withColumn("delta", greatest(
          abs(col("mean_r") - lag("mean_r", 1).over(w)),
          abs(col("mean_g") - lag("mean_g", 1).over(w)),
          abs(col("mean_b") - lag("mean_b", 1).over(w))))
        .filter(col("frame") >= 1)
        .select(col("video"), col("frame"),
          round(col("delta"), 4).as("delta"),
          (col("delta") > 5.0).as("is_cut"))
        .orderBy("video", "frame")
    }),

    // Image near-dup detection on REAL decodes: perceptual aHash (64-bit,
    // integer-only threshold) through javax.imageio, then banded pairing —
    // 4 × 16-bit bands make Hamming ≤ 3 candidates an EQUI-join by
    // pigeonhole (≥ 1 band untouched), exact bit_count verify after.
    // Every 5th image is a formula-perturbed copy of its predecessor; the
    // oracle recomputes all hashes analytically and scans all pairs, so
    // the hash match proves codec round-trip + banding completeness.
    "mm_image_neardups" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).orderBy("doc_id")
        .limit(20).as[Long]
      val media = ids.map { id =>
        val bytes = if (id % 5 == 4) Multimodal.Synth.pngNear(id - 1)
                    else Multimodal.Synth.png(id)
        Multimodal.MediaRow(id, bytes, "image/png", "synth")
      }
      val hashed = Multimodal.phashImages(media).toDF()
        .filter(col("decodable"))
        .select("media_id", "hi", "lo")
      val banded = hashed.select(col("media_id"), col("hi"), col("lo"),
        explode(array(
          struct(lit(0).as("bi"), col("lo").bitwiseAND(lit(0xFFFFL)).as("bv")),
          struct(lit(1).as("bi"), shiftright(col("lo"), 16).bitwiseAND(lit(0xFFFFL)).as("bv")),
          struct(lit(2).as("bi"), col("hi").bitwiseAND(lit(0xFFFFL)).as("bv")),
          struct(lit(3).as("bi"), shiftright(col("hi"), 16).bitwiseAND(lit(0xFFFFL)).as("bv"))
        )).as("band"))
        .select(col("media_id"), col("hi"), col("lo"),
          col("band.bi").as("bi"), col("band.bv").as("bv"))
      val a = banded.select(col("media_id").as("id_a"), col("hi").as("hi_a"),
        col("lo").as("lo_a"), col("bi"), col("bv"))
      val b = banded.select(col("media_id").as("id_b"), col("hi").as("hi_b"),
        col("lo").as("lo_b"), col("bi"), col("bv"))
      a.join(b, Seq("bi", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
        .withColumn("hamming",
          bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
            bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    }),

    // REAL WAV/PCM decode through javax.sound.sampled: 16-bit mono PCM
    // clips synthesized from a deterministic sample formula, decoded by
    // the JDK audio codec, reduced to rate/channels/length/RMS. PCM is
    // lossless → DuckDB reproduces the features analytically.
    "mm_audio_real" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id")).orderBy("doc_id")
        .limit(20).as[Long]
      val media = ids.map(id =>
        Multimodal.MediaRow(id, Multimodal.Synth.wav(id), "audio/wav", "synth"))
      Multimodal.decodeAudio(media).toDF()
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_samples"), round(col("rms"), 4).as("rms"))
        .orderBy("media_id")
    }),

    // Corpus diversity curve: processing documents in doc_id order, what
    // fraction of each decile's distinct bigrams is NEW (first global
    // occurrence falls in that decile)? The first-occurrence doc rides a
    // window-min over the bigram shuffle the distinct already paid — no
    // second exchange, no self-join. A collapsing curve says later data
    // adds no diversity — the standard "stop crawling this source" signal.
    "txt_ngram_novelty" -> ((s, dir) => {
      val d = docs(s, dir)
      val wB = org.apache.spark.sql.expressions.Window.partitionBy("b")
      val bg = d
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("b"))
        .distinct()
      bg.withColumn("first_doc", min("doc_id").over(wB))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_new"))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("nd"))))
        .withColumn("decile", (col("doc_id") * 10 / col("nd")).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bigrams").as("total_bigrams"),
          sum("n_new").as("new_bigrams"),
          round(sum("n_new") / sum("n_bigrams"), 4).as("novelty"))
        .orderBy("decile")
    }),

    // DSIR-style importance weights: per-document log importance
    // ln(p_target/p_raw) over hashed bigram buckets (256 buckets keyed by
    // the first two hex chars of md5 — portable, so the oracle reproduces
    // the exact bucketing). Target = English docs. The bucket weight table
    // is 256 rows (broadcasts at any corpus size); the corpus pays two
    // map-side-combined aggregations and one broadcast join — nothing
    // quadratic, nothing driver-side.
    "txt_dsir_weights" -> ((s, dir) => {
      val h = docs(s, dir)
        .select(col("doc_id"), col("source"), col("lang"),
          TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("source"), col("lang"), explode(expr(
          "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("b"))
        .withColumn("bucket", substring(md5(col("b")), 1, 2))
      val tgt = h.filter(col("lang") === "en")
        .groupBy("bucket").agg(count(lit(1)).as("tc"))
      val raw = h.groupBy("bucket").agg(count(lit(1)).as("rc"))
      val tot = h.agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"),
        count(lit(1)).as("rt"))
      val w = raw.join(tgt, Seq("bucket"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("lw",
          log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("tt") + lit(256.0))) -
            log((col("rc") + lit(1.0)) / (col("rt") + lit(256.0))))
        .select("bucket", "lw")
      h.join(broadcast(w), "bucket")
        .groupBy("doc_id", "source")
        .agg(avg("lw").as("score"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("score"), 4).as("avg_importance"))
        .orderBy("source")
    }),

    // Gopher-style quality-rule matrix: per-source counts of documents
    // failing each gate (word count, mean word length, top-token
    // repetition) plus the pass-all count. The repetition gate is a
    // one-pass custom expression (token_top_share) — no token explode,
    // no per-token shuffle; the whole report is one scan + one tiny agg.
    "txt_gopher_report" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"), TextAnalysis.tokens(col("text")).as("t"))
        .withColumn("n_words", size(col("t")).cast("long"))
        .withColumn("mwl",
          expr("aggregate(transform(t, x -> length(x)), 0L, (a, x) -> a + x)")
            .cast("double") / col("n_words"))
        .withColumn("top_share",
          graft.functions.GraftFunctions.token_top_share(col("t")))
        .select(col("source"),
          when(col("n_words").between(30, 10000), 0L).otherwise(1L).as("f_len"),
          when(col("mwl").between(2.5, 8.0), 0L).otherwise(1L).as("f_mwl"),
          when(col("top_share") <= 0.15, 0L).otherwise(1L).as("f_rep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("f_len").as("fail_len"),
          sum("f_mwl").as("fail_wordlen"),
          sum("f_rep").as("fail_repetition"),
          sum(when(col("f_len") + col("f_mwl") + col("f_rep") === 0, 1L)
            .otherwise(0L)).as("pass_all"))
        .orderBy("source")),

    // End-to-end curation funnel — the flagship composition: quality gate
    // → near-dup drop (banded MinHash candidates, exact-Jaccard verified,
    // keep-smaller-id) → embedding centroid-outlier drop, with per-stage
    // drop accounting per source. Gates ordered cheap→expensive, the way
    // a production run sequences them so later (costlier) stages see less
    // data. Every stage reuses an independently-oracled operator
    // (txt_quality_filter / dedup_minhash_pairs / emb_centroid_outliers),
    // so this funnel certifies the COMPOSITION, not new math: the oracle
    // recomputes the dup stage from exact all-pairs Jaccard — hash
    // equality here re-proves the LSH banding lost no qualifying pair
    // inside a three-stage lineage.
    "txt_curation_funnel" -> ((s, dir) => {
      val d = docs(s, dir)
      val qual = d.select(col("doc_id"), col("source"),
        when(TextAnalysis.tokenCount(col("text")).between(30, 10000), 1)
          .otherwise(0).as("q_ok"))
      val dupIds = Dedup.jaccardVerify(
          Dedup.minhashCandidatePairs(d, "doc_id", "text", numPerm = 64, bands = 32),
          d, "doc_id", "text")
        .filter(col("jaccard") >= 0.8)
        .select(col("id_b").as("dup_id")).distinct()
      val e = graft.Tables.table(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val dim = 64
      val sums = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1)).as(s"s$i")) :+ count(lit(1)).as("n")
      val cent = e.groupBy("label").agg(sums.head, sums.tail: _*)
        .select(col("label"),
          array((0 until dim).map(i => col(s"s$i") / col("n")): _*).as("c"))
      val dist = e.join(broadcast(cent), "label")
        .withColumn("d", sqrt(expr(
          "aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)")))
        .select("label", "vec_id", "d")
      val embOk = dist
        .join(broadcast(dist.groupBy("label").agg(avg("d").as("avg_d"))), "label")
        .select(col("vec_id"),
          when(col("d") <= lit(1.02) * col("avg_d"), 1).otherwise(0).as("e_ok"))
      qual
        .join(dupIds, col("doc_id") === col("dup_id"), "left")
        .withColumn("d_ok", when(col("dup_id").isNull, 1).otherwise(0))
        .join(embOk, col("doc_id") === col("vec_id"), "left")
        .withColumn("e_ok", coalesce(col("e_ok"), lit(1)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("q_ok") === 0, 1L).otherwise(0L)).as("drop_quality"),
          sum(when(col("q_ok") === 1 && col("d_ok") === 0, 1L).otherwise(0L))
            .as("drop_dup"),
          sum(when(col("q_ok") === 1 && col("d_ok") === 1 && col("e_ok") === 0, 1L)
            .otherwise(0L)).as("drop_outlier"),
          sum((col("q_ok") * col("d_ok") * col("e_ok")).cast("long")).as("kept"))
        .orderBy("source")
    })
  )

  val sql: Map[String, String] = Map(
    "txt_token_stats" ->
      """SELECT lang,
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
        |       round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
        |       count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_subword_stats" ->
      """SELECT lang,
        |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^ \t\n\x0B\f\rA-Za-z0-9]'))) AS BIGINT)
        |         AS total_subwords,
        |       round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^ \t\n\x0B\f\rA-Za-z0-9]'))), 4)
        |         AS avg_subwords,
        |       round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^ \t\n\x0B\f\rA-Za-z0-9]')) * 1.0
        |                 / len(string_split_regex(trim(text), '\s+'))), 4) AS fertility
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_quality" ->
      """SELECT lang,
        |       round(avg(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / length(text)), 4)
        |         AS avg_alpha_ratio,
        |       CAST(sum(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b'))) AS BIGINT)
        |         AS total_stop_hits,
        |       round(avg(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
        |                 / len(string_split_regex(trim(text), '\s+'))), 4) AS avg_word_len
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_langid" ->
      """WITH scored AS (
        |  SELECT len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS s_en,
        |         len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS s_de,
        |         len(regexp_extract_all(lower(text), '\b(le|les|et|est|une|dans|pour)\b')) AS s_fr,
        |         len(regexp_extract_all(lower(text), '\b(el|los|y|es|una|con|para)\b')) AS s_es,
        |         len(string_split_regex(trim(text), '\s+')) AS toks
        |  FROM documents)
        |SELECT CASE WHEN greatest(s_en, s_de, s_fr, s_es) * 1.0 / toks < 0.08 THEN 'other'
        |            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |            ELSE 'es' END AS lang_guess, count(*) AS n
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_quality_filter" ->
      """SELECT lang, count(*) AS n_kept,
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS kept_tokens
        |FROM documents
        |WHERE len(string_split_regex(trim(text), '\s+')) >= 30
        |  AND length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / length(text) >= 0.6
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_top_terms" ->
      """SELECT lang, token, n, rnk FROM (
        |  SELECT lang, token, count(*) AS n,
        |         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS rnk
        |  FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        |        FROM documents) t
        |  GROUP BY lang, token) x
        |WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    // RAKE oracle: same stopword→'|' separator segmentation, same 1e-9
    // integer word scores, row_number top-15 per source.
    "txt_keyphrases" ->
      s"""WITH ph AS (
         |  SELECT source, unnest(list_filter(
         |    string_split_regex(array_to_string(
         |      list_transform(string_split_regex(trim(text), '\\s+'),
         |        t -> CASE WHEN t IN ($rakeStopsSql) THEN '|' ELSE t END), ' '),
         |      '\\s*\\|\\s*'), x -> x <> '')) AS p
         |  FROM documents),
         |cand AS (SELECT source, p, string_split(p, ' ') AS ws FROM ph
         |         WHERE len(string_split(p, ' ')) <= 5),
         |words AS (SELECT source, len(ws) AS plen, unnest(ws) AS t FROM cand),
         |wfp AS (SELECT source, t,
         |               (CAST(sum(plen) AS BIGINT) * 1000000000) // count(*) AS wfp
         |        FROM words GROUP BY 1, 2),
         |dp AS (SELECT DISTINCT source, p FROM cand),
         |sc AS (SELECT d.source, d.p, CAST(sum(w.wfp) AS BIGINT) AS score_fp
         |       FROM (SELECT source, p, unnest(string_split(p, ' ')) AS t FROM dp) d
         |       JOIN wfp w ON w.source = d.source AND w.t = d.t
         |       GROUP BY 1, 2)
         |SELECT source, CAST(rnk AS BIGINT) AS rnk, p AS phrase, score_fp FROM (
         |  SELECT source, p, score_fp,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY score_fp DESC, p) AS rnk
         |  FROM sc) z
         |WHERE rnk <= 15 ORDER BY source, rnk""".stripMargin,
    "txt_zipf_fit" ->
      """WITH tok AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
        |             FROM documents),
        |f AS (SELECT source, t, count(*) AS f FROM tok WHERE t <> ''
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |rk AS (SELECT source, f,
        |              row_number() OVER (PARTITION BY source ORDER BY f DESC, t) AS r
        |       FROM f),
        |xy AS (SELECT source, ln(r) AS x, ln(f) AS y FROM rk WHERE r <= 500),
        |s AS (SELECT source, count(*) AS n_ranks, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*y) AS sxy, sum(x*x) AS sxx
        |      FROM xy GROUP BY 1)
        |SELECT source, n_ranks,
        |       round((n_ranks*sxy - sx*sy)/(n_ranks*sxx - sx*sx), 4) AS zipf_slope,
        |       round((sy - (n_ranks*sxy - sx*sy)/(n_ranks*sxx - sx*sx)*sx)/n_ranks, 4)
        |         AS ln_c
        |FROM s WHERE n_ranks >= 2 ORDER BY source""".stripMargin,
    "txt_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |    ORDER BY doc_id) AS rn
        |  FROM documents) t WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "txt_entropy" ->
      """WITH f AS (
        |  SELECT doc_id, lang, c, count(*) AS k FROM (
        |    SELECT doc_id, lang, unnest(string_split_regex(text, '')) AS c
        |    FROM documents WHERE length(text) > 0)
        |  GROUP BY 1, 2, 3)
        |SELECT lang, round(avg(ent), 4) AS avg_entropy FROM (
        |  SELECT doc_id, lang, -sum(p * log2(p)) AS ent FROM (
        |    SELECT doc_id, lang, k * 1.0 / (sum(k) OVER (PARTITION BY doc_id)) AS p FROM f) t
        |  GROUP BY 1, 2)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_repetition" ->
      """WITH toks AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> concat(t[i], ' ', t[i+1]))) AS b
        |  FROM toks WHERE len(t) >= 2),
        |f AS (SELECT doc_id, lang, b, count(*) AS k FROM bg GROUP BY 1, 2, 3),
        |s AS (SELECT doc_id, lang, max(k) * 1.0 / sum(k) AS share FROM f GROUP BY 1, 2)
        |SELECT lang, round(avg(share), 4) AS avg_top_bigram_share
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_redact" ->
      """WITH aug AS (
        |  SELECT lang,
        |         CASE WHEN doc_id % 5 = 0
        |              THEN concat(text, ' contact user', doc_id, '@example.com via http://ex.com/d', doc_id)
        |              ELSE text END AS a
        |  FROM documents),
        |feat AS (
        |  SELECT lang,
        |         len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |         len(regexp_extract_all(a, 'https?://[^\s]+')) AS n_urls,
        |         length(a) - length(regexp_replace(regexp_replace(a, 'https?://[^\s]+', '<URL>', 'g'),
        |                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')) AS len_delta
        |  FROM aug)
        |SELECT lang,
        |       CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
        |       CAST(sum(n_urls) AS BIGINT) AS urls_redacted,
        |       CAST(sum(len_delta) AS BIGINT) AS bytes_removed,
        |       CAST(sum(CASE WHEN n_emails + n_urls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_touched
        |FROM feat GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_train_split" ->
      """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
        |FROM (SELECT text, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS INTEGER) % 100 AS b
        |      FROM documents) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_vocab_coverage" ->
      """WITH d AS (SELECT source, text,
        |                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100 AS b
        |           FROM documents),
        |vocab AS (SELECT token FROM (
        |            SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |            FROM d WHERE b < 80) t
        |          GROUP BY token ORDER BY count(*) DESC, token LIMIT 500),
        |ev AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        |       FROM d WHERE b >= 80)
        |SELECT source, count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       round(CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS oov_rate
        |FROM ev LEFT JOIN vocab ON ev.token = vocab.token
        |GROUP BY source ORDER BY source""".stripMargin,
    "txt_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT lang, n_chars,
        |             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER AS b,
        |             CASE lang WHEN 'en' THEN 0.3 WHEN 'zh' THEN 0.6 ELSE 1.0 END AS r
        |      FROM documents) t
        |WHERE b < r * 65536
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_bm25_topk" ->
      """WITH base AS (
        |  SELECT doc_id, lower(text) AS txt,
        |         len(string_split_regex(trim(lower(text)), '\s+')) AS dl
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |p AS (SELECT doc_id, dl,
        |             unnest(string_split_regex(trim(txt), '\s+')) AS term
        |      FROM base),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
        |       WHERE term IN ('spark', 'vector', 'merge') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        |sc AS (SELECT tf.doc_id,
        |              ln(((n_docs - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
        |                * tf::DOUBLE * 2.2::DOUBLE
        |                / (tf::DOUBLE + 1.2::DOUBLE *
        |                   (0.25::DOUBLE + 0.75::DOUBLE * dl::DOUBLE / avgdl)) AS s
        |       FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats),
        |agg AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY 1),
        |top AS (SELECT doc_id, score FROM agg
        |        ORDER BY score DESC, doc_id ASC LIMIT 20)
        |SELECT doc_id, round(score, 4) AS score FROM top ORDER BY doc_id""".stripMargin,
    // Incremental-BM25 oracle: FULL recompute over the whole corpus —
    // the MV merge must reproduce it exactly; avgdl as sum/count to
    // mirror the engine's integer-sum stats merge.
    "txt_bm25_append" -> bm25FullRecomputeSql,
    // Bucketed-index oracle: identical full recompute — the persisted
    // bucketed MV (base write + delta append) must reproduce it exactly.
    "txt_bm25_bucketed" -> bm25FullRecomputeSql,
    "txt_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |         ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT::DOUBLE + 0.5)
        |            / 4294967296.0) / n_chars::DOUBLE AS k
        |  FROM documents WHERE n_chars > 0 AND doc_id IS NOT NULL),
        |win AS (SELECT doc_id FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 40)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d JOIN win USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "txt_pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT CAST(floor((cum - n_tokens) / 4096.0) AS BIGINT) AS bin,
        |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, source, n_chars, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, source, n_chars, s, len(s) AS n FROM sh)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |  FROM sized a JOIN sized b
        |    ON a.source = b.source AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 32
        |) WHERE j >= 0.2 ORDER BY round(j, 4) DESC, id_a, id_b LIMIT 100""".stripMargin,
    // Containment oracle: identical shingle universe (word trigrams,
    // df ≤ 128 cap), exact integer counts, one double division at the end.
    "dedup_containment" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM documents WHERE text IS NOT NULL)),
        |g AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |rare AS (SELECT g FROM g GROUP BY g HAVING count(*) <= 128),
        |kg AS (SELECT g.doc_id, g.g FROM g JOIN rare USING (g)),
        |sz AS (SELECT doc_id, count(*) AS n FROM kg GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |          FROM kg a JOIN kg b ON a.g = b.g AND a.doc_id != b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, common, round(c, 4) AS containment FROM (
        |  SELECT i.id_a, i.id_b, i.common, CAST(i.common AS DOUBLE) / sz.n AS c
        |  FROM inter i JOIN sz ON sz.doc_id = i.id_a)
        |WHERE c >= 0.5
        |ORDER BY round(c, 4) DESC, id_a, id_b LIMIT 100""".stripMargin,
    // shingle-tf cosine oracle: identical trigram MULTISET (duplicates
    // kept — the frequency signal) and df ≤ 128 cap, exact integer dot
    // products and squared norms, the engine's DECIMAL(38,0) fixed point
    // replayed in HUGEINT (floor division, positive operands).
    "dedup_cosine_tf" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' '))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM documents WHERE text IS NOT NULL)),
        |tf AS (
        |  SELECT doc_id, t, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(s) AS t FROM sh)
        |  GROUP BY 1, 2),
        |rare AS (SELECT t FROM tf GROUP BY t HAVING count(*) <= 128),
        |kt AS (SELECT tf.doc_id, tf.t, tf.tf FROM tf JOIN rare USING (t)),
        |nsq AS (SELECT doc_id, sum(tf * tf) AS nsq FROM kt GROUP BY 1),
        |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |                CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |         FROM kt a JOIN kt b ON a.t = b.t AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT id_a, id_b, dot, cos2_fp FROM (
        |  SELECT d.id_a, d.id_b, d.dot,
        |         CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000000000)
        |              // (CAST(na.nsq AS HUGEINT) * nb.nsq) AS BIGINT) AS cos2_fp
        |  FROM dots d JOIN nsq na ON na.doc_id = d.id_a
        |              JOIN nsq nb ON nb.doc_id = d.id_b)
        |WHERE cos2_fp >= 640000000000
        |ORDER BY cos2_fp DESC, id_a, id_b LIMIT 100""".stripMargin,
    // median/MAD oracle: interpolated medians doubled into exact integers
    // (2·median of BIGINT is integral), the 3-MAD test as 2·dev2 > 3·mad_4x
    // — the engine's identical integer comparison.
    "txt_doc_outliers" ->
      """WITH d AS (SELECT source, n_chars FROM documents),
        |m AS (SELECT source, count(*) AS n_docs,
        |             CAST(2 * median(n_chars) AS BIGINT) AS med2x
        |      FROM d GROUP BY 1),
        |dev AS (SELECT d.source, abs(2 * d.n_chars - m.med2x) AS dev2
        |        FROM d JOIN m USING (source)),
        |md AS (SELECT source, CAST(2 * median(dev2) AS BIGINT) AS mad4x
        |       FROM dev GROUP BY 1),
        |o AS (SELECT dev.source,
        |             CAST(sum(CASE WHEN 2 * dev.dev2 > 3 * md.mad4x
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |      FROM dev JOIN md USING (source) GROUP BY 1)
        |SELECT m.source, m.n_docs,
        |       m.med2x / 2.0 AS med_chars,
        |       md.mad4x / 4.0 AS mad_chars,
        |       o.n_outliers
        |FROM m JOIN md USING (source) JOIN o USING (source)
        |ORDER BY source""".stripMargin,
    // SimHash oracle: recompute the md5-portable signatures in SQL — per
    // token the first 16 md5 hex chars as a UBIGINT (== the engine's first
    // 8 digest bytes big-endian), sign-sum all 64 bits, band into 4×16-bit
    // buckets, pair within buckets, Hamming via bit_count(xor) ≤ 16.
    // Validated bit-for-bit against an independent Python reference.
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |th AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM toks),
        |bits AS (
        |  SELECT doc_id, bb.b AS b,
        |         sum(CASE WHEN ((h >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS c
        |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
        |  GROUP BY 1, 2),
        |sigs AS (
        |  SELECT doc_id,
        |         bit_or(CASE WHEN c > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS sim
        |  FROM bits GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, sim, band.band AS band,
        |         (sim >> (band.band * 16)) & 65535 AS bucket
        |  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) band),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         bit_count(xor(a.sim, b.sim)) AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
        |FROM pairs WHERE hamming <= 16
        |ORDER BY hamming, id_a, id_b LIMIT 100""".stripMargin,
    "dedup_minhash_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |  FROM sized a JOIN sized b
        |    ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |) WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin,
    "txt_dup_spans" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS ts
        |              FROM documents WHERE text IS NOT NULL),
        |kg AS (SELECT doc_id, i AS pos0, array_to_string(ts[i+1:i+8], ' ') AS kgram
        |       FROM toks, LATERAL unnest(range(0, len(ts) - 8 + 1)) AS t(i)
        |       WHERE len(ts) >= 8),
        |dup AS (SELECT kgram FROM kg GROUP BY 1 HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT k.doc_id, p
        |        FROM kg k JOIN dup USING (kgram),
        |             LATERAL unnest(range(k.pos0 + 1, k.pos0 + 9)) AS u(p)),
        |per AS (SELECT t.doc_id, t.source, len(t.ts) AS n_tokens,
        |               coalesce(c.n_dup, 0) AS n_dup
        |        FROM toks t LEFT JOIN (SELECT doc_id, count(*) AS n_dup
        |                               FROM cov GROUP BY 1) c USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_dup) AS BIGINT) AS dup_tokens,
        |       round(sum(n_dup) * 1.0 / sum(n_tokens), 4) AS dup_token_frac,
        |       CAST(sum(CASE WHEN n_dup * 1.0 / n_tokens >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_mostly_dup
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_cdc_chunks" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS ts
        |              FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos, ts[i + 1] AS w,
        |             CASE WHEN i >= 2 AND substr(md5(array_to_string(ts[i - 1:i + 1], ' ')), 1, 1)
        |                    IN ('0', '1') THEN 1 ELSE 0 END AS b
        |      FROM toks, LATERAL unnest(range(0, len(ts))) AS t(i)),
        |sg AS (SELECT doc_id, source, pos, w,
        |              coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
        |       FROM w),
        |ch AS (SELECT doc_id, source, seg, count(*) AS n_words,
        |              md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_hash
        |       FROM sg GROUP BY 1, 2, 3),
        |rk AS (SELECT source, n_words,
        |              row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, seg) AS dup_rank
        |       FROM ch)
        |SELECT source, count(*) AS n_chunks,
        |       CAST(sum(CASE WHEN dup_rank > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_redundant,
        |       round(sum(CASE WHEN dup_rank > 1 THEN n_words ELSE 0 END) * 1.0
        |         / sum(n_words), 4) AS redundant_token_share,
        |       round(avg(n_words), 4) AS avg_chunk_words
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_chunk_windows" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS ts
        |              FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, source, len(ts) AS n FROM toks),
        |st AS (SELECT doc_id, source, n,
        |              unnest(range(0,
        |                CASE WHEN n <= 64 THEN 1
        |                     ELSE ((n - 64 + 47) // 48) * 48 + 1 END, 48)) AS s
        |       FROM d),
        |c AS (SELECT doc_id, source, least(64, n - s) AS ctoks FROM st)
        |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
        |       CAST(sum(ctoks) AS BIGINT) AS chunk_tokens,
        |       round(avg(ctoks), 4) AS avg_chunk_tokens
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_span_yield" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS ts
        |              FROM documents WHERE text IS NOT NULL),
        |kg AS (SELECT doc_id, i AS pos0, array_to_string(ts[i+1:i+8], ' ') AS kgram
        |       FROM toks, LATERAL unnest(range(0, len(ts) - 8 + 1)) AS t(i)
        |       WHERE len(ts) >= 8),
        |dup AS (SELECT kgram, min(doc_id * 1000000 + pos0) AS firstkey,
        |               count(*) AS cnt
        |        FROM kg GROUP BY 1),
        |cov AS (SELECT DISTINCT k.doc_id, p
        |        FROM kg k JOIN dup d USING (kgram),
        |             LATERAL unnest(range(k.pos0 + 1, k.pos0 + 9)) AS u(p)
        |        WHERE d.cnt >= 2 AND k.doc_id * 1000000 + k.pos0 <> d.firstkey),
        |per AS (SELECT t.doc_id, t.source, len(t.ts) AS nb, coalesce(c.n, 0) AS nrem
        |        FROM toks t LEFT JOIN (SELECT doc_id, count(*) AS n
        |                               FROM cov GROUP BY 1) c USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(nb) AS BIGINT) AS tokens_before,
        |       CAST(sum(nb - nrem) AS BIGINT) AS tokens_after,
        |       round(sum(nb - nrem) * 1.0 / sum(nb), 4) AS keep_frac
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_winnow_pairs" ->
      """WITH f AS (
        |  SELECT doc_id, fp FROM (
        |    SELECT doc_id,
        |           unnest(list_distinct(list_transform(generate_series(1, greatest(len(g)-7, 1)),
        |             i -> list_min(g[i:i+7])))) AS fp
        |    FROM (SELECT doc_id,
        |                 list_transform(generate_series(1, length(text)-7),
        |                   i -> (('0x' || substr(md5(text[i:i+7]), 1, 8))::BIGINT)) AS g
        |          FROM documents WHERE text IS NOT NULL AND length(text) >= 8) t)),
        |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM f GROUP BY 1) WHERE df <= 20),
        |ff AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp)),
        |sizes AS (SELECT doc_id, count(*) AS nfp FROM ff GROUP BY 1),
        |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |           FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT s.id_a, s.id_b, s.n_shared,
        |       round(s.n_shared / least(na.nfp, nb.nfp), 4) AS containment
        |FROM shared s JOIN sizes na ON na.doc_id = s.id_a
        |              JOIN sizes nb ON nb.doc_id = s.id_b
        |ORDER BY s.n_shared DESC, s.id_a, s.id_b LIMIT 100""".stripMargin,
    "dedup_prefix_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |  FROM sized a JOIN sized b
        |    ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |) WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |    FROM sized a JOIN sized b
        |      ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |  ) WHERE j >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |)
        |SELECT cluster, count(*) AS size FROM (
        |  SELECT id, min(r) AS cluster FROM reach GROUP BY id
        |) GROUP BY cluster ORDER BY size DESC, cluster LIMIT 100""".stripMargin,
    // full-recompute oracle: incremental MV maintenance must reproduce
    // the whole-corpus cluster census exactly
    "dedup_cluster_append" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |    FROM sized a JOIN sized b
        |      ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |  ) WHERE j >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |)
        |SELECT cluster, count(*) AS size FROM (
        |  SELECT id, min(r) AS cluster FROM reach GROUP BY id
        |) GROUP BY cluster ORDER BY size DESC, cluster LIMIT 100""".stripMargin,
    "txt_effective_tokens" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |    FROM sized a JOIN sized b
        |      ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |  ) WHERE j >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |labeled AS (
        |  SELECT d.doc_id, d.n_chars, coalesce(l.cluster, d.doc_id) AS cl
        |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.id),
        |best AS (
        |  SELECT doc_id, row_number() OVER (PARTITION BY cl ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM labeled),
        |kept AS (SELECT doc_id FROM best WHERE rn = 1)
        |SELECT 'deduped' AS stage, count(*) AS n_docs,
        |       CAST(sum(len(string_split_regex(trim(d.text), '\s+'))) AS BIGINT) AS total_tokens
        |FROM kept k JOIN documents d ON k.doc_id = d.doc_id
        |UNION ALL
        |SELECT 'raw', count(*),
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |FROM documents
        |ORDER BY stage""".stripMargin,
    "sim_dim_stats" ->
      """WITH p AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
        |                  CAST(embedding[i] AS DOUBLE) AS x
        |           FROM embeddings,
        |                (SELECT unnest(generate_series(1, 64)) AS i) s
        |           WHERE i <= len(embedding)),
        |h AS (SELECT dim, x,
        |             md5(vec_id::VARCHAR || ':' || dim::VARCHAR) AS hx FROM p),
        |r AS (SELECT dim, x,
        |             row_number() OVER (PARTITION BY dim ORDER BY hx) AS rn FROM h),
        |smp AS (SELECT dim, list_sort(list(x)) AS s
        |        FROM r WHERE rn <= 256 GROUP BY 1)
        |SELECT dim,
        |       round(s[GREATEST(1, CAST(ceil(0.5 * len(s)) AS INT))], 6) AS median,
        |       round(s[GREATEST(1, CAST(ceil(0.75 * len(s)) AS INT))]
        |             - s[GREATEST(1, CAST(ceil(0.25 * len(s)) AS INT))], 6) AS iqr
        |FROM smp ORDER BY dim""".stripMargin,
    "txt_canonicalize" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(
        |         regexp_replace(lower(nfc_normalize(text)),
        |                        '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
        |         '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS canon_md5,
        |       CAST(len(trim(regexp_replace(
        |         regexp_replace(lower(nfc_normalize(text)),
        |                        '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
        |         '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS INT) AS n_canon_chars
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "txt_bpe_pairs" ->
      """WITH wd AS (SELECT w, count(*) AS freq FROM (
        |              SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |              FROM documents WHERE text IS NOT NULL) t
        |            WHERE len(w) >= 2 GROUP BY 1),
        |p AS (SELECT freq,
        |             unnest(list_transform(generate_series(1, len(w) - 1),
        |                    i -> substr(w, i, 2))) AS pair
        |      FROM wd)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM p
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,
    "txt_bpe_vocab" -> bpeVocabSql(merges = 48),
    "txt_bpe_encode" -> bpeEncodeSql(merges = 48),
    "txt_perceptron" -> perceptronReportSql(PerceptronEpochs),
    "txt_perceptron_weights" -> perceptronWeightsSql(PerceptronEpochs),
    "txt_textrank" -> textrankSql(iters = 5),
    "txt_lm_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(t[2:], (w, i) ->
        |           struct_pack(w1 := t[i], w2 := w))) AS p
        |  FROM toks),
        |bigrams AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
        |bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bigrams GROUP BY 1, 2),
        |pref AS (SELECT w1, count(*) AS c_w1 FROM bigrams GROUP BY 1),
        |voc AS (SELECT count(DISTINCT w) AS v
        |        FROM (SELECT unnest(t) AS w FROM toks)),
        |sc AS (SELECT b.doc_id,
        |              ln((c_bg + 1)::DOUBLE / (c_w1 + v)::DOUBLE) AS logp
        |       FROM bigrams b
        |       JOIN bgc ON b.w1 = bgc.w1 AND b.w2 = bgc.w2
        |       JOIN pref ON b.w1 = pref.w1
        |       CROSS JOIN voc)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 6) AS avg_logp
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_hybrid_rrf" ->
      """WITH base AS (
        |  SELECT doc_id, lower(text) AS txt,
        |         len(string_split_regex(trim(lower(text)), '\s+')) AS dl
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |p AS (SELECT doc_id, dl,
        |             unnest(string_split_regex(trim(txt), '\s+')) AS term
        |      FROM base),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
        |       WHERE term IN ('spark', 'vector', 'merge') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
        |sc AS (SELECT tf.doc_id,
        |              ln(((n_docs - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
        |                * tf::DOUBLE * 2.2::DOUBLE
        |                / (tf::DOUBLE + 1.2::DOUBLE *
        |                   (0.25::DOUBLE + 0.75::DOUBLE * dl::DOUBLE / avgdl)) AS s
        |       FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats),
        |agg AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY 1),
        |toptext AS (SELECT doc_id, round(score, 4) AS score FROM agg
        |            ORDER BY score DESC, doc_id ASC LIMIT 20),
        |tr AS (SELECT doc_id,
        |              row_number() OVER (ORDER BY score DESC, doc_id) AS r_text
        |       FROM toptext),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |vs AS (SELECT vec_id,
        |              list_dot_product(qv, v) /
        |                (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
        |       FROM e, q WHERE vec_id <> 0),
        |vr AS (SELECT vec_id AS doc_id, rank AS r_vec FROM (
        |         SELECT vec_id,
        |                row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
        |         FROM vs) t WHERE rank <= 20),
        |f AS (SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id,
        |             CAST(tr.r_text AS INT) AS r_text,
        |             CAST(vr.r_vec AS INT) AS r_vec,
        |             round(coalesce(1.0::DOUBLE / (60.0::DOUBLE + tr.r_text), 0.0) +
        |                   coalesce(1.0::DOUBLE / (60.0::DOUBLE + vr.r_vec), 0.0), 6) AS rrf
        |      FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id)
        |SELECT doc_id, r_text, r_vec, rrf FROM f
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "txt_leakage_split" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |    FROM sized a JOIN sized b
        |      ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |  ) WHERE j >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |g AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS gk
        |      FROM documents d LEFT JOIN lab l ON d.doc_id = l.id),
        |b AS (SELECT ('0x' || substr(md5(gk::VARCHAR), 1, 4))::INTEGER % 100 AS bk FROM g)
        |SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n_docs
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_keep_best" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / (a.n + b.n - len(list_intersect(a.s, b.s))) AS j
        |    FROM sized a JOIN sized b
        |      ON a.doc_id < b.doc_id AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |  ) WHERE j >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |labeled AS (
        |  SELECT d.doc_id, d.n_chars, coalesce(l.cluster, d.doc_id) AS cl
        |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.id),
        |best AS (
        |  SELECT doc_id, row_number() OVER (PARTITION BY cl ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM labeled)
        |SELECT doc_id FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS checksum,
        |       CAST(octet_length(encode(text)) // 1024 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """SELECT source,
        |       CAST(sum(ceil(ceil(octet_length(encode(text)) / 256.0) / 4.0)) AS BIGINT)
        |         AS n_sampled_frames
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "mm_manifest" ->
      """SELECT source, count(*) AS n_blobs,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Exact cross-corpus ≥0.8 pair set via all-pairs scan (the banded-LSH
    // candidate generator's miss probability at j=0.8 is (1−0.8²)³² ≈
    // 4e-15 — same lossless-recall argument as dedup_minhash_pairs)
    "dedup_against_snapshot" ->
      """WITH sh AS (
        |  SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |              i -> array_to_string(t[i:i+2], ' ')))
        |       END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT i.doc_id AS doc_id,
        |         CAST(len(list_intersect(i.s, r.s)) AS DOUBLE)
        |           / (i.n + r.n - len(list_intersect(i.s, r.s))) AS j
        |  FROM sized i JOIN sized r ON i.doc_id % 7 <> 0 AND r.doc_id % 7 = 0)
        |SELECT doc_id, count(*) AS n_ref_matches, round(max(j), 4) AS max_jaccard
        |FROM pairs WHERE j >= 0.8 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "txt_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |              i -> array_to_string(t[i:i+2], ' ')))
        |       END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |), bench AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE doc_id % 13 = 0),
        |corp AS (SELECT doc_id, unnest(s) AS h FROM sh WHERE doc_id % 13 <> 0),
        |agg AS (
        |  SELECT c.doc_id, count(*) AS n_shingles,
        |         sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS hits
        |  FROM corp c LEFT JOIN bench b ON c.h = b.h GROUP BY 1)
        |SELECT doc_id, n_shingles, CAST(hits AS BIGINT) AS n_hits,
        |       round(hits / n_shingles, 6) AS overlap
        |FROM agg WHERE round(hits / n_shingles, 6) >= 0.5 ORDER BY doc_id""".stripMargin,
    "txt_token_budget" ->
      """WITH d AS (SELECT doc_id, lang,
        |                  len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |           FROM documents),
        |c AS (SELECT lang, n_tokens,
        |             sum(n_tokens) OVER (PARTITION BY lang
        |               ORDER BY md5(doc_id::VARCHAR), doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |             CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 1500 ELSE 2000 END AS b
        |      FROM d)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
        |FROM c WHERE cum - n_tokens < b GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_source_divergence" ->
      """WITH toks AS (SELECT source,
        |                     unnest(string_split_regex(trim(text), '\s+')) AS token
        |              FROM documents),
        |sc AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sc GROUP BY 1),
        |gc AS (SELECT token, count(*) AS g FROM toks GROUP BY 1),
        |gt AS (SELECT CAST(sum(g) AS BIGINT) AS n_tot FROM gc),
        |terms AS (SELECT sc.source, st.n_s,
        |                 sc.c * 1.0 / st.n_s AS p, gc.g * 1.0 / gt.n_tot AS q,
        |                 (sc.c * 1.0 / st.n_s + gc.g * 1.0 / gt.n_tot) / 2 AS m
        |          FROM sc JOIN gc ON sc.token = gc.token
        |          JOIN st ON sc.source = st.source
        |          CROSS JOIN gt)
        |SELECT source, max(n_s) AS n_tokens,
        |       round(sum(0.5 * p * ln(p / m) + 0.5 * q * ln(q / m))
        |             + 0.5 * ln(2.0) * (1.0 - sum(q)), 6) AS jsd
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_mixture_weights" ->
      """WITH s AS (SELECT source,
        |                  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |                    AS n_tokens
        |           FROM documents GROUP BY 1),
        |z AS (SELECT sum(sqrt(n_tokens)) AS z FROM s)
        |SELECT source, n_tokens,
        |       round(sqrt(n_tokens) / z, 6) AS weight,
        |       round(sqrt(n_tokens) / z * 1000000.0 / n_tokens, 4) AS epochs_at_1m
        |FROM s, z ORDER BY source""".stripMargin,
    "txt_heavy_bigrams" ->
      """WITH toks AS (SELECT lang, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |bg AS (SELECT lang, unnest(list_transform(generate_series(1, len(t)-1),
        |                             i -> t[i] || ' ' || t[i+1])) AS bigram
        |       FROM toks WHERE len(t) >= 2),
        |tot AS (SELECT lang, count(*) AS total FROM bg GROUP BY lang),
        |c AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram)
        |SELECT c.lang, c.bigram, c.cnt, round(c.cnt / tot.total, 6) AS freq
        |FROM c JOIN tot USING (lang)
        |WHERE c.cnt >= tot.total * 0.0023
        |ORDER BY lang, bigram""".stripMargin,
    // Analytic replica of the javax.imageio decode: same raster formula as
    // Multimodal.Synth (PNG lossless ⇒ decoded pixels == generated pixels)
    // Shot-cut oracle: every frame mean recomputed analytically from the
    // raster formula (incl. the odd-frame (7,7) red nudge with its mod-256
    // wrap), then the identical per-video lag/greatest/threshold metric.
    "mm_shot_cuts" ->
      """WITH vf AS (
        |  SELECT v.v AS video, f.f AS frame,
        |         (v.v * 101 + f.f // 5) AS rid, (f.f % 2 = 1) AS nudged
        |  FROM (SELECT unnest(generate_series(1, 8)) AS v) v,
        |       (SELECT unnest(generate_series(0, 19)) AS f) f),
        |dims AS (SELECT video, frame, rid, nudged,
        |                CAST(8 + rid % 9 AS INTEGER) AS w,
        |                CAST(8 + rid % 5 AS INTEGER) AS h FROM vf),
        |px AS (
        |  SELECT video, frame, rid, nudged, w, h, xs.x AS x, ys.y AS y
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS x) xs
        |  CROSS JOIN (SELECT unnest(generate_series(0, 12)) AS y) ys
        |  WHERE xs.x < w AND ys.y < h),
        |m AS (
        |  SELECT video, frame,
        |         (sum((rid*31 + x*7 + y*13) % 256)
        |          + CASE WHEN any_value(nudged)
        |                 THEN ((any_value(rid)*31 + 140) % 256 + 8) % 256
        |                      - (any_value(rid)*31 + 140) % 256
        |                 ELSE 0 END)::DOUBLE / (w * h) AS mean_r,
        |         sum((rid*17 + x*11 + y*3) % 256)::DOUBLE / (w * h) AS mean_g,
        |         sum((rid*23 + x*5 + y*19) % 256)::DOUBLE / (w * h) AS mean_b
        |  FROM px GROUP BY video, frame, w, h),
        |d AS (
        |  SELECT video, frame,
        |         greatest(
        |           abs(mean_r - lag(mean_r) OVER wv),
        |           abs(mean_g - lag(mean_g) OVER wv),
        |           abs(mean_b - lag(mean_b) OVER wv)) AS delta
        |  FROM m WINDOW wv AS (PARTITION BY video ORDER BY frame))
        |SELECT video, frame, round(delta, 4) AS delta, delta > 5.0 AS is_cut
        |FROM d WHERE frame >= 1 ORDER BY video, frame""".stripMargin,
    "mm_features_real" ->
      """WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
        |dims AS (SELECT doc_id,
        |                CAST(8 + doc_id % 9 AS INTEGER) AS w,
        |                CAST(8 + doc_id % 5 AS INTEGER) AS h FROM d),
        |px AS (
        |  SELECT doc_id, w, h, xs.x AS x, ys.y AS y
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS x) xs
        |  CROSS JOIN (SELECT unnest(generate_series(0, 12)) AS y) ys
        |  WHERE xs.x < w AND ys.y < h)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |       round(sum((doc_id*31 + x*7 + y*13) % 256)::DOUBLE / (w*h), 4) AS mean_r,
        |       round(sum((doc_id*17 + x*11 + y*3) % 256)::DOUBLE / (w*h), 4) AS mean_g,
        |       round(sum((doc_id*23 + x*5 + y*19) % 256)::DOUBLE / (w*h), 4) AS mean_b
        |FROM px GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "mm_resize_real" ->
      """WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
        |dims AS (SELECT doc_id,
        |                CAST(8 + doc_id % 9 AS INTEGER) AS w,
        |                CAST(8 + doc_id % 5 AS INTEGER) AS h FROM d),
        |px AS (
        |  SELECT doc_id, w, h, xs.x AS x, ys.y AS y
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS x) xs
        |  CROSS JOIN (SELECT unnest(generate_series(0, 12)) AS y) ys
        |  WHERE xs.x < w AND ys.y < h),
        |blocks AS (
        |  SELECT doc_id, w, h, x // 2 AS bx, y // 2 AS by,
        |         CAST(sum((doc_id*31 + x*7 + y*13) % 256) AS BIGINT) AS sr,
        |         CAST(sum((doc_id*17 + x*11 + y*3) % 256) AS BIGINT) AS sg,
        |         CAST(sum((doc_id*23 + x*5 + y*19) % 256) AS BIGINT) AS sb,
        |         count(*) AS cnt
        |  FROM px GROUP BY 1, 2, 3, 4, 5)
        |SELECT doc_id AS media_id, w AS src_w, h AS src_h,
        |       CAST((w + 1) // 2 AS INTEGER) AS out_w,
        |       CAST((h + 1) // 2 AS INTEGER) AS out_h,
        |       CAST(sum(sr // cnt) AS BIGINT) AS sum_r,
        |       CAST(sum(sg // cnt) AS BIGINT) AS sum_g,
        |       CAST(sum(sb // cnt) AS BIGINT) AS sum_b
        |FROM blocks GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin,
    // Analytic replica of the perceptual-hash pipeline: hashes recomputed
    // from the raster formula (incl. the +8 perturbation), ALL pairs
    // scanned — a hash match proves the engine's banded candidate
    // generation loses no pair within the threshold
    "mm_image_neardups" ->
      """WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
        |cells AS (SELECT doc_id,
        |                 CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |                      ELSE doc_id END AS rid,
        |                 CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS pert,
        |                 xs.x AS x, ys.y AS y
        |          FROM d
        |          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS x) xs
        |          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |gray AS (SELECT doc_id, x, y,
        |           (CASE WHEN pert = 1 AND x = 7 AND y = 7
        |                 THEN ((rid*31 + x*7 + y*13) % 256 + 8) % 256
        |                 ELSE (rid*31 + x*7 + y*13) % 256 END)
        |           + (rid*17 + x*11 + y*3) % 256
        |           + (rid*23 + x*5 + y*19) % 256 AS gv
        |         FROM cells),
        |s AS (SELECT doc_id, sum(gv) AS total FROM gray GROUP BY 1),
        |bits AS (SELECT gray.doc_id,
        |                CASE WHEN gv * 64 > total THEN 1 ELSE 0 END AS b,
        |                y * 8 + x AS pos
        |         FROM gray JOIN s ON gray.doc_id = s.doc_id),
        |h AS (SELECT doc_id,
        |             sum(CASE WHEN pos < 32 THEN b * (1::BIGINT << pos)
        |                      ELSE 0 END) AS lo,
        |             sum(CASE WHEN pos >= 32 THEN b * (1::BIGINT << (pos - 32))
        |                      ELSE 0 END) AS hi
        |      FROM bits GROUP BY 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.hi, b.hi)) +
        |            bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY 1, 2""".stripMargin,
    // Analytic replica of the javax.sound WAV decode: same PCM sample
    // formula as Multimodal.Synth.wav (16-bit PCM lossless)
    "mm_audio_real" ->
      """WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
        |dims AS (SELECT doc_id,
        |                1000 + CAST(doc_id % 7 AS INTEGER) * 100 AS n FROM d),
        |sm AS (
        |  SELECT doc_id, n, ((doc_id*131 + i.i*7919) % 65536) - 32768 AS s
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(generate_series(0, 1599)) AS i) i
        |  WHERE i.i < n)
        |SELECT doc_id AS media_id,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(n AS BIGINT) AS n_samples,
        |       round(sqrt(sum(s*s)::DOUBLE / n), 4) AS rms
        |FROM sm GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "txt_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |              FROM documents),
        |bg AS (SELECT DISTINCT doc_id, b FROM (
        |   SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
        |          i -> concat(t[i], ' ', t[i+1]))) AS b
        |   FROM toks WHERE len(t) >= 2) u),
        |n AS (SELECT count(*) AS nd FROM documents),
        |firsts AS (SELECT b, min(doc_id) AS first_doc FROM bg GROUP BY 1),
        |perdoc AS (
        |  SELECT bg.doc_id, count(*) AS n_bigrams,
        |         sum(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END) AS n_new
        |  FROM bg JOIN firsts f ON bg.b = f.b GROUP BY 1)
        |SELECT CAST(doc_id * 10 // nd AS BIGINT) AS decile,
        |       count(*) AS n_docs,
        |       CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
        |       CAST(sum(n_new) AS BIGINT) AS new_bigrams,
        |       round(sum(n_new) * 1.0 / sum(n_bigrams), 4) AS novelty
        |FROM perdoc, n GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, source, lang,
        |                     string_split_regex(trim(text), '\s+') AS t
        |              FROM documents),
        |h AS (SELECT doc_id, source, lang, substr(md5(b), 1, 2) AS bucket FROM (
        |   SELECT doc_id, source, lang,
        |          unnest(list_transform(generate_series(1, len(t)-1),
        |          i -> concat(t[i], ' ', t[i+1]))) AS b
        |   FROM toks WHERE len(t) >= 2) u),
        |tgt AS (SELECT bucket, count(*) AS tc FROM h WHERE lang = 'en' GROUP BY 1),
        |raw AS (SELECT bucket, count(*) AS rc FROM h GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM h WHERE lang = 'en') AS tt,
        |               (SELECT count(*) FROM h) AS rt),
        |w AS (SELECT raw.bucket,
        |             ln((coalesce(tc, 0) + 1.0) / (tt + 256.0))
        |               - ln((rc + 1.0) / (rt + 256.0)) AS lw
        |      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot),
        |perdoc AS (SELECT doc_id, source, avg(lw) AS score
        |           FROM h JOIN w ON h.bucket = w.bucket GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs, round(avg(score), 4) AS avg_importance
        |FROM perdoc GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_gopher_report" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS t
        |              FROM documents),
        |base AS (
        |  SELECT doc_id, source, len(t) AS n_words,
        |         list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t) AS mwl
        |  FROM toks),
        |tc AS (SELECT doc_id, w, count(*) AS c
        |       FROM (SELECT doc_id, unnest(t) AS w FROM toks) u GROUP BY 1, 2),
        |topshare AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS top_share
        |             FROM tc GROUP BY 1),
        |r AS (
        |  SELECT b.doc_id, b.source,
        |         CASE WHEN n_words BETWEEN 30 AND 10000 THEN 0 ELSE 1 END AS f_len,
        |         CASE WHEN mwl BETWEEN 2.5 AND 8.0 THEN 0 ELSE 1 END AS f_mwl,
        |         CASE WHEN top_share <= 0.15 THEN 0 ELSE 1 END AS f_rep
        |  FROM base b JOIN topshare ts ON b.doc_id = ts.doc_id)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(f_len) AS BIGINT) AS fail_len,
        |       CAST(sum(f_mwl) AS BIGINT) AS fail_wordlen,
        |       CAST(sum(f_rep) AS BIGINT) AS fail_repetition,
        |       CAST(sum(CASE WHEN f_len + f_mwl + f_rep = 0 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS pass_all
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_curation_funnel" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS t
        |              FROM documents),
        |quality AS (
        |  SELECT doc_id, source,
        |         CASE WHEN len(t) BETWEEN 30 AND 10000 THEN 1 ELSE 0 END AS q_ok
        |  FROM toks),
        |sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
        |                     i -> array_to_string(t[i:i+2], ' ')))
        |         END AS s
        |  FROM toks),
        |sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |dup AS (SELECT DISTINCT b.doc_id AS dup_id
        |        FROM sized a JOIN sized b
        |          ON a.doc_id < b.doc_id
        |         AND least(a.n, b.n) >= 0.8 * greatest(a.n, b.n)
        |        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |              / (a.n + b.n - len(list_intersect(a.s, b.s))) >= 0.8),
        |ex AS (SELECT label, vec_id, r.range AS i,
        |              CAST(embedding[r.range] AS DOUBLE) AS x
        |       FROM embeddings, range(1, 65) r),
        |cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |dist AS (SELECT ex.label, ex.vec_id, sqrt(sum((x - c) * (x - c))) AS d
        |         FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
        |         GROUP BY 1, 2),
        |lim AS (SELECT label, avg(d) AS avg_d FROM dist GROUP BY 1),
        |emb_ok AS (SELECT vec_id,
        |                  CASE WHEN d <= 1.02 * avg_d THEN 1 ELSE 0 END AS e_ok
        |           FROM dist JOIN lim ON dist.label = lim.label),
        |verdict AS (
        |  SELECT q.doc_id, q.source, q.q_ok,
        |         CASE WHEN dup.dup_id IS NULL THEN 1 ELSE 0 END AS d_ok,
        |         coalesce(e.e_ok, 1) AS e_ok
        |  FROM quality q
        |  LEFT JOIN dup ON q.doc_id = dup.dup_id
        |  LEFT JOIN emb_ok e ON q.doc_id = e.vec_id)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN q_ok = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS drop_quality,
        |       CAST(sum(CASE WHEN q_ok = 1 AND d_ok = 0 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS drop_dup,
        |       CAST(sum(CASE WHEN q_ok = 1 AND d_ok = 1 AND e_ok = 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS drop_outlier,
        |       CAST(sum(q_ok * d_ok * e_ok) AS BIGINT) AS kept
        |FROM verdict GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
