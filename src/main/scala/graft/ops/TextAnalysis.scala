package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north star,
  * BASELINE.json): tokenization, quality scoring, language-ID heuristic,
  * fingerprinting. All pure `functions._` column expressions — codegen'd,
  * shuffle-free, linear in input size, so they hold at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenizer. `trim` first: Java's split drops trailing empty
    * tokens but keeps leading ones, so untrimmed input would disagree with
    * other engines (and with itself). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one piece (the GPT-2 pre-tokenizer's
    * coarse shape), giving a crude-but-deterministic proxy for LLM token
    * counts. Kept lookaround-free so RE2 engines (DuckDB's oracle among
    * them) reproduce it byte-for-byte; the whitespace class is spelled out
    * explicitly because Java's `\s` includes vertical tab while RE2's
    * does not — an explicit class means both engines agree on every byte. */
  val SubwordRe = "[A-Za-z]+|[0-9]+|[^ \\t\\n\\x0B\\f\\rA-Za-z0-9]"

  def subwordCount(c: Column): Column = regexp_count(c, lit(SubwordRe))

  /** Characters that are a-z after lowercasing, as fraction of all chars. */
  def alphaRatio(c: Column): Column =
    length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") / length(c)

  /** Fraction of chars that are the common punctuation set (kept to a
    * literal class so external oracles can reproduce it regex-engine-
    * independently). */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,!?;:]", "")).cast("double") / length(c)

  val EnStopwords = "the|a|of|and|to|in|is"

  /** Stopword hits (word-boundary matches of the common-English set). */
  def stopwordHits(c: Column): Column =
    regexp_count(lower(c), lit(s"\\b($EnStopwords)\\b"))

  /** Stopword density = hits / tokens — a standard quality signal. */
  def stopwordDensity(c: Column): Column =
    stopwordHits(c).cast("double") / tokenCount(c)

  /** Mean word length (chars excluding whitespace / token count). */
  def avgWordLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") / tokenCount(c)

  /** Per-language stopword profiles for the language-ID heuristic. Order
    * is the deterministic tie-break priority. */
  val LangProfiles: Seq[(String, String)] = Seq(
    "en" -> EnStopwords,
    "de" -> "der|die|das|und|ist|nicht|mit",
    "fr" -> "le|les|et|est|une|dans|pour",
    "es" -> "el|los|y|es|una|con|para")

  /** Heuristic language ID: stopword-profile argmax. Each profile scores
    * word-boundary hits; the best profile wins unless its density
    * (hits/tokens) is below `threshold` → "other". Exactly reproducible
    * by a SQL oracle (counts + greatest + CASE). */
  def langIdGuess(c: Column, threshold: Double = 0.08): Column = {
    val toks = tokenCount(c)
    val scores = LangProfiles.map { case (lang, re) =>
      lang -> regexp_count(lower(c), lit(s"\\b($re)\\b"))
    }
    val best = greatest(scores.map(_._2): _*)
    val argmax = scores.foldRight(lit(scores.last._1): Column) {
      case ((lang, score), elseCol) => when(score === best, lang).otherwise(elseCol)
    }
    when(best.cast("double") / toks < threshold, "other").otherwise(argmax)
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the canonical-form key used by exact dedup. */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** PII scrub patterns — RE2-compatible (no lookarounds) so external
    * oracles and other engines reproduce them byte-for-byte. URLs first:
    * the URL pattern would otherwise consume redacted-email remnants. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** Redact URLs then emails — the minimal PII scrub every training-data
    * pipeline runs before anything else sees the text. Pure per-row
    * regexp_replace: codegen'd, shuffle-free. */
  def redactPII(c: Column): Column =
    regexp_replace(regexp_replace(c, UrlRe, "<URL>"), EmailRe, "<EMAIL>")

  /** Canonical text form for matching/dedup: Unicode NFC (custom codegen
    * expression — Spark has no builtin), lowercase, C0/DEL control chars
    * stripped, whitespace collapsed to single spaces, trimmed. The
    * whitespace class is spelled out because Java's `\s` and RE2's
    * disagree on vertical tab. */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(graft.functions.GraftFunctions.nfc_normalize(c)),
        "[\\x00-\\x08\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def urlCount(c: Column): Column = regexp_count(c, lit(UrlRe))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS algorithm): hash every character k-gram, then keep the
    * MINIMUM hash of each sliding window of `w` consecutive k-grams.
    * GUARANTEE: any substring shared by two documents of length
    * ≥ w + k − 1 contributes at least one common fingerprint (the window
    * covering it selects the same minimal hash in both), while no match
    * shorter than k is ever detected — exact-substring-overlap detection
    * with ~2/(w+1) of the k-gram density.
    *
    * The set of window minima is tie-order-independent (values, not
    * positions, are retained), so the output is deterministic and, with
    * md5 as the k-gram hash, reproducible by any engine — DuckDB replays
    * it as list_min over list slices.
    *
    * One custom-expression pass ([[graft.functions.WinnowFps]]): each
    * k-gram is digested exactly once. The composed higher-order form
    * (transform + array_min(slice(grams, ...))) re-inlines the gram
    * subtree into every window lambda — O(n·w) digests per row, a
    * measured multi-minute stall at sf0.1.
    *
    * Scale: per-row codegen'd work, no shuffle; the downstream pair join
    * is the only exchange, and hot fingerprints are handled there
    * (document-frequency cap, same rationale as prefix filtering's
    * rare-first order). */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    graft.functions.GraftFunctions.winnow_fps(c, k, w)

  /** Deterministic train/val/test assignment from a hash of the id — the
    * standard leakage-safe split: stable under reprocessing, independent
    * of row order or partitioning, reproducible by any engine with md5
    * (the first 4 hex chars mod 100 give the percentile bucket). */
  def trainSplit(idCol: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need train + val < 100 with a nonempty test tail")
    val bucket = conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic stratified downsampling: keep a row iff its id-hash
    * bucket (first 4 md5 hex chars → [0, 65536)) falls below the
    * stratum's target rate. The decision is a pure function of the id, so
    * it is stable under reprocessing, independent of row order and
    * partitioning, and reproducible by any engine with md5 — the standard
    * majority-class rebalancing step of a training-data pipeline. At
    * scale this is a shuffle-free codegen'd filter (the rate ladder is a
    * constant expression, no join against a rates table). */
  def stratifiedKeep(idCol: Column, stratumCol: Column,
                     rates: Map[String, Double], defaultRate: Double = 1.0): Column = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val bucket = conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10).cast("int")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(stratumCol === k, lit(v)).otherwise(acc)
    }
    bucket < rate * lit(65536.0)
  }

  /** Eval-set contamination report: for every corpus document, the
    * fraction of its word n-gram shingles that appear anywhere in a
    * BENCHMARK set — the pretraining-hygiene check that a training corpus
    * does not contain the eval data. Shingles are xxhash64'd in ONE
    * custom-Expression pass per doc ([[Dedup.hashedShingles]] — the
    * composed string form re-evaluates the token split per lambda
    * element); an external oracle reproduces the report with string
    * shingles, since only set-membership COUNTS enter the output and
    * those are hash-invariant (collisions aside — the [[Dedup]] Jaccard
    * argument). The benchmark shingle set is distinct-ed and broadcast
    * (eval sets are small by nature; at 100 TB the corpus side stays
    * shuffle-free and the join is a broadcast hash probe below any
    * exchange).
    *
    * @return (idCol, n_shingles, n_hits, overlap) for corpus docs with
    *         overlap ≥ minOverlap (overlap rounded to 6 places). */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 3, minOverlap: Double = 0.5): DataFrame = {
    def sh(df: DataFrame): DataFrame = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
    val bench = sh(benchmark).select("_sh").distinct()
      .withColumn("_hit", lit(1L))
    sh(corpus)
      .join(broadcast(bench), Seq("_sh"), "left")
      .groupBy("_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hits"))
      .withColumn("overlap", round(col("n_hits") / col("n_shingles"), 6))
      .filter(col("overlap") >= minOverlap)
      .select(col("_id").as(idCol), col("n_shingles"), col("n_hits"), col("overlap"))
  }

  /** Token-budget mixture sampling: admit documents per stratum, in
    * deterministic md5-of-id order, until the stratum's token budget is
    * exhausted — the "epoch mixture" builder that turns per-source
    * sampling weights into an actual document selection. A document is
    * admitted iff the budget was not yet spent BEFORE it (so the last
    * admitted document may overhang its budget by less than one doc —
    * same start-offset rule as [[packBins]]). Pure function of
    * (id, stratum, token counts): layout-invariant, stable under
    * reprocessing, reproducible by any engine with md5 and a window.
    *
    * Scale: one shuffle on the stratum for the per-stratum running sum.
    * A stratum is typically a source/language — if one stratum dominates
    * at extreme scale, pre-aggregate candidates per (stratum, hash
    * prefix) the way [[packBinsDistributed]] stitches offsets. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
                        stratumCol: String, budgets: Map[String, Long],
                        defaultBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require((defaultBudget +: budgets.values.toSeq).forall(_ >= 0), "budgets must be >= 0")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol)).over(w))
      .filter(col("_cum") - col(tokensCol) < budget)
      .drop("_cum")
  }

  /** Context-window packing: assign documents (in `orderCol` order) to
    * consecutive bins of ≤ `budget` tokens — the sequential-fill packing a
    * pretraining pipeline uses to build fixed-size samples. A document
    * whose tokens straddle the boundary starts in the bin its first token
    * lands in (start-offset binning: bin = floor(preceding_tokens/budget)),
    * so bins can overhang by less than one document — exactly reproducible
    * by a SQL window.
    *
    * The running sum here is a single global-order window (one task holds
    * the sorted stream) — fine to a few hundred million rows; use
    * [[packBinsDistributed]] beyond that. */
  def packBins(df: DataFrame, orderCol: String, tokensCol: String,
               budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTie = withPackTie(df)
    val w = Window.orderBy(col(orderCol), col(tokensCol), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTie.withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("bin", floor((col("_cum") - col(tokensCol)) / budget))
      .drop("_cum", "_tie")
  }

  /** Deterministic total-order tiebreak for the packing window: rows tied
    * on `orderCol` are sub-ordered by token count, then by a hash of the
    * row's HASHABLE columns — so duplicate order keys cannot split
    * nondeterministically across range partitions or window evaluations,
    * and [[packBins]] / [[packBinsDistributed]] agree row-for-row. Rows
    * identical in all three keys are mutually interchangeable (equal token
    * counts → swapping them permutes nothing observable). MapType columns
    * are excluded from the hash (xxhash64 rejects maps — unordered, no
    * canonical hash), keeping the operators type-agnostic. */
  private def withPackTie(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    df.withColumn("_tie",
      if (cols.isEmpty) lit(0L) else xxhash64(struct(cols.toSeq: _*)))
  }

  /** [[packBins]] at scale: identical bin assignment, no global-order
    * window. Range-partition by `orderCol`, cumsum per partition, then
    * stitch: per-partition token totals (one tiny row per partition)
    * become prefix offsets added to each partition's local running sum.
    * The only driver-side state is `partitions` longs; result is
    * independent of where the range boundaries land, because the stitched
    * sum IS the global running sum. Equivalence is spec-tested. */
  def packBinsDistributed(df: DataFrame, orderCol: String, tokensCol: String,
                          budget: Long, partitions: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint pins the sampled range boundaries: pass 1 and pass 2
    // must see the SAME row→partition assignment (repartitionByRange
    // re-samples per evaluation otherwise)
    val parted = withPackTie(df)
      .repartitionByRange(partitions, col(orderCol), col(tokensCol), col("_tie"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-partition totals → exclusive prefix offsets (tiny)
    val totals = parted.groupBy("_pid").agg(sum(col(tokensCol)).as("_tot"))
      .orderBy("_pid").collect().map(r => (r.getInt(0), r.getLong(1)))
    var acc = 0L
    val offsets = totals.toSeq.map { case (pid, tot) =>
      val o = (pid, acc); acc += tot; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("_pid", "_offset")
    // pass 2: partition-local cumsum + broadcast offset = global cumsum
    val w = Window.partitionBy("_pid")
      .orderBy(col(orderCol), col(tokensCol), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(broadcast(offsetDf), Seq("_pid"), "left")
      .withColumn("_cum",
        sum(col(tokensCol)).over(w) + coalesce(col("_offset"), lit(0L)))
      .withColumn("bin", floor((col("_cum") - col(tokensCol)) / budget))
      .drop("_pid", "_offset", "_cum", "_tie")
  }

  /** Per-document quality feature vector, appended as columns. */
  def withQualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_tokens", tokenCount(c))
      .withColumn("alpha_ratio", alphaRatio(c))
      .withColumn("punct_ratio", punctRatio(c))
      .withColumn("stop_density", stopwordDensity(c))
      .withColumn("avg_word_len", avgWordLen(c))
      .withColumn("lang_guess", langIdGuess(c))
      .withColumn("fp", fingerprint(c))
  }

  /** RAG-style document chunking: overlapping token windows of `win`
    * tokens advancing by `stride` (`stride < win` ⇒ `win − stride` tokens
    * of overlap — the context-continuity knob). The last window starts at
    * the smallest multiple of `stride` that reaches the document end, so
    * every token lands in ≥ 1 chunk and a short final chunk is emitted
    * rather than dropping the tail; a document shorter than `win` is one
    * whole-document chunk. Pure per-row generate/slice arithmetic — no
    * shuffle, no state; chunk explosion is bounded by n·win/stride. */
  /** BPE TOKENIZER TRAINING (Sennrich, Haeberli & Birch, ACL 2016 — the
    * subword-vocabulary algorithm behind GPT/Llama-style tokenizers),
    * run as a corpus pipeline: `merges` iterations of (count adjacent
    * symbol pairs weighted by word frequency → take the max-count pair,
    * ties broken lexicographically → merge it left-to-right in every
    * word). Returns the learned merge table (step, left_sym, right_sym,
    * n) — the artifact a tokenizer ships.
    *
    * Scale design: the ONLY corpus-sized pass is the word-frequency
    * aggregation the caller does once; training state is the WORD
    * VOCABULARY (w, freq) — vocab-sized, never the corpus — re-scanned
    * once per merge, exactly like the k-means Lloyd loop re-scans its
    * corpus with vocab-bounded state. Symbol sequences ride ONE string
    * column: each word is held as " s1  s2  …  sk " (every symbol
    * space-wrapped, so token boundaries can never false-match inside a
    * symbol), pair counting is a split + positional-pair explode +
    * vocab-bounded agg, and applying a merge is a single literal
    * `replace(s, " l  r ", " lr ")` — left-to-right non-overlapping in
    * both the JVM and any SQL engine, which IS the BPE merge rule, so an
    * external engine replays every step bit-for-bit. Per iteration the
    * driver holds one 3-field argmax row; the state is localCheckpointed
    * (kmeans pattern) so lineage stays one-step deep.
    *
    * Contract: symbols are drawn from `^[a-z]{2,}$` words (the caller
    * filters; keeps the merge-literal quoting and regex semantics
    * engine-portable — ASCII also makes the JVM/UTF-8/engine string
    * orders coincide for the tiebreak). Stops early when no pair is
    * left to merge.
    *
    * Small-vocabulary gate (the kmeans/graph driver-solve precedent):
    * when the vocabulary holds ≤ `localMaxRows` words the merge loop
    * runs on the driver over the collected (word, freq) table —
    * spec-proven bit-equal to the distributed loop (BpeSpec), it only
    * removes 2·merges tiny-job round trips. The distributed loop is the
    * scale path and stays reachable via localMaxRows = 0. */
  def bpeTrain(words: DataFrame, wordCol: String, freqCol: String,
               merges: Int, localMaxRows: Long = 65536): DataFrame = {
    require(merges >= 1 && merges <= 4096, s"merges in [1,4096]: $merges")
    val spark = words.sparkSession
    // clamp BEFORE the Int conversion: a localMaxRows above Int.MaxValue
    // would wrap negative in toInt, turn the probe into limit(1), and
    // pass the gate on ANY corpus — collecting it all to the driver
    val localCap = math.max(0L, math.min(localMaxRows, (Int.MaxValue - 1).toLong))
    if (words.limit(localCap.toInt + 1).count() <= localCap) {
      import spark.implicits._
      val vocab = words
        .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
        .as[(String, Long)].collect()
      return bpeTrainLocal(vocab, merges)
        .toDF("step", "left_sym", "right_sym", "n")
    }
    // the state is vocab-sized — a handful of partitions keeps the
    // per-iteration job scheduling cost from dominating 48 tiny scans
    var state = words
      .select(regexp_replace(col(wordCol), "(.)", " $1 ").as("s"),
        col(freqCol).cast("long").as("freq"))
      .coalesce(8)
      .localCheckpoint(true)
    var last = state
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val top = state
        .select(col("freq"), split(trim(col("s")), "  ").as("t"))
        .select(col("freq"), explode(expr(
          "transform(slice(t, 2, size(t) - 1), (x, i) -> " +
            "struct(t[i] AS l, x AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(desc("n"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        // the merged symbols are about to be interpolated into a literal
        // `replace` expression: a contract-violating vocab (quotes, regex
        // or SQL metacharacters — the ^[a-z]{2,}$ caller filter skipped)
        // must fail HERE, loudly, not as a malformed/injected expression
        require(l.matches("[a-z]+") && r.matches("[a-z]+"),
          s"bpeTrain contract violated: merge symbols ('$l', '$r') not " +
            "^[a-z]+$ — callers must filter the vocabulary to ^[a-z]{2,}$ words")
        out += ((step, l, r, top(0).getLong(2)))
        state = state.select(
          expr(s"replace(s, ' $l  $r ', ' $l$r ')").as("s"), col("freq"))
        // replace is a narrow per-row op — let 4 of them chain lazily and
        // cut lineage every 4th merge (a checkpoint per merge doubles the
        // job count for no correctness gain); fully-merged single-symbol
        // words can never pair again, so each checkpoint sheds them
        if (step % 4 == 0) {
          val next = state.filter(col("s").contains("  ")).localCheckpoint(true)
          last.unpersist(blocking = false)
          last = next
          state = next
        }
        step += 1
      }
    }
    last.unpersist(blocking = false)
    import spark.implicits._
    out.toSeq.toDF("step", "left_sym", "right_sym", "n")
  }

  /** BPE ENCODING as a corpus pipeline — the apply side of [[bpeTrain]]:
    * run a learned merge table over every document and report the
    * per-group token compression (the number a tokenizer-budget planner
    * actually needs). ONE corpus pass: each document becomes one
    * symbol-string (alphabetic tokens char-expanded to the space-wrapped
    * form, anything else an opaque single symbol; words joined by '|',
    * which no [a-z] merge literal can cross), the merge table folds into
    * a chain of literal `replace` calls inside a single codegen'd
    * projection — no shuffle until the final per-group rollup. Symbol
    * counts before/after are the same split-and-filter expression any
    * engine reproduces. Returns (group, n_docs, sym_before, sym_after,
    * ratio). */
  def bpeEncodeReport(docs: DataFrame, textCol: String, byCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (l, r) =>
      l.matches("[a-z]+") && r.matches("[a-z]+") },
      "merge symbols must be ^[a-z]+$ (the bpeTrain contract)")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val repr0 = concat_ws("|", transform(toks, w =>
      when(w.rlike("^[a-z]+$"), regexp_replace(w, "(.)", " $1 "))
        .otherwise(concat(lit(" "), w, lit(" ")))))
    def nSyms(c: Column): Column =
      size(filter(split(c, " +"), x => x =!= "" && x =!= "|")).cast("long")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(byCol), repr0.as("s"))
      .withColumn("n_before", nSyms(col("s")))
    val enc = merges.foldLeft(base) { case (d, (l, r)) =>
      d.withColumn("s", expr(s"replace(s, ' $l  $r ', ' $l$r ')")) }
    enc.withColumn("n_after", nSyms(col("s")))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_before").as("sym_before"), sum("n_after").as("sym_after"))
      .withColumn("ratio", round(
        col("sym_after").cast("double") / col("sym_before").cast("double"), 6))
  }

  /** The textbook BPE loop on the driver — the [[bpeTrain]] gate's exact
    * small-vocab replay: count weighted adjacent pairs, argmax with
    * (count desc, pair asc) tiebreak, left-to-right non-overlapping
    * merge. Symbol sequences here are Vectors; the distributed loop's
    * space-wrapped string replace implements the identical rule. */
  private[graft] def bpeTrainLocal(vocabIn: Seq[(String, Long)],
      merges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      vocabIn.map { case (w, f) => w.map(_.toString).toVector -> f }
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
        vocab = vocab.flatMap { case (syms, f) =>
          val m = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              m += l + r; i += 2
            } else { m += syms(i); i += 1 }
          }
          val v = m.result()
          if (v.length >= 2) Some(v -> f) else None // no pair can form
        }
        step += 1
      }
    }
    out.result()
  }

  /** BATCH PERCEPTRON training (Rosenblatt 1958 in the batch-subgradient
    * form: w ← w + Σ_{misclassified} y·x once per epoch) — the linear
    * classifier a curation pipeline trains to distill a quality/language
    * signal into surface features, kept FULLY INTEGER so training
    * replays bit-for-bit in any engine: features and labels are
    * fixed-point longs, the margin w·x, the misclassification test
    * y·m ≤ 0 and the per-epoch update sum are exact 64-bit arithmetic —
    * and an integer Σ commutes across partitions, so the learned
    * weights are a pure function of the data, independent of
    * partitioning or visit order (the property per-sample SGD
    * fundamentally lacks — THE distributed-training contract).
    *
    * One corpus pass per epoch over a localCheckpointed feature table;
    * driver state is the |x|-long weight vector (bounded). Margins stay
    * far inside Int64: |w_k| grows ≤ Σ|x_k| per epoch, so at 1e9 docs ×
    * 1e3-scaled features × 64 epochs the margin bound ≈ 6·10^16 < 2^63.
    * Returns one row per epoch: (epoch, w_<col>…). */
  def perceptronTrain(feats: DataFrame, yCol: String, xCols: Seq[String],
                      epochs: Int): Seq[(Int, Array[Long])] = {
    require(epochs >= 1 && epochs <= 64, s"epochs in [1,64]: $epochs")
    require(xCols.nonEmpty, "need at least one feature column")
    val f = feats.localCheckpoint(true)
    var w = Array.fill(xCols.length)(0L)
    val hist = Seq.newBuilder[(Int, Array[Long])]
    for (e <- 1 to epochs) {
      val margin = xCols.zipWithIndex
        .map { case (c, i) => col(c) * lit(w(i)) }
        .reduce(_ + _)
      val mis = (col(yCol) * margin) <= 0L
      val row = f.select(xCols.map(c =>
        coalesce(sum(when(mis, col(yCol) * col(c)).otherwise(lit(0L))),
          lit(0L)).as(c)): _*).head()
      w = Array.tabulate(xCols.length)(i => w(i) + row.getLong(i))
      hist += ((e, w.clone()))
    }
    f.unpersist(blocking = false)
    hist.result()
  }

  /** TEXTRANK keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the word co-occurrence graph — nodes are content
    * words (lowercase ^[a-z]{3,}$, stopwords out), edges join words
    * ADJACENT in the filtered token sequence, undirected, weighted by
    * corpus pair count (pairs seen < `minW` times dropped — the same
    * sparsifier as the co-purchase graph). The rank recurrence is the
    * exact integer fixed-point form of [[Graph.pageRank]]'s oracle:
    * pr ← Total·15%//n + Σ (pr_src·85·w)//(100·tw), Total = 1e12 —
    * floor division everywhere, so every round is order-free exact
    * arithmetic and the whole unroll replays bit-for-bit in SQL.
    * Scale: the state is vocab-sized (distinct content words), each
    * round is one co-partitioned join + aggregation on (word) keys;
    * the corpus is scanned ONCE to build edges. Returns the full
    * (word, rank_fp) table after `iters` rounds. */
  def textRank(docs: DataFrame, textCol: String, stops: Seq[String],
               iters: Int = 5, minW: Long = 2L,
               localMaxEdges: Long = 65536): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters in [1,64]: $iters")
    // stops are interpolated into a SQL string literal list: reject
    // anything beyond plain lowercase words (a quote would break the
    // expression; worse, inject) instead of generating malformed SQL
    require(stops.forall(_.matches("[a-z]+")),
      s"textRank stops must be ^[a-z]+$$ words: " +
        stops.filterNot(_.matches("[a-z]+")).take(3).mkString(", "))
    val stopList = stops.map(w => s"'$w'").mkString(", ")
    val ft = expr(
      s"""filter(split(trim(lower(`$textCol`)), '\\\\s+'),
         |       x -> x rlike '^[a-z]{3,}$$' AND NOT x IN ($stopList))"""
        .stripMargin)
    val pairs = docs.filter(col(textCol).isNotNull)
      .select(ft.as("ft"))
      .filter(size(col("ft")) >= 2) // <2 content words ⇒ no pairs
      .select(explode(expr(
        """transform(slice(ft, 2, size(ft) - 1),
          |          (x, j) -> named_struct('l', element_at(ft, j + 1), 'r', x))"""
          .stripMargin)).as("p"))
      .filter(col("p.l") =!= col("p.r"))
    val pe = pairs
      .select(least(col("p.l"), col("p.r")).as("a"),
        greatest(col("p.l"), col("p.r")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
    val edges = pe.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(pe.select(col("b"), col("a"), col("w")))
    val ow = edges.groupBy("src").agg(sum("w").as("tw"))
      .localCheckpoint(true) // vocab-sized; seeds p0 AND every round's join
    val e = edges.join(ow, "src").localCheckpoint(true)
    val n = ow.count() // driver scalar, vocab-bounded
    require(n > 0, "textRank: empty co-occurrence graph")
    val teleport = 150000000000L / n
    // small-graph driver gate (the bpeTrain/kmeans precedent): when the
    // symmetric edge list fits comfortably on the driver, run the SAME
    // integer recurrence locally — TextRankSpec proves bit-equality to
    // the distributed loop; this only removes 2·iters tiny-job round
    // trips. The distributed loop is the scale path (localMaxEdges = 0).
    // same Int-wrap clamp as bpeTrain's gate: localMaxEdges above
    // Int.MaxValue must not collapse the probe to limit(1)
    val edgeCap = math.min(localMaxEdges, (Int.MaxValue - 1).toLong)
    if (edgeCap > 0 &&
        e.limit(edgeCap.toInt + 1).count() <= edgeCap) {
      val spark = docs.sparkSession
      import spark.implicits._
      val ed = e.select(col("src"), col("dst"), col("w"), col("tw"))
        .as[(String, String, Long, Long)].collect()
      val nodes = ed.map(_._1).distinct
      var pr = nodes.map(_ -> 1000000000000L / n).toMap
      for (_ <- 1 to iters) {
        val acc = scala.collection.mutable.Map.empty[String, Long]
        for ((s0, d0, w0, tw0) <- ed)
          acc(d0) = acc.getOrElse(d0, 0L) + pr(s0) * 85L * w0 / (100L * tw0)
        pr = nodes.map(nd => nd -> (teleport + acc.getOrElse(nd, 0L))).toMap
      }
      return pr.toSeq.toDF("word", "rank_fp")
    }
    var p = ow.select(col("src").as("id"), lit(1000000000000L / n).as("pr"))
    var last = p
    for (i <- 1 to iters) {
      p = e.join(p, e("src") === p("id"))
        .groupBy(col("dst").as("id"))
        .agg((lit(teleport) +
          sum(expr("(pr * 85 * w) div (100 * tw)"))).as("pr"))
        .select(col("id"), col("pr"))
        .localCheckpoint(true)
      last.unpersist(blocking = false)
      last = p
    }
    p.select(col("id").as("word"), col("pr").cast("long").as("rank_fp"))
  }

  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   win: Int, stride: Int): DataFrame = {
    require(win >= 1 && stride >= 1 && stride <= win,
      s"need 1 <= stride <= win, got win=$win stride=$stride")
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .withColumn("n", size(col("_toks")))
      .withColumn("s", explode(expr(
        s"sequence(0, CASE WHEN n <= $win THEN 0 " +
          s"ELSE ((n - $win + ${stride - 1}) div $stride) * $stride END, $stride)")))
      .select(col("doc_id"), (col("s") / stride).cast("long").as("chunk_id"),
        expr(s"concat_ws(' ', slice(_toks, s + 1, $win))").as("chunk_text"),
        least(lit(win), col("n") - col("s")).cast("long").as("n_tokens"))
  }
}
