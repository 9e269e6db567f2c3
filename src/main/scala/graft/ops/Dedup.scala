package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{shingle_hashes, simhash64}

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All designed as shuffle-frugal Spark plans:
  *
  *  - exact: one hash-aggregate on the fingerprint (single shuffle);
  *  - MinHash LSH: explode to (band, bandHash) buckets → self-join INSIDE
  *    buckets only — the classic way to avoid the O(n²) cross join at
  *    100 TB; candidate verification is a second, far smaller stage;
  *  - SimHash: one custom codegen'd expression per row, near-dup = small
  *    Hamming distance, banded the same way;
  *  - n-gram Jaccard: exact verifier over candidate pairs.
  */
object Dedup {

  /** One-generation registry for the multi-consumer ops (the
    * [[graft.ops.Graph]] pattern, adapted to lineage fences). Round 13:
    * ACTION-scoped via [[GenCache]] — the generation is retired when the
    * consuming action completes, not only at the next operator entry, so
    * a persisted corpus-sized intermediate never pins executor storage
    * for a caller that invokes once, and no later bench row can read
    * state this invocation paid for. Entry retirement stays as the
    * synchronous fallback (also what keeps suite memory bounded if a
    * constructed plan is never consumed — the round-9 finding: leftover
    * generations put [[containmentPairs]] under suite memory pressure,
    * 5.5× max/min spread). Fence retirement is reference-release only
    * (a localCheckpoint is not in the CacheManager; blocks free via the
    * ContextCleaner once unreferenced) — consumers hold the checkpointed
    * RDD through their plans, so the schedule cannot slow them. A caller
    * holding a result across two invocations must materialize it first
    * (same contract as Graph's generation cache). */
  private val generation = new GenCache
  private def retireLastGeneration(): Unit = generation.retire()

  /** Public release hook: drop any cached dedup generation now. */
  def releaseCaches(): Unit = generation.retire()
  /** Join-strategy pick for the doc-sized norm/size relation joined onto
    * the Σdf² pair relation, gated by the FREE corpus row count
    * (parquet-footer metadata threaded by the caller, the
    * Checks.uniquenessFor pattern): broadcast while the side fits
    * comfortably (≤ 2²¹ docs ≈ 32 MB), SHUFFLE_HASH beyond — the
    * fallback must build a hash map on the doc-sized side, never
    * sort-merge (which sorts the pair relation TWICE; measured 464 s of
    * pure pair-table sort at the 100× rehearsal — README). docRows ≤ 0
    * means UNKNOWN: emit NO hint and let AQE pick from the observed
    * runtime size — forcing broadcast on an unmeasured corpus would be
    * a driver-memory bet an external caller never agreed to. */
  private[graft] def normJoinHint(docRows: Long): Option[String] =
    if (docRows <= 0L) None
    else if (docRows > (1L << 21)) Some("shuffle_hash")
    else Some("broadcast")

  /** Apply an optional join-strategy hint (None = let AQE decide). */
  private[graft] def maybeHint(df: DataFrame, h: Option[String]): DataFrame =
    h.fold(df)(df.hint(_))

  private def fence(df: DataFrame): DataFrame =
    generation.addFence(df.localCheckpoint(eager = true))

  /** Lazy one-generation persist — the [[fence]] role (multi-consumer
    * subtree computed once, plan truncated to an InMemoryRelation leaf)
    * without the eager materialization JOB: the first consumer computes
    * the subtree inside its own action, keeping the upstream stage
    * pipelined into it (the Graph `mat` finding: lazy persist measured
    * 4–5× cheaper than eager localCheckpoint there). Retired by the same
    * [[retireLastGeneration]] schedule as the fences. */
  private def matLazy(df: DataFrame): DataFrame = generation.add(df)

  /** Exact dedup: keep the smallest id per canonical-text fingerprint.
    * Deterministic survivor choice (min id) so replays are stable.
    * `min_by` aggregation, not a row_number window: aggregates combine
    * map-side, so duplicate-heavy partitions collapse BEFORE the shuffle
    * (a window ships every row to the fingerprint's reducer). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select(col("_row.*"))
  }

  /** Word n-gram shingles (distinct strings) — reference form, used in
    * tests/specs. The hot paths use [[hashedShingles]] (one custom-
    * Expression pass) instead: the composed form re-evaluates the token
    * split per lambda element (~1ms/doc). */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(c)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Distinct hashed n-gram shingles: tokenize once, then one O(tokens)
    * pass ([[graft.functions.ShingleHashes]]). The set currency for
    * MinHash and Jaccard. */
  def hashedShingles(c: Column, n: Int = 3): Column =
    shingle_hashes(TextAnalysis.tokens(c), n)

  /** MinHash signature: one custom-Expression pass over the shingles
    * (per-shingle xxhash64 + numPerm universal-hash mixes, all minima
    * tracked simultaneously — see [[graft.functions.MinHashSignature]]).
    * Embarrassingly parallel, no shuffle. */
  def minhashSignature(shingleCol: Column, numPerm: Int = 64): Column =
    graft.functions.GraftFunctions.minhash_signature(shingleCol, numPerm)

  /** LSH candidate pairs: signatures banded into `bands`; docs sharing any
    * band land in one bucket; pairs are generated bucket-locally.
    * Returns (id_a, id_b) with id_a < id_b, deduplicated across bands. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            numPerm: Int = 64, bands: Int = 16): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    val sig = Par.spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        minhashSignature(hashedShingles(col(textCol)), numPerm).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), lit(b * rowsPerBand + 1), lit(rowsPerBand)))): _*)))
      .toDF("id", "band", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Prefix-filtering candidate pairs (SSJoin, Chaudhuri et al. ICDE
    * 2006; All-Pairs, Bayardo et al. WWW 2007): the LOSSLESS
    * alternative to MinHash banding. Order every doc's shingle set by a
    * single global order — ascending document frequency, rarest first —
    * and keep only the PREFIX of the first |x| − ceil(t·|x|) + 1
    * shingles. If J(A,B) ≥ t then |A∩B| ≥ ceil(t·max(|A|,|B|)), and the
    * first common shingle in the global order provably sits inside BOTH
    * prefixes (were it past A's prefix, fewer than ceil(t|A|) shingles
    * of A could be shared at all) — so joining on prefix shingles
    * generates every qualifying pair: exact recall, no probabilistic
    * miss bound.
    *
    * Scale: candidates are generated by an equi-join on shingle value,
    * never a cross join, and the rare-first order is also the skew
    * defense — a shingle shared by k docs lands in prefixes only where
    * it ranks among those docs' rarest, so hot shingles (the skew
    * killers at 100 TB) are systematically EXCLUDED from prefixes while
    * recall stays exact. Two shuffles (df count, prefix join), both on
    * shingle hash; per-doc ordering is an array_sort, not a window. */
  def prefixJaccardCandidates(df: DataFrame, idCol: String, textCol: String,
                              threshold: Double, n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val sh = Par.spread(df.select(col(idCol), col(textCol)))
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), hashedShingles(col(textCol), n).as("toks"))
      .filter(size(col("toks")) > 0)
    val tok = sh.select(col("id"), explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    val pref = tok.join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("id"), explode(slice(
        transform(col("ord"), s => s.getField("tok")), lit(1),
        (size(col("ord")) - ceil(lit(threshold) * size(col("ord"))) + 1)
          .cast("int"))).as("tok"))
    pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for given candidate pairs (the verification
    * stage after LSH/blocking candidate generation). `pairs` needs
    * id_a/id_b. Work is O(|pairs| × set size) — the candidate generator's
    * job is to keep |pairs| near-linear in corpus size (LSH banding or
    * blocking), which is what makes the two-stage design hold at 100 TB.
    * Shingles are xxhash64'd once per doc before the join (set ops over
    * longs, Jaccard identical up to negligible collision probability);
    * `common/(|A|+|B|−common)` avoids materializing the union. */
  def jaccardVerify(pairs: DataFrame, df: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    // known_not_null: the jaccard-threshold filter downstream infers
    // isnotnull(_n) and would re-evaluate shingle_hashes below this
    // projection (once per row in a Filter) without the annotation
    import graft.functions.GraftFunctions.known_not_null
    val sh = Par.spread(df.select(col(idCol), col(textCol)))
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        known_not_null(hashedShingles(col(textCol), n)).as("_sh"))
      .withColumn("_n", known_not_null(size(col("_sh"))))
    Par.spread(pairs)
      .join(sh.toDF("id_a", "sh_a", "n_a"), "id_a")
      .join(sh.toDF("id_b", "sh_b", "n_b"), "id_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Asymmetric CONTAINMENT pairs: C(a→b) = |S(a)∩S(b)| / |S(a)| over
    * word n-gram shingle sets — the measure that catches a short document
    * living inside a long one (quotes, boilerplate wrappers, excerpt
    * pages), which resemblance (Jaccard) structurally misses when sizes
    * differ (Broder 1997 distinguishes exactly these two). Candidates and
    * exact counts come from ONE mechanism: explode the per-doc shingle
    * set and equi-join on the shingle — never corpus². Shingles whose
    * document frequency exceeds `maxDf` are dropped from the universe
    * first (both set sizes and intersections count the capped universe —
    * the cap is part of the operator's contract, mirrored exactly by the
    * oracle): boilerplate stop-shingles are precisely the ones that make
    * the postings join quadratic, and Σ df² with df ≤ maxDf bounds the
    * join at maxDf × |postings|. Returns DIRECTED pairs (id_a contained
    * in id_b) with the shared-shingle count and the containment ratio. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       maxDf: Long = 128L, docRows: Long = 0L): DataFrame = {
    retireLastGeneration()
    val normHint = normJoinHint(docRows)
    val sh = Par.spread(df.select(col(idCol), col(textCol)))
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), n)).as("g"))
    // ONE shuffle on the shingle builds df-capped postings BUCKETS
    // (≤ maxDf ids each); in-bucket pairs come from a positional i<j
    // lambda over the SORTED bucket array — no postings self-join (whose
    // two identically-shuffled sides Spark plans as two full explode
    // lineages; measured 4.8× at 10× data from exactly that recompute +
    // the broadcast→shuffle plan cliff), and each unordered pair is
    // generated ONCE (halving the exploded volume vs x≠y); both directed
    // rows are emitted after the count, which is symmetric.
    // one-generation lineage fence (see [[fence]]): three consumers (set
    // sizes twice — one join per direction — and the pair generator)
    // would otherwise each replay the corpus-scan → explode →
    // collect_list lineage; the relation is vocab-sized with
    // ≤ maxDf-element arrays, far smaller than its input
    // eager fence, NOT matLazy: the lazy variant A/B'd neutral-to-worse
    // here (1.6-1.75 eager vs 1.67-1.83 lazy min-of-5) with one 8× spread
    // outlier — this op's three consumers sit in one action, so the
    // eager jobs it saves are already amortized, unlike cosinePairsTf
    val buckets = fence(sh.groupBy("g")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) <= maxDf))
    // capped-universe set size per doc INCLUDES singleton buckets (df = 1
    // shingles belong to S(a) even though they pair with nothing)
    val sizes = fence(buckets.select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n")))
    val common = buckets.filter(size(col("ids")) >= 2).select(explode(expr(
        """flatten(transform(sequence(2, size(ids)), j ->
          |  transform(slice(ids, 1, j - 1),
          |    x -> named_struct('id_a', x, 'id_b', element_at(ids, j)))))"""
          .stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      // doc-sized set sizes onto the Σdf² pair relation — hint gated by
      // the free corpus row count (normJoinHint): broadcast while the
      // size table fits, SHUFFLE_HASH beyond it, NEVER the sort-merge
      // default that sorts the pair relation twice (the 100×-rehearsal
      // finding — README)
      .join(maybeHint(sizes.select(col("id").as("id_a"), col("n").as("n_a")),
        normHint), "id_a")
      .join(maybeHint(sizes.select(col("id").as("id_b"), col("n").as("n_b")),
        normHint), "id_b")
    // both directed rows from ONE pass (a union would reference `common`
    // twice and re-run the whole pair pipeline per arm)
    common.select(explode(array(
        struct(col("id_a"), col("id_b"), col("common"),
          (col("common").cast("double") / col("n_a")).as("containment")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b"), col("common"),
          (col("common").cast("double") / col("n_b")).as("containment"))))
        .as("r"))
      .select(col("r.id_a").as("id_a"), col("r.id_b").as("id_b"),
        col("r.common").as("common"), col("r.containment").as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Word n-gram MULTISET as strings (duplicates kept — the frequency
    * currency for [[cosinePairsTf]], where [[wordShingles]]' distinct set
    * would erase exactly the repetition signal cosine exists to see).
    * Reference form for specs; the hot path is
    * `GraftFunctions.shingle_hash_list` (the non-distinct
    * [[graft.functions.ShingleHashes]] pass) — this composed form
    * re-evaluates the token split per lambda element, O(tokens²)/doc
    * (measured 12 s of a 20 s stage at sf0.1). n = 1 degrades to plain
    * tokens. */
  def wordShingleList(c: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(c)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Shingle-frequency COSINE pairs over the df-capped n-gram space — the
    * vector-model angle between documents (Salton) on n-gram TERM
    * FREQUENCIES, the third member of the near-dup measure family next to
    * resemblance (Jaccard, set-valued) and containment (asymmetric):
    * repetition-aware — a doc that repeats a phrase 10× is FAR from one
    * using it once, where their shingle SETS are identical. N-grams with
    * document frequency > `maxDf` are dropped from the universe first —
    * numerator and BOTH norms count the capped universe, so the cap is the
    * operator's contract (mirrored exactly by the oracle), and it is also
    * what bounds the candidate join: per-gram postings buckets hold
    * ≤ maxDf (id, tf) entries, in-bucket pairs come from the positional
    * i<j lambda (each unordered pair once, no postings self-join — the
    * containmentPairs plan finding), so pair volume ≤ maxDf × |postings|.
    * (The default n = 3 matters on small-vocabulary corpora: unigram dfs
    * saturate any useful cap, while n-gram dfs stay selective — the same
    * reason the whole shingle family works.) Everything is integer until
    * the final comparison: cos²(a,b) in 1e-12 fixed point as
    * (dot² · Total) div (‖a‖²·‖b‖²) with DECIMAL(38,0) intermediates
    * (dot²·Total ≈ 1e24 overflows a long at corpus tf scales), and the
    * cos ≥ threshold test becomes the integer test
    * cos2_fp ≥ ⌊threshold²·Total⌋ — exact at the 1e-12 fixed-point
    * granularity: floor quantization admits pairs whose cos² lies in
    * [⌊t²·1e12⌋/1e12, t²), and the oracle applies the IDENTICAL
    * quantized threshold, so engine and oracle always agree (tf ≥ 0 ⇒
    * cos ≥ 0, so squaring is monotone).
    * Returns (id_a < id_b, dot, cos2_fp). */
  def cosinePairsTf(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, threshold: Double = 0.8,
                    maxDf: Long = 128L, docRows: Long = 0L): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0)
    require(maxDf >= 2)
    retireLastGeneration()
    val thresholdFp = math.floor(threshold * threshold * 1e12).toLong
    val normHint = Dedup.normJoinHint(docRows)
    // stage bodies live in [[CosineTfStages]] (probes time the SAME
    // plans — no copied formulas to drift). Fenced here: two consumers
    // (norms and the pair generator) must not each replay the corpus
    // scan → explode → aggregate lineage.
    val tf = CosineTfStages.tf(df, idCol, textCol, n)
    val buckets = matLazy(CosineTfStages.buckets(tf, maxDf))
    val norms = matLazy(CosineTfStages.norms(buckets))
    val dots = CosineTfStages.dots(buckets)
    CosineTfStages.score(dots, norms, normHint)
      .filter(col("cos2_fp") >= thresholdFp)
      .select(col("id_a"), col("id_b"), col("dot"),
        col("cos2_fp").cast("long").as("cos2_fp"))
  }

  /** MinHash-estimated Jaccard for all candidate pairs (no exact verify):
    * fraction of agreeing signature components. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          numPerm: Int = 64, bands: Int = 16,
                          threshold: Double = 0.5): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, numPerm, bands)
    jaccardVerify(cands, df, idCol, textCol).filter(col("jaccard") >= threshold)
  }

  /** SimHash per document (custom expression) + banded near-dup pairs with
    * Hamming distance ≤ maxHamming. 4 bands of 16 bits: any pair within
    * Hamming ≤ 3 shares at least one exact 16-bit band — pairs beyond that
    * are found only when they happen to share a band, so recall above
    * Hamming 3 is partial BY DESIGN (raise `bands` for a wider guarantee).
    * `algo` picks the per-token hash ([[graft.functions.SimHash64]]):
    * xxh64 for production speed, md5 for cross-engine-verifiable sigs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   algo: String = graft.functions.SimHash64.Xxh64): DataFrame = {
    val sigs = Par.spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        simhash64(TextAnalysis.tokens(col(textCol)), algo).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "sim", "band", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-dup pairs: groups transitively-linked
    * documents into dedup clusters (keep one representative per cluster).
    * Iterative min-label propagation over the symmetric edge set; each
    * round is one join + one aggregation, labels localCheckpoint'ed so
    * lineage stays flat (at production scale: reliable checkpoint dir).
    * Converges in O(diameter) rounds — near-dup graphs are short-diameter
    * in practice; `maxIter` bounds the worst case.
    *
    * @param pairs edges with columns id_a/id_b
    * @return (id, cluster) where cluster = min id reachable
    */
  def nearDupClusters(pairs: DataFrame, maxIter: Int = 20,
                      driverThreshold: Long = 1000000L): DataFrame = {
    require(driverThreshold >= 0 && driverThreshold < Int.MaxValue,
      "driverThreshold must fit in an Int limit")
    val spark = pairs.sparkSession
    val idType = pairs.schema("id_a").dataType
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()

    // The edge set is the REDUCED output of LSH + verification — usually
    // tiny relative to the corpus. Below the threshold, exact union-find
    // on the driver beats rounds of distributed jobs; above it, fall
    // through to the propagation loop.
    //
    // Materialize the (expensive) candidate lineage ONCE before probing:
    // limit().collect() executes INCREMENTALLY (one partition first, then
    // scaleUpFactor× more per retry), so probing the raw lineage re-runs
    // LSH + verification several times over growing partition subsets —
    // measured as both excess cost and high bench variance. After the
    // checkpoint, the probe and the propagation loop read materialized
    // blocks. Ids keep their original type on both paths (min by natural
    // Spark ordering / Scala Ordering).
    val matEdges = edges.localCheckpoint()
    val probe = matEdges.limit(driverThreshold.toInt + 1).collect()
    if (probe.length <= driverThreshold) {
      implicit val anyOrd: Ordering[Any] = (a: Any, b: Any) => (a, b) match {
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
        case (x, y) => x.toString.compareTo(y.toString)
      }
      val parent = scala.collection.mutable.Map.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.get(0), row.get(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(anyOrd.max(ra, rb)) = anyOrd.min(ra, rb)
      }
      val rows = parent.keys.toSeq.map(id =>
        org.apache.spark.sql.Row(id, find(id)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("cluster", idType))))
    }
    var labels = matEdges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val prop = matEdges
        .join(labels.select(col("id").as("src"), col("cluster")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("cluster").as("neighbor_min"))
      val next = labels
        .join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("neighbor_min"), col("cluster"))).as("cluster"))
        .localCheckpoint()
      changed = next.select(col("id"), col("cluster").as("c2"))
        .join(labels, "id")
        .filter(col("c2") =!= col("cluster")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"nearDupClusters: label propagation did not converge in $maxIter rounds " +
          s"($changed labels still changing) — long near-dup chains may be split; " +
          "raise maxIter for graphs with diameter > maxIter")
    labels
  }

  /** Materialized near-dup cluster view. The MinHash-LSH candidate →
    * exact-Jaccard verify → connected-components lineage is the most
    * expensive recurring subplan in the curation suite, and several
    * downstream POLICIES consume the same (id, cluster) relation: the
    * cluster census, canonical retention ([[keepBestPerCluster]]), the
    * dedup yield report, and the leakage-safe split
    * ([[leakageSafeSplit]]). Re-deriving the lineage per consumer
    * measured 2.5–2.7× at the 10×-data rehearsal; this builds it ONCE
    * per (session, corpus key) and localCheckpoints — the same MV
    * pattern the engine applies to rollups, sketches, components and
    * IVF (at production scale: a persisted cluster table maintained
    * alongside the corpus, with [[graft.ops.Incremental]]-style deltas).
    * Keyed by the owning SparkContext's start epoch so a restarted
    * session rebuilds instead of dereferencing dead checkpoint blocks;
    * the checkpointed relation is (id, cluster) for CLUSTERED docs only
    * — far smaller than the corpus. */
  private val clusterMvCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), DataFrame]()

  def clusterMV(docs: DataFrame, corpusKey: String, idCol: String,
                textCol: String, threshold: Double = 0.8,
                numPerm: Int = 64, bands: Int = 32): DataFrame =
    clusterMvCache.computeIfAbsent(
      (s"$corpusKey|$idCol|$textCol|$threshold|$numPerm|$bands",
        docs.sparkSession.sparkContext.startTime), _ => {
        val pairs = jaccardVerify(
          minhashCandidatePairs(docs, idCol, textCol, numPerm, bands),
          docs, idCol, textCol)
          .filter(col("jaccard") >= threshold)
          .select("id_a", "id_b")
        nearDupClusters(pairs).localCheckpoint()
      })

  /** Canonical-document retention: given near-dup cluster labels
    * ([[nearDupClusters]] output: id, cluster) and a numeric quality
    * score, keep the BEST-scoring document of every cluster (ties →
    * smallest id); documents in no cluster survive as singletons. This is
    * the policy that turns a dedup clustering into an actual corpus
    * reduction — "drop duplicates, keep the best copy" rather than the
    * arbitrary min-id survivor. One `min_by` aggregation over the
    * labeled corpus: map-side combinable, a single shuffle on the
    * cluster label. */
  def keepBestPerCluster(docs: DataFrame, clusters: DataFrame,
                         idCol: String, scoreCol: String): DataFrame = {
    val cols = docs.columns
    val labeled = docs
      .join(clusters.select(col("id").as(idCol), col("cluster")), Seq(idCol), "left")
      .withColumn("_cl", coalesce(col("cluster"), col(idCol)))
    labeled.groupBy("_cl")
      .agg(min_by(struct(cols.map(col): _*),
        struct((-col(scoreCol)).as("ns"), col(idCol).as("i"))).as("_row"))
      .select(col("_row.*"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents MUST
    * land in the same split — a train/test straddle leaks eval content
    * into training verbatim-ish, the contamination every pretraining
    * pipeline screens for. The split hashes the dedup-CLUSTER label (min
    * reachable id) instead of the document id; unclustered documents hash
    * their own id, so the assignment stays a pure, layout-invariant
    * function of the data and reduces to [[TextAnalysis.trainSplit]] on a
    * dup-free corpus. One left join on the (tiny) cluster table, then the
    * shuffle-free hash-bucket filter. */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame, idCol: String,
                      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs
      .join(clusters.select(col("id").as(idCol), col("cluster")), Seq(idCol), "left")
      .withColumn("split", TextAnalysis.trainSplit(
        coalesce(col("cluster"), col(idCol)), trainPct, valPct))
      .drop("cluster")

  /** Cross-snapshot dedup: incoming documents that near-duplicate ANY
    * document of a REFERENCE corpus (the previous crawl/snapshot) — the
    * incremental-ingest counterpart of [[minhashNearDupPairs]]. Candidate
    * generation is the same banded-LSH equi-join (incoming bands join
    * reference bands on (band, bucket) — never incoming × reference), then
    * exact Jaccard verification of the candidate pairs only.
    *
    * @return one row per CONTAMINATED incoming id: (idCol, n_ref_matches,
    *         max_jaccard) — anti-join incoming against this to keep the
    *         survivors. */
  def againstReference(incoming: DataFrame, reference: DataFrame,
                       idCol: String, textCol: String,
                       threshold: Double = 0.8,
                       numPerm: Int = 64, bands: Int = 32): DataFrame =
    crossNearDupPairs(incoming, reference, idCol, textCol, threshold,
        numPerm, bands)
      .groupBy(col("inc_id").as(idCol))
      .agg(count(lit(1)).as("n_ref_matches"),
        round(max(col("jaccard")), 4).as("max_jaccard"))

  /** Banded LSH signature relation (id, band, bucket) — the PERSISTABLE
    * screen-side artifact for cross-corpus dedup: at production scale the
    * accepted corpus's signatures live as a maintained table next to the
    * corpus (the standard MinHash-pipeline shape, Lee et al. 2022), so an
    * incremental screen never re-reads the corpus text. */
  def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
                       numPerm: Int = 64, bands: Int = 32): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    Par.spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        minhashSignature(hashedShingles(col(textCol)), numPerm).as("sig"))
      .select(col("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col("sig"), lit(b * rowsPerBand + 1), lit(rowsPerBand)))): _*)))
      .toDF("id", "band", "bucket")
  }

  /** Hashed shingle sets (id, sh, n) — the verify-side artifact paired
    * with [[bandedSignatures]]. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.GraftFunctions.known_not_null
    Par.spread(df.select(col(idCol), col(textCol)))
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        known_not_null(hashedShingles(col(textCol))).as("sh"))
      .withColumn("n", known_not_null(size(col("sh"))))
  }

  /** Once-per-(session, corpus) materialization of a corpus's screen
    * artifacts — (bandedSignatures, shingleSets), both localCheckpointed.
    * The session-cache stand-in for the production persisted signature
    * table; same keying/lifecycle as [[clusterMV]]. */
  private val screenMvCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), (DataFrame, DataFrame)]()

  def screenMV(docs: DataFrame, corpusKey: String, idCol: String,
               textCol: String, numPerm: Int = 64,
               bands: Int = 32): (DataFrame, DataFrame) =
    screenMvCache.computeIfAbsent(
      (s"$corpusKey|$idCol|$textCol|$numPerm|$bands",
        docs.sparkSession.sparkContext.startTime), _ =>
        (bandedSignatures(docs, idCol, textCol, numPerm, bands).localCheckpoint(),
          shingleSets(docs, idCol, textCol).localCheckpoint()))

  /** Verified near-dup pairs BETWEEN two corpora — the pair-level
    * primitive under [[againstReference]] (contamination report) and
    * [[clusterAppend]] (incremental cluster-MV fold). Candidates come
    * from the banded-LSH (band, bucket) equi-join of the two corpora's
    * signatures (never incoming × reference), then exact Jaccard verifies
    * candidates only. With `referenceScreen` (a [[screenMV]] pair) the
    * reference corpus's TEXT is never touched — both its bands and its
    * shingle sets come from the persisted artifacts, so the whole screen
    * is incoming-sized. Returns (inc_id, ref_id, jaccard ≥ threshold). */
  def crossNearDupPairs(incoming: DataFrame, reference: DataFrame,
                        idCol: String, textCol: String,
                        threshold: Double = 0.8,
                        numPerm: Int = 64, bands: Int = 32,
                        referenceScreen: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    val incBanded = bandedSignatures(incoming, idCol, textCol, numPerm, bands)
      .toDF("inc_id", "band", "bucket")
    val refBanded = referenceScreen.map(_._1)
      .getOrElse(bandedSignatures(reference, idCol, textCol, numPerm, bands))
      .toDF("ref_id", "band", "bucket")
    val cands = incBanded.join(refBanded, Seq("band", "bucket"))
      .select(col("inc_id"), col("ref_id"))
      .distinct()
    val incSh = shingleSets(incoming, idCol, textCol).toDF("inc_id", "sh_i", "n_i")
    val refSh = referenceScreen.map(_._2)
      .getOrElse(shingleSets(reference, idCol, textCol))
      .toDF("ref_id", "sh_r", "n_r")
    cands
      .join(incSh, "inc_id")
      .join(refSh, "ref_id")
      .withColumn("common", size(array_intersect(col("sh_i"), col("sh_r"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_i") + col("n_r") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("inc_id", "ref_id", "jaccard")
  }

  /** Incremental cluster-MV maintenance: fold a DELTA of documents into
    * an existing (id, cluster) near-dup MV — the production form the MV
    * pattern ([[clusterMV]]) names — WITHOUT re-traversing the accepted
    * corpus. New edges come from two Δ-driven screens: verified pairs
    * WITHIN the delta ([[minhashCandidatePairs]] + [[jaccardVerify]] over
    * the delta only) and verified delta × base pairs
    * ([[crossNearDupPairs]]: banded-LSH equi-join — with a `baseScreen`
    * ([[screenMV]]: the persisted signature/shingle artifacts) the base
    * TEXT is never touched at all; without one it is scanned once for
    * signatures. Base-internal pairs are never re-derived and base
    * components never re-run either way). The fold is
    * [[Graph.incrementalComponents]]: base endpoints lift to their MV
    * label, the Δ-sized label graph contracts, only merged clusters
    * relabel.
    *
    * EXACTLY equals the full recompute (near-dup clusters over base ∪
    * delta): signatures are doc-local, so the full verified pair set
    * partitions into base-internal (already folded into the MV),
    * delta-internal, and cross pairs — the two screens produce precisely
    * the last two, and min-label components compose over edge unions.
    * Cost is Δ-sized: |delta| signatures, bucket joins keyed by the
    * delta's buckets, and a label-graph contraction. */
  def clusterAppend(baseMv: DataFrame, baseDocs: DataFrame,
                    deltaDocs: DataFrame, idCol: String, textCol: String,
                    threshold: Double = 0.8, numPerm: Int = 64,
                    bands: Int = 32,
                    baseScreen: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    val deltaPairs = jaccardVerify(
        minhashCandidatePairs(deltaDocs, idCol, textCol, numPerm, bands),
        deltaDocs, idCol, textCol)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b")
    val crossPairs = crossNearDupPairs(deltaDocs, baseDocs, idCol, textCol,
        threshold, numPerm, bands, referenceScreen = baseScreen)
      .select(col("inc_id").as("id_a"), col("ref_id").as("id_b"))
    Graph.incrementalComponents(baseMv, "id", "cluster",
        deltaPairs.unionByName(crossPairs), "id_a", "id_b")
      .select(col("id"), col("l").as("cluster"))
  }

  /** Embedding near-dup: cosine ≥ threshold pairs. Exact within-bucket via
    * sign-LSH (see [[Similarity.hyperplaneBucket]]) to avoid n². */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 12): DataFrame = {
    // known_not_null on the derived norm/bucket: without it the inferred
    // join-key/filter isnotnull checks are pushed below this projection and
    // re-evaluate the full vector expressions once per row in a Filter
    // (observed in the physical plan: 2× the per-row math)
    import graft.functions.GraftFunctions.known_not_null
    // compute-bound head stage (norm + sign-LSH planes per vector, twice —
    // both join sides): spread across cores first, like every other
    // signature stage, so parallelism never depends on the scan layout
    val e = Par.spread(df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)
      .withColumn("nrm", known_not_null(Similarity.l2norm(col("v"))))
      .withColumn("bucket", known_not_null(Similarity.hyperplaneBucket(col("v"), planes)))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}

/** The stage plan-bodies of [[Dedup.cosinePairsTf]], factored out so
  * diagnostic tools (graft.tools.CosProbe) time the IDENTICAL DataFrame
  * plans the operator runs — a copied stage is a formula waiting to
  * drift. Contract comments live on the operator; these are its pieces.
  */
private[graft] object CosineTfStages {
  import org.apache.spark.sql.functions._

  /** Hashed-gram (term, doc, tf) table — one rolling-hash pass, codegen
    * (the string-shingle form is O(tokens²)/doc). */
  def tf(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Par.spread(df.select(col(idCol), col(textCol)))
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(graft.functions.GraftFunctions.shingle_hash_list(
          TextAnalysis.tokens(col(textCol)), n)).as("t"))
      .groupBy("t", "id").agg(count(lit(1)).as("tf"))

  /** One shuffle on the gram builds df-capped postings buckets of
    * (id, tf) structs, sorted by id for the i<j pair lambda. */
  def buckets(tf: DataFrame, maxDf: Long): DataFrame =
    tf.groupBy("t")
      .agg(sort_array(collect_list(struct(col("id"), col("tf")))).as("ps"))
      .filter(size(col("ps")) <= maxDf)

  /** Capped-universe squared norm per doc — INCLUDES singleton buckets
    * (a df-1 gram contributes to ‖a‖² though it pairs with nothing). */
  def norms(buckets: DataFrame): DataFrame =
    buckets.select(explode(col("ps")).as("p"))
      .groupBy(col("p.id").as("id"))
      .agg(sum(col("p.tf") * col("p.tf")).as("nsq"))

  /** Per-pair dot products from the positional i<j lambda — each
    * unordered pair exactly once, no postings self-join. Pair rows are
    * the operator's real currency: Σ df² over the capped vocab. */
  def dots(buckets: DataFrame): DataFrame =
    buckets.filter(size(col("ps")) >= 2).select(explode(expr(
        """flatten(transform(sequence(2, size(ps)), j ->
          |  transform(slice(ps, 1, j - 1), x -> named_struct(
          |    'id_a', x.id, 'id_b', element_at(ps, j).id,
          |    'c', x.tf * element_at(ps, j).tf))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.c"))
      .groupBy("id_a", "id_b").agg(sum("c").as("dot"))

  /** cos² in 1e-12 fixed point with DECIMAL(38,0) intermediates. The
    * norm joins carry the doc-sized relation onto the far larger pair
    * relation under the caller's [[Dedup.normJoinHint]] pick: broadcast
    * while norms fit, SHUFFLE_HASH beyond — never the sort-merge
    * default, which sorts the Σdf² pair relation twice (measured at the
    * 100× rehearsal: 464 s of pair-table sort vs pair-scan time —
    * README). */
  def score(dots: DataFrame, norms: DataFrame,
            hint: Option[String] = Some("broadcast")): DataFrame =
    dots
      .join(Dedup.maybeHint(
        norms.select(col("id").as("id_a"), col("nsq").as("nsq_a")), hint), "id_a")
      .join(Dedup.maybeHint(
        norms.select(col("id").as("id_b"), col("nsq").as("nsq_b")), hint), "id_b")
      .withColumn("cos2_fp", expr(
        """(cast(dot as decimal(38,0)) * cast(dot as decimal(38,0))
          | * 1000000000000L)
          | div (cast(nsq_a as decimal(38,0)) * nsq_b)""".stripMargin))
}
