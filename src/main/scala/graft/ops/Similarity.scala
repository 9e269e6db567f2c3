package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, as a 100 TB design demands:
  *  - brute-force cosine top-k: correct baseline; the query side is small
  *    and BROADCAST, so the corpus is never shuffled — one scan, no n²
  *    exchange;
  *  - sign-LSH (random hyperplanes): corpus bucketed by signature;
  *    candidate generation joins bucket-locally (shuffle on bucket id, not
  *    pairwise), then exact re-rank inside buckets. This is the scale path:
  *    bucket count grows with `planes`, keeping per-bucket work bounded.
  *
  * All arithmetic in double via built-in higher-order functions (zip_with /
  * aggregate) — codegen'd, left-to-right summation, bit-reproducible.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Symmetric per-vector int8 quantization: scale = 127/max|x|, q_i =
    * round(x_i·scale). 4× smaller than float32 at ~0.4% reconstruction
    * error — the standard storage/bandwidth lever for embedding corpora
    * (a 100 TB float corpus becomes 25 TB). All built-in higher-order
    * functions: codegen'd, shuffle-free, oracle-reproducible. */
  def quantizeInt8(v: Column): Column = {
    val scale = quantScale(v)
    transform(v, x => round(x * scale).cast("tinyint"))
  }

  /** The quantization scale for [[quantizeInt8]] (store alongside q to
    * dequantize: x ≈ q/scale). 0 for the all-zero vector. */
  def quantScale(v: Column): Column = {
    val mabs = array_max(transform(v, x => abs(x)))
    when(mabs > 0, lit(127.0) / mabs).otherwise(lit(0.0))
  }

  /** Sign-LSH bucket id: one bit per hyperplane = sign of <v, r_p>.
    * One custom-Expression pass ([[graft.functions.HyperplaneSig]]) —
    * plane components derived by hash-mixing (plane, dim), so no plane
    * matrix is stored or broadcast. */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    graft.functions.GraftFunctions.hyperplane_sig(v, planes)

  /** Broadcast-safe query-set bound for [[bruteForceTopK]]: above this the
    * scan cost |corpus|×|queries| is quadratic with corpus size whenever
    * the query set is a corpus sample, and the query side stops fitting a
    * broadcast. 64k rows × a few-hundred-dim double vector ≈ tens of MB —
    * the edge of sane broadcast territory. */
  val BruteForceMaxQueryRows: Int = 65536

  /** Shared admission gate for every broadcast-query scan entry point
    * ([[bruteForceTopK]], [[int8TopK]], [[binaryTopK]], [[pqTopK]],
    * [[mmrRerank]]): each scans |corpus| × |queries| pairs with the query
    * relation broadcast, so the cost is quadratic whenever the query set
    * is a corpus sample and the broadcast stops fitting past
    * [[BruteForceMaxQueryRows]]. Query sets above `maxQueryRows` are
    * refused unless the caller explicitly opts in. The size probe is a
    * `limit(bound+1).count()` — it never scans more than bound+1 query
    * rows regardless of corpus size. */
  private[graft] def gateQuerySet(queries: DataFrame, api: String,
                                  maxQueryRows: Int,
                                  acceptQuadraticCost: Boolean): Unit = {
    if (!acceptQuadraticCost) {
      val n = queries.limit(maxQueryRows + 1).count()
      require(n <= maxQueryRows,
        s"$api query set exceeds $maxQueryRows rows — the scan is " +
          "|corpus| x |queries| and the query side must broadcast. Use " +
          "lshTopK/ivfTopK (top-k) or Dedup.embeddingNearDups (threshold " +
          "pairs) at scale, or opt in with acceptQuadraticCost = true.")
    }
  }

  /** Brute-force cosine top-k: every query (small, broadcast) against the
    * whole corpus. Returns (qid, id, rank, sim). Deterministic tiebreak on
    * id.
    *
    * SCALE GATE: this is the exact BASELINE, not the scale path — work is
    * |corpus| × |queries|. Query sets larger than `maxQueryRows`
    * (default [[BruteForceMaxQueryRows]]) are refused unless the caller
    * passes `acceptQuadraticCost = true`; corpus-scale workloads belong on
    * [[lshTopK]] / [[ivfTopK]] (top-k) or
    * [[Dedup.embeddingNearDups]] (threshold pairs). The size probe is a
    * `limit(bound+1).count()` — it never scans more than bound+1 query
    * rows.
    *
    * Top-k selection is a map-side-combinable bounded-heap aggregate
    * ([[graft.functions.TopKByScore]]), NOT a row_number window: the
    * window form shuffles every scored (corpus × queries) row to the
    * reducers; the aggregate ships ≤ k candidates per (partition, query)
    * across the exchange — the difference between shuffling the corpus
    * and shuffling kilobytes at 100 TB. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, qidCol: String, qvecCol: String,
                     k: Int = 10,
                     maxQueryRows: Int = BruteForceMaxQueryRows,
                     acceptQuadraticCost: Boolean = false): DataFrame = {
    gateQuerySet(queries, "bruteForceTopK", maxQueryRows, acceptQuadraticCost)
    val c = Par.spread(corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")))
      .withColumn("nrm", l2norm(col("v")))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("qnrm", l2norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    topKPerGroup(scored, "qid", "sim", "id", k)
  }

  /** Int8 scalar-quantized (SQ8) top-k over a [[graft.Tables.embeddingsInt8]]
    * packed layout: ranks by QUANTIZED cosine — an exact integer dot
    * product of the int8 codes ([[graft.functions.DotI8]], straight off
    * the bytes) normalized by the exact integer code norms. The scan
    * reads 1 byte/dimension (8× fewer raw vector bytes than
    * `array<double>`); every input to the ranking is an integer, so the
    * result is bit-stable and the DuckDB oracle replays the whole path —
    * quantization, dot, norms, ranks — to an exact hash match.
    * Deterministic ties: (sim desc, id asc). At 100 TB this is the
    * first-stage scan format; compose with an exact re-rank of the
    * shortlist (as [[binaryTopK]] does for 1-bit codes) when the final
    * ranking must be full-precision. */
  def int8TopK(packedCorpus: DataFrame, packedQueries: DataFrame,
               idCol: String, codeCol: String, qidCol: String,
               qcodeCol: String, k: Int = 10,
               maxQueryRows: Int = BruteForceMaxQueryRows,
               acceptQuadraticCost: Boolean = false): DataFrame = {
    import graft.functions.GraftFunctions.{dot_i8, normsq_i8}
    gateQuerySet(packedQueries, "int8TopK", maxQueryRows, acceptQuadraticCost)
    val c = Par.spread(packedCorpus.select(col(idCol).as("id"), col(codeCol).as("code")))
      .filter(col("code").isNotNull)
      .withColumn("nsq", normsq_i8(col("code")))
    val q = packedQueries.select(col(qidCol).as("qid"), col(qcodeCol).as("qcode"))
      .filter(col("qcode").isNotNull)
      .withColumn("qnsq", normsq_i8(col("qcode")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      // exact long dot / sqrt(exact long product): both engines evaluate
      // the same two integers through the same IEEE ops, so sim is
      // bit-identical (zero-norm codes excluded — a zero vector has no
      // cosine direction in the full-precision baseline either)
      .filter(col("nsq") > 0 && col("qnsq") > 0)
      .withColumn("sim",
        dot_i8(col("code"), col("qcode")).cast("double") /
          sqrt((col("nsq") * col("qnsq")).cast("double")))
    topKPerGroup(scored, "qid", "sim", "id", k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nlist` cells; each query probes its `nProbe` nearest
    * centroids and exact-searches only those cells. The learned-centroid
    * counterpart to [[lshTopK]]: recall degrades gracefully with nProbe
    * while the scanned fraction is ~nProbe/nlist — at 100 TB the cell
    * assignment is one pass + one shuffle on cell id, and centroids are
    * tiny driver-side state (nlist × dim doubles).
    *
    * Determinism: the quantizer is LAYOUT-INVARIANT. It trains on the
    * `trainSample` corpus rows with globally-smallest `(md5(id), id)` — a
    * distributed top-N (map-side partial sort, bounded driver merge) whose
    * result set is a pure function of the data, not its partitioning —
    * then runs Lloyd iterations on the driver over that fixed-order
    * sample. Training the coarse quantizer on a bounded sample is also the
    * 100 TB design (a full-corpus fit costs `iters` extra full passes for
    * cells that only need to be rough — recall is probe-bounded, not
    * centroid-quality-bounded). Cell assignment is a per-row argmin
    * against the broadcast centroid literal: fixed evaluation order, no
    * shuffle, codegen'd — so the full result is bit-identical across
    * parallelism layouts. The sample hash is md5 (hex-string order ==
    * numeric order) rather than xxhash64 so an external engine can
    * reproduce the ENTIRE pipeline — sample, Lloyd folds, assignment,
    * probes, ranks — bit-for-bit: the DuckDB oracle does exactly that
    * with explicitly-sequential list_reduce folds. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qidCol: String, qvecCol: String,
              k: Int = 10, nlist: Int = 16, nProbe: Int = 4,
              trainSample: Int = 4096): DataFrame = {
    // null embeddings carry no geometry: drop them from corpus, sample and
    // queries alike (a null row in the sample would NPE the driver Lloyd;
    // outside it, a null vector would clamp into cell 0 with null
    // distances). Mirrored in the oracle SQL.
    val c = Par.spread(corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)

    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"), col(idCol).as("id"))
      .filter(col("v").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(trainSample)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val centers = lloyd(sample, nlist, iters = 5)

    // Per-row nearest-centroid assignment against the centroid literal:
    // distances evaluated left-to-right over a fixed center order, ties
    // broken by the first (lowest-cell) occurrence via array_position.
    // greatest(…, 0): an all-NaN distance row (NaN vector component) makes
    // array_position return 0 → cell would be -1 and the row would silently
    // vanish from every probe; clamping to cell 0 matches the driver-side
    // first-wins loop and the SQL oracle's ORDER BY d2, cell.
    val ctLit = typedlit(centers.map(_.toSeq).toSeq)
    val d2s = transform(ctLit, ct => aggregate(
      zip_with(col("v"), ct, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
    val assigned = c
      .withColumn("d2s", d2s)
      .withColumn("cell",
        greatest(array_position(col("d2s"), array_min(col("d2s"))) - 1, lit(0L)).cast("int"))
      .select(col("id"), col("v"), col("cell"))

    // Probe assignment is fully distributed: the only driver-side state is
    // the centroid table itself (nlist × dim doubles), which becomes a
    // broadcast dimension. Each query row ranks the nlist centroids by
    // exact L2 and keeps its nProbe nearest — |Q| × nlist intermediate
    // rows, shuffled once on qid for the rank window. No collect, no qid
    // type restriction: a real query WORKLOAD (millions of rows) flows
    // through the same plan.
    val spark = corpus.sparkSession
    import spark.implicits._
    val centersDf = centers.zipWithIndex
      .map { case (ct, i) => (i, ct) }.toSeq.toDF("cell", "ct")
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
    val probeDf = q.crossJoin(broadcast(centersDf))
      .withColumn("d2", aggregate(
        zip_with(col("qv"), col("ct"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("rk") <= math.min(nProbe, centers.length))
      .select(col("qid"), col("cell"), col("qv"))

    // Query side broadcast by the IVF contract (queries ≪ corpus). For a
    // query set too large to broadcast, drop the hint: the join key `cell`
    // has only nlist distinct values, so rely on AQE skew splitting — or
    // batch the query workload.
    val joined = assigned.join(broadcast(probeDf), Seq("cell"))
    // self-exclusion whenever ids are comparable: equal types directly,
    // integral types through a widening cast (an Int qid must still
    // exclude its own Long corpus id). Non-comparable id spaces skip it —
    // queries not drawn from the corpus have no self to exclude.
    import org.apache.spark.sql.types._
    def integral(t: DataType) = Seq(ByteType, ShortType, IntegerType, LongType).contains(t)
    val idT = assigned.schema("id").dataType
    val qidT = probeDf.schema("qid").dataType
    val excluded =
      if (idT == qidT) joined.filter(col("id") =!= col("qid"))
      else if (integral(idT) && integral(qidT))
        joined.filter(col("id").cast("long") =!= col("qid").cast("long"))
      else joined
    val cands = excluded.withColumn("sim", cosine(col("v"), col("qv")))
    topKPerGroup(cands, "qid", "sim", "id", k)
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid, TPAMI 2011): split
    * each vector into `m` subvectors, learn a `ks`-centroid codebook per
    * subspace (same deterministic hash-sample + driver-Lloyd as
    * [[ivfTopK]]), and store each corpus vector as just `m` codes —
    * 64 dims × 4 bytes becomes 4 bytes, a 64× compression that is the
    * difference between an in-memory index and a disk-bound one at
    * 100 TB. Search is Asymmetric Distance Computation: each query
    * precomputes its m×ks table of exact subspace distances ONCE, then
    * every corpus vector's approximate L2² is m table lookups summed —
    * no per-pair float math over raw vectors.
    *
    * Scale: the corpus is scanned once over its 4-byte codes (never
    * re-shuffled — queries with their distance tables broadcast), top-k
    * per query via the bounded-heap aggregate, so ≤ k candidates per
    * query per partition cross the exchange. Codebooks are m×ks×(dim/m)
    * doubles of driver state — the same bounded-training contract as IVF.
    *
    * Determinism: sample order, per-subspace Lloyd folds, first-wins
    * argmin encoding, and the fixed-length ADC fold are all sequential —
    * bit-identical across layouts, and the DuckDB oracle replays the
    * entire pipeline (4 codebooks trained in SQL) to an exact hash
    * match. Returns (qid, id, rank, adc) with adc = approximate L2². */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, qidCol: String, qvecCol: String,
             k: Int = 10, m: Int = 4, ks: Int = 16,
             trainSample: Int = 4096,
             maxQueryRows: Int = BruteForceMaxQueryRows,
             acceptQuadraticCost: Boolean = false): DataFrame = {
    gateQuerySet(queries, "pqTopK", maxQueryRows, acceptQuadraticCost)
    val c = Par.spread(corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)

    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"), col(idCol).as("id"))
      .filter(col("v").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(trainSample)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m

    val books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)),
        ks, iters = 5).map(_.toSeq).toSeq
    }
    val bookLit = typedlit(books)

    // subspace argmin code, first-wins tiebreak (same clamp rationale as
    // IVF: an all-NaN distance row folds to code 0 instead of vanishing)
    def code(vec: Column, s: Column): Column = {
      val subv = slice(vec, s * sub + 1, lit(sub))
      val d2s = transform(element_at(bookLit, s + 1), ct => aggregate(
        zip_with(subv, ct, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
      greatest(array_position(d2s, array_min(d2s)) - 1, lit(0L))
    }
    val enc = c.select(col("id"),
      transform(sequence(lit(0), lit(m - 1)), s => code(col("v"), s)).as("codes"))

    // per-query ADC lookup table: dtab[s][j] = ‖q_s − book[s][j]‖²
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
    val dtab = transform(sequence(lit(0), lit(m - 1)), s => {
      val subq = slice(col("qv"), s * sub + 1, lit(sub))
      transform(element_at(bookLit, s + 1), ct => aggregate(
        zip_with(subq, ct, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
    })
    val qt = q.select(col("qid"), dtab.as("dtab"))

    val joined = enc.crossJoin(broadcast(qt))
      .filter(col("id").cast("long") =!= col("qid").cast("long"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("dtab"),
          (cd, tab) => element_at(tab, cd.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x))
    // bounded-heap top-k ranks by score DESC: negate so smallest ADC wins
    topKPerGroup(joined.withColumn("nadc", -col("adc")), "qid", "nadc", "id", k)
      .select(col("qid"), col("id"), col("rank"), (-col("sim")).as("adc"))
  }

  /** IVF-PQ composed index — Jégou, Douze & Schmid's IVFADC (TPAMI 2011):
    * the coarse quantizer partitions the corpus into `nlist` cells (same
    * deterministic md5-sample + driver-Lloyd as [[ivfTopK]]); each vector
    * is then stored as its cell id plus the `m` PQ codes of its RESIDUAL
    * v − c(cell). Residual quantization concentrates the codebooks on the
    * within-cell displacement distribution — recovering most of the
    * accuracy plain [[pqTopK]] loses to coarse structure — and is the
    * composition every production ANN engine ships as IVF+PQ. A query
    * probes its `nProbe` nearest cells and builds, PER PROBED CELL, the
    * ADC table of its residual against the codebooks; only the probed
    * cells' postings are scanned, each scored by m table lookups.
    *
    * Scale: assignment + encoding is one broadcast-literal pass
    * (codegen'd, no shuffle); the scan joins postings to the broadcast
    * (qid, cell, dtab) probe relation on cell id; ≤ k candidates per
    * (query, partition) cross the exchange. Index bytes/vector: 4 (cell)
    * + m codes — with nProbe/nlist scan selectivity ON TOP of PQ's 64×
    * compression. Determinism: both trainings replay the md5-ordered
    * sample through sequential Lloyd folds (sample residuals taken
    * against the FINAL coarse centers with the same first-wins argmin
    * the distributed expression applies); codes are first-wins argmins;
    * the ADC fold is fixed-length — the DuckDB oracle replays the whole
    * pipeline (coarse + m residual codebooks trained in SQL) to an exact
    * hash match. Returns (qid, id, rank, adc) with adc = approximate
    * residual L2². */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, qidCol: String, qvecCol: String,
                k: Int = 10, nlist: Int = 16, nProbe: Int = 4,
                m: Int = 4, ks: Int = 16,
                trainSample: Int = 4096): DataFrame = {
    val c = Par.spread(corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)

    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"), col(idCol).as("id"))
      .filter(col("v").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(trainSample)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "IVF-PQ training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val centers = lloyd(sample, nlist, iters = 5)

    // first-wins sample assignment against the FINAL coarse centers
    // (strict-< scan in cell order: ties keep the lower cell, NaN
    // distances never win — the driver mirror of the clamped argmin
    // expression below and the oracle's ORDER BY d2, cell)
    def assignDriver(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.NaN; var i = 0
      while (i < centers.length) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = v(j) - centers(i)(j); d += t * t; j += 1 }
        if (i == 0) bestD = d
        else if (d < bestD || (bestD.isNaN && !d.isNaN)) { bestD = d; best = i }
        i += 1
      }
      best
    }
    val resSample: Array[Array[Double]] = sample.map { v =>
      val ct = centers(assignDriver(v))
      Array.tabulate(dim)(j => v(j) - ct(j))
    }
    val books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      lloyd(resSample.map(v =>
        java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)),
        ks, iters = 5).map(_.toSeq).toSeq
    }
    val bookLit = typedlit(books)
    val ctLit = typedlit(centers.map(_.toSeq).toSeq)

    // corpus: clamped first-wins coarse cell (ivfTopK's expression), the
    // residual against that cell's center, then the m residual PQ codes
    val d2s = transform(ctLit, ct => aggregate(
      zip_with(col("v"), ct, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
    val assigned = c
      .withColumn("d2s", d2s)
      .withColumn("cell",
        greatest(array_position(col("d2s"), array_min(col("d2s"))) - 1, lit(0L)).cast("int"))
      .withColumn("rv", zip_with(col("v"),
        element_at(ctLit, col("cell") + 1), (x, y) => x - y))
    def code(vec: Column, s: Column): Column = {
      val subv = slice(vec, s * sub + 1, lit(sub))
      val dss = transform(element_at(bookLit, s + 1), ct => aggregate(
        zip_with(subv, ct, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
      greatest(array_position(dss, array_min(dss)) - 1, lit(0L))
    }
    val enc = assigned.select(col("id"), col("cell"),
      transform(sequence(lit(0), lit(m - 1)), s => code(col("rv"), s)).as("codes"))

    // queries: nProbe nearest cells, then per (qid, cell) the ADC table
    // of the query RESIDUAL against the codebooks
    val spark = corpus.sparkSession
    import spark.implicits._
    val centersDf = centers.zipWithIndex.map { case (ct, i) => (i, ct) }
      .toSeq.toDF("cell", "ct")
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
    val probeDf = q.crossJoin(broadcast(centersDf))
      .withColumn("d2", aggregate(
        zip_with(col("qv"), col("ct"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("rk") <= math.min(nProbe, centers.length))
      .withColumn("qr", zip_with(col("qv"), col("ct"), (x, y) => x - y))
    val dtab = transform(sequence(lit(0), lit(m - 1)), s => {
      val subq = slice(col("qr"), s * sub + 1, lit(sub))
      transform(element_at(bookLit, s + 1), ct => aggregate(
        zip_with(subq, ct, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
    })
    val qt = probeDf.select(col("qid"), col("cell"), dtab.as("dtab"))

    val joined = enc.join(broadcast(qt), Seq("cell"))
      .filter(col("id").cast("long") =!= col("qid").cast("long"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("dtab"),
          (cd, tab) => element_at(tab, cd.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x))
    topKPerGroup(joined.withColumn("nadc", -col("adc")), "qid", "nadc", "id", k)
      .select(col("qid"), col("id"), col("rank"), (-col("sim")).as("adc"))
  }

  /** Driver-side Lloyd iterations over a fixed-order sample (the sample is
    * bounded by `trainSample`, so this is O(sample × nlist × dim × iters)
    * scalar work — milliseconds). Init = the first `nlist` DISTINCT sample
    * vectors in sample order; empty cells keep their previous center.
    * Deterministic: iteration order is the sample order, accumulation is
    * sequential — no dependence on Spark partitioning anywhere. */
  private[graft] def lloyd(sample: Array[Array[Double]], nlist: Int,
                           iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF training sample is empty")
    val init = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    sample.iterator.takeWhile(_ => init.size < nlist).foreach(v => init += v.toSeq)
    lloydFrom(sample, init.iterator.map(_.toArray).toArray, iters)
  }

  /** Lloyd's iterations from an explicit init (shared by the sample-order
    * init above and the k-means‖ init of [[trainCentersKpar]]). */
  private[graft] def lloydFrom(sample: Array[Array[Double]],
                               init: Array[Array[Double]],
                               iters: Int): Array[Array[Double]] = {
    var centers: Array[Array[Double]] = init
    val kk = centers.length
    val dim = sample.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        val j = nearest(v, centers)
        counts(j) += 1
        var d = 0
        while (d < dim) { sums(j)(d) += v(d); d += 1 }
        i += 1
      }
      centers = Array.tabulate(kk) { j =>
        if (counts(j) == 0L) centers(j)
        else {
          val o = new Array[Double](dim)
          var d = 0
          while (d < dim) { o(d) = sums(j)(d) / counts(j); d += 1 }
          o
        }
      }
      it += 1
    }
    centers
  }

  /** First-wins argmin of squared L2 distance — matches the distributed
    * assignment's array_position(first occurrence) tiebreak. */
  private def nearest(v: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centers.length) {
      val ct = centers(j)
      var d2 = 0.0
      var d = 0
      while (d < v.length) { val t = v(d) - ct(d); d2 += t * t; d += 1 }
      if (d2 < bestD) { bestD = d2; best = j }
      j += 1
    }
    best
  }

  /** Binary (sign-bit) quantization: a dim-d vector becomes ceil(d/32)
    * 32-bit words (big-endian within each word: the fold doubles the
    * accumulator per element, so no shift-by-column — and no 64-bit
    * overflow under ANSI mode). 32× smaller than float32: the memory/
    * bandwidth lever that makes a 100 TB embedding corpus scannable, with
    * Hamming distance as the angular-distance proxy (Charikar 2002 with
    * axis-aligned planes). Pure higher-order built-ins — codegen'd and
    * reproducible by any engine with a list fold. */
  def binarySignature(v: Column): Column =
    transform(sequence(lit(0), ceil(size(v) / lit(32.0)).cast("int") - 1),
      w => aggregate(slice(v, w * 32 + 1, lit(32)),
        lit(0L), (acc, x) => acc * 2 + when(x > 0.0, lit(1L)).otherwise(lit(0L))))

  /** Hamming distance between two [[binarySignature]]s (xor + popcount
    * per word). */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Binary-quantized ANN top-k: stage 1 scans the corpus with the 32×-
    * compressed signatures (per-pair cost: a few xor+popcounts instead of
    * a d-dim dot product) and keeps the `rerank` Hamming-nearest
    * candidates per query via the bounded-heap aggregate; stage 2 exact-
    * cosine re-ranks the candidates only. Same scan shape as the brute
    * force but touching 1/32nd of the bytes — the classic binary
    * pre-filter; recall is governed by `rerank`. Deterministic:
    * (hamming asc, id asc) then (sim desc, id asc). */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, qidCol: String, qvecCol: String,
                 k: Int = 10, rerank: Int = 64,
                 maxQueryRows: Int = BruteForceMaxQueryRows,
                 acceptQuadraticCost: Boolean = false): DataFrame = {
    gateQuerySet(queries, "binaryTopK", maxQueryRows, acceptQuadraticCost)
    val c = Par.spread(corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)
      .withColumn("sig", binarySignature(col("v")))
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qsig", binarySignature(col("qv")))
    val ham = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("nham", -hammingDistance(col("sig"), col("qsig")).cast("double"))
    val cands = topKPerGroup(ham, "qid", "nham", "id", rerank)
      .select("qid", "id")
    val scored = cands
      .join(c.select(col("id"), col("v")), "id")
      .join(broadcast(q.select(col("qid"), col("qv"))), "qid")
      .withColumn("sim", cosine(col("v"), col("qv")))
    topKPerGroup(scored, "qid", "sim", "id", k)
  }

  /** groupKey → top-k rows by (score desc, id asc), exploded with ranks. */
  private[graft] def topKPerGroup(scored: DataFrame, qidCol: String,
                                  simCol: String, idCol: String, k: Int): DataFrame =
    scored
      .groupBy(qidCol)
      .agg(graft.functions.TopKByScore.topk_by_score(
        struct(col(simCol).as("score"), col(idCol).cast("long").as("id")), k).as("top"))
      .select(col(qidCol), posexplode(col("top")))
      .select(col(qidCol), col("col.id").as("id"),
        (col("pos") + 1).cast("long").as("rank"), col("col.score").as("sim"))

  /** LSH-bucketed ANN top-k: candidates share the full signature bucket OR
    * any of `bands` sub-signature bands (multi-probe-ish banding so recall
    * does not collapse as `planes` grows). Exact cosine re-rank inside the
    * candidate set. Returns (qid, id, rank, sim). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qidCol: String, qvecCol: String,
              k: Int = 10, planes: Int = 16, bands: Int = 4): DataFrame = {
    require(planes % bands == 0)
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1

    def banded(df: DataFrame, id: String, vec: String, pfx: String): DataFrame = {
      Par.spread(df.select(col(id).as(s"${pfx}id"), col(vec).cast("array<double>").as(s"${pfx}v")))
        .withColumn(s"${pfx}sig", hyperplaneBucket(col(s"${pfx}v"), planes))
        .select(col(s"${pfx}id"), col(s"${pfx}v"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col(s"${pfx}sig"), b * bandBits).bitwiseAND(lit(mask))): _*)))
        .toDF(s"${pfx}id", s"${pfx}v", "band", "bucket")
    }

    val c = banded(corpus, idCol, vecCol, "")
    val q = banded(queries, qidCol, qvecCol, "q")
    val cands = c.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("v"), col("qv"))
      // a pair can surface from several bands: dedupe on the 2 key longs
      // only (distinct() would hash-compare the 64-dim vectors too)
      .dropDuplicates("qid", "id")
    topKPerGroup(cands.withColumn("sim", cosine(col("v"), col("qv"))),
      "qid", "sim", "id", k)
  }

  /** SemDeDup-style semantic pruning (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding corpus with the same portable k-means coarse
    * quantizer as [[ivfTopK]], then prune WITHIN each cell — an item is
    * dropped when a same-cell neighbor with a SMALLER id has cosine ≥
    * `simThreshold` (min-id survivor, the repo's dedup convention; the
    * paper keeps one item per ε-ball, the tie-break policy is free).
    * Returns per-cell stats (cell, n_members, n_pruned, keep_frac).
    *
    * Scale: cells = max(16, ceil(√n)), so assignment work is n·√n
    * distance evaluations in ONE scan against the broadcast centroid
    * literal, and the within-cell self-join is Σ cell² ≈ n^1.5 cosines
    * — the standard SemDeDup shape (the paper clusters precisely so that
    * pairwise work is per-cell, never corpus²). Both stages shuffle once
    * on the cell key; AQE skew-splits fat cells. Determinism: sample,
    * Lloyd folds, assignment argmin and the cosine fold are all
    * sequential and layout-invariant, so the DuckDB oracle replays the
    * pipeline bit-for-bit (dynamic cell count included). */
  def semanticPrune(corpus: DataFrame, idCol: String, vecCol: String,
                    simThreshold: Double,
                    trainSample: Int = 4096): DataFrame = {
    val c = Par.spread(corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)
    val n = c.count()
    val nlist = math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    val assigned = quantize(corpus, idCol, vecCol, nlist, trainSample)

    val lo = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("va"))
    val hi = assigned.select(col("cell"), col("id").as("id_b"), col("v").as("vb"))
    val prunedIds = lo.join(hi, "cell")
      .where(col("id_a") < col("id_b"))
      .where(cosine(col("va"), col("vb")) >= simThreshold)
      .select(col("cell"), col("id_b").as("id"))
      .distinct()
    assigned.select("cell", "id")
      .join(prunedIds.withColumn("pruned", lit(1L)), Seq("cell", "id"), "left")
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum("pruned"), lit(0L)).as("n_pruned"))
      .select(col("cell"), col("n_members"), col("n_pruned"),
        round((col("n_members") - col("n_pruned")) * lit(1.0) / col("n_members"), 4)
          .as("keep_frac"))
  }

  /** The shared coarse-quantizer front half of [[ivfTopK]] /
    * [[semanticPrune]]: md5-ordered bounded training sample, driver
    * Lloyd, per-row first-wins argmin assignment against the broadcast
    * centroid literal. Returns (id, v, cell). */
  private[graft] def quantize(corpus: DataFrame, idCol: String, vecCol: String,
                              nlist: Int, trainSample: Int): DataFrame =
    assignCells(corpus, idCol, vecCol,
      trainCenters(corpus, idCol, vecCol, nlist, trainSample))

  /** The deterministic coarse-quantizer fit shared by [[quantize]] and
    * [[ivfAppendProfile]]: bounded (md5(id), id)-ordered sample, driver
    * Lloyd. */
  private[graft] def trainCenters(train: DataFrame, idCol: String,
                                  vecCol: String, nlist: Int,
                                  trainSample: Int): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = train
      .select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"), col(idCol).as("id"))
      .filter(col("v").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(trainSample)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    lloyd(sample, nlist, iters = 5)
  }

  /** [[trainCenters]] with the deterministic k-means‖ init of
    * [[kmeansParallelInit]] run DRIVER-SIDE over the same bounded
    * md5-ordered sample (the sample is already on the driver; the init
    * adds O(sample × rounds·l × dim) scalar work, no extra scans).
    * Distance-aware seeding ∝ d² mass instead of hash order — the fix
    * for clumped seeds inflating IVF cell skew; see the measured A/B in
    * the README and KMeansSpec. Deterministic: md5-derived priorities,
    * sequential driver arithmetic, ties to the earlier candidate. */
  private[graft] def trainCentersKpar(train: DataFrame, idCol: String,
                                      vecCol: String, nlist: Int,
                                      trainSample: Int, rounds: Int = 3,
                                      oversample: Int = 0): Array[Array[Double]] = {
    val l = if (oversample > 0) oversample else 2 * nlist
    val rows: Array[(Array[Double], String)] = train
      .select(col(vecCol).cast("array<double>").as("v"),
        md5(col(idCol).cast("string")).as("h"), col(idCol).as("id"))
      .filter(col("v").isNotNull)
      .orderBy(col("h"), col("id"))
      .limit(trainSample)
      .select("v", "h")
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getString(1)))
    require(rows.nonEmpty, "IVF training sample is empty")
    val u: Array[Double] = rows.map(r =>
      new java.math.BigInteger(r._2.substring(0, 16), 16).doubleValue())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var d = 0
      while (d < a.length) { val t = a(d) - b(d); acc += t * t; d += 1 }
      acc
    }
    val cands = scala.collection.mutable.ArrayBuffer[Array[Double]](rows(0)._1)
    for (_ <- 1 to rounds) {
      val scored = rows.indices.iterator.map { i =>
        val md2 = cands.iterator.map(c => d2(rows(i)._1, c)).min
        (i, md2)
      }.filter(_._2 > 0.0).toArray
      val sel = scored.sortBy { case (i, md2) => (u(i) / md2, rows(i)._2) }
        .take(l).map { case (i, _) => rows(i)._1 }
      cands ++= sel
    }
    val w = new Array[Long](cands.length)
    rows.foreach { case (v, _) =>
      var best = 0; var bestD = d2(v, cands(0)); var j = 1
      while (j < cands.length) {
        val dd = d2(v, cands(j))
        if (dd < bestD) { best = j; bestD = dd }
        j += 1
      }
      w(best) += 1
    }
    val chosen = scala.collection.mutable.ArrayBuffer[Int](
      w.indices.maxBy(i => (w(i), -i)))
    while (chosen.length < math.min(nlist, cands.length)) {
      var bestI = -1; var bestS = -1.0
      for (i <- cands.indices if !chosen.contains(i)) {
        val md2 = chosen.iterator.map(j => d2(cands(i), cands(j))).min
        val s = w(i).toDouble * md2
        if (s > bestS) { bestS = s; bestI = i }
      }
      // bestI ≥ 0 always: the loop bound keeps an unchosen candidate
      if (bestS <= 0.0) {
        // fewer than nlist distinct weighted candidates: stop early and
        // let lloydFrom run with what exists (mirrors lloyd's behavior
        // when the sample has < nlist distinct vectors)
        return lloydFrom(rows.map(_._1), chosen.iterator.map(cands(_)).toArray, 5)
      }
      chosen += bestI
    }
    lloydFrom(rows.map(_._1), chosen.iterator.map(cands(_)).toArray, iters = 5)
  }

  /** Per-row first-wins argmin assignment against a broadcast centroid
    * literal. Returns (id, v, cell). */
  private[graft] def assignCells(df: DataFrame, idCol: String, vecCol: String,
                                 centers: Array[Array[Double]]): DataFrame = {
    val c = Par.spread(df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")))
      .filter(col("v").isNotNull)
    val ctLit = typedlit(centers.map(_.toSeq).toSeq)
    val d2s = transform(ctLit, ct => aggregate(
      zip_with(col("v"), ct, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
    c.withColumn("d2s", d2s)
      .withColumn("cell",
        greatest(array_position(col("d2s"), array_min(col("d2s"))) - 1, lit(0L)).cast("int"))
      .select(col("id"), col("v"), col("cell"))
  }

  /** INCREMENTAL IVF-index maintenance — the MV-delta pattern
    * ([[graft.ops.Incremental]]) applied to ANN state. An IVF index at
    * 100 TB is not retrained per arrival batch: the coarse quantizer is
    * FROZEN (that is the append contract — recall drifts only as the
    * data distribution does, which [[ivfCellProfile]] monitors), each
    * delta batch is assigned against the frozen broadcast centroids in
    * one Δ-sized pass, and the per-cell population MV merges by
    * addition — O(|MV| + |Δ|), the base corpus never re-scanned.
    * Returns per cell: (cell, n_base, n_new, n_total, share) — the
    * post-append balance report; a hot cell says re-shard that cell (or
    * retrain) BEFORE tail latency degrades. Merging two ≤nlist-row
    * aggregates makes the join and the share window free. */
  def ivfAppendProfile(base: DataFrame, delta: DataFrame, idCol: String,
                       vecCol: String, nlist: Int = 16,
                       trainSample: Int = 4096): DataFrame = {
    val centers = trainCenters(base, idCol, vecCol, nlist, trainSample)
    val mv = assignCells(base, idCol, vecCol, centers)
      .groupBy("cell").agg(count(lit(1)).as("n_base"))
    val appended = assignCells(delta, idCol, vecCol, centers)
      .groupBy("cell").agg(count(lit(1)).as("n_new"))
    mv.join(appended, Seq("cell"), "full")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_total", col("n_base") + col("n_new"))
      .withColumn("share", round(col("n_total") * lit(1.0) /
        sum("n_total").over(Window.partitionBy()), 4))
      .orderBy("cell")
  }

  /** IVF index-balance report: per-cell population and share under the
    * same quantizer [[ivfTopK]] searches with. The operational knob this
    * feeds is `nlist`/`nProbe` sizing — a hot cell (share ≫ 1/nlist)
    * means probes that hit it scan far more than corpus·nProbe/nlist, and
    * at 100 TB cell skew, not mean cell size, sets the tail latency. One
    * scan + one nlist-row aggregate; the 16-row result makes the
    * single-partition share window free. */
  def ivfCellProfile(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int = 16, trainSample: Int = 4096): DataFrame = {
    quantize(corpus, idCol, vecCol, nlist, trainSample)
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
      .withColumn("share", round(col("n_members") * lit(1.0) /
        sum("n_members").over(Window.partitionBy()), 4))
      .select("cell", "n_members", "share")
      .orderBy("cell")
  }

  /** Distributed FULL-CORPUS Lloyd's k-means — the scale path where the
    * bounded-sample driver fit of [[ivfTopK]] is not enough (the sample
    * bounds centroid QUALITY; when the clustering itself is the product —
    * corpus partitioning for curriculum mixing, SemDeDup-style cells,
    * per-cluster data budgets — the means must be over all rows). Each
    * round is one scan: per-row argmin against the k broadcast centroids,
    * then a k-row aggregate with map-side partial combine, so only
    * k×(dim+2) values per partition cross the exchange and the driver
    * holds exactly one k×(dim+2) state — above `localMaxRows`, no
    * per-row collect at any scale (below it, a driver loop runs the
    * identical arithmetic; see the gate comment in the body).
    *
    * EXACT ARITHMETIC, hence layout-invariant and externally replayable
    * (the same fixed-point-integer discipline as the PageRank/k-core
    * fixed points in [[Graph]]): vectors are quantized once to integer
    * coordinates `floor(x·2^scaleBits + 0.5)` and a centroid is carried
    * as its exact integer dimension-sums plus count, never a rounded
    * mean. Distributed reductions are integer sums — associative,
    * commutative, order-free — while every double computation (the
    * argmin distance `Σ (x − s/n)²`, the report's norm and mse) is
    * row-local with a fixed fold order, so results are bit-identical
    * across partitionings AND in the DuckDB oracle, which replays
    * init + every round relationally on the same integers.
    *
    * Convergence: the state is exact, so "assignments stopped changing"
    * is the decidable test `state_{r} == state_{r-1}` (longs, no
    * epsilon) — detected on the driver from the k-row aggregate, no
    * extra job. `maxIters` caps the rounds; because a converged state is
    * a true fixed point, an oracle that unrolls exactly `maxIters`
    * rounds reproduces the detected-stop result whether the stop fired
    * early or the cap bound it — the contract needs no empirical round
    * count. Mean-squared distortion is reported through the exact
    * identity Σ|x−m|² = Σ|x|² − |s|²/n, keeping the only corpus-sized
    * reduction (Σ|x|², a long) exact; ANSI mode turns a hypothetical
    * overflow into an error, never a silent wrap (switch `ss` to
    * DECIMAL past ~2^17 rows × dim 64 at this scale).
    *
    * Init: the k DISTINCT quantized vectors smallest in global
    * `(md5(id), id)` order — a distributed bounded top-N like the IVF
    * sample, a pure function of the data. Returns one row per NONEMPTY
    * cell of the final assignment: (cell, n, round(norm,4),
    * round(mse,6)), ordered by cell. Empty cells carry their previous
    * centroid between rounds (mirrored by the oracle's COALESCE) but do
    * not report. */
  /** Fitted k-means state: the quantized corpus (persisted; callers
    * unpersist), the exact integer state that drove the FINAL assignment
    * round, and that round's per-cell aggregate. */
  private[graft] case class KmFit(q: DataFrame, dim: Int,
                                  assignState: Array[(Array[Long], Long)],
                                  lastAgg: Map[Int, (Long, Array[Long], Long)])

  def kmeansReport(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, maxIters: Int = 25, detectConverged: Boolean = true,
                   scaleBits: Int = 20, initSample: Int = 512,
                   localMaxRows: Long = 65536,
                   parallelInit: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val S = (1L << scaleBits).toDouble
    val fit = kmeansFit(corpus, idCol, vecCol, k, maxIters, detectConverged,
      scaleBits, initSample, localMaxRows, parallelInit)
    fit.q.unpersist(blocking = false)
    val dim = fit.dim

    // k-row report on the driver (bounded): double math mirrors the
    // oracle's fold order — ascending dimension, left-associative.
    import spark.implicits._
    val report = fit.lastAgg.toSeq.sortBy(_._1).map { case (cell, (n, s, ss)) =>
      var nrm = 0.0
      var ssq = 0.0
      var d = 0
      while (d < dim) {
        val m = s(d).toDouble / n.toDouble
        nrm += m * m
        ssq += s(d).toDouble * s(d).toDouble
        d += 1
      }
      (cell, n, math.sqrt(nrm) / S,
        (ss.toDouble - ssq / n.toDouble) / (n.toDouble * S * S))
    }
    report.toDF("cell", "n", "norm_raw", "mse_raw")
      .select(col("cell"), col("n"), round(col("norm_raw"), 4).as("norm"),
        round(col("mse_raw"), 6).as("mse"))
      .orderBy("cell")
  }

  /** Per-row cell assignment at the same detected fixed point as
    * [[kmeansReport]]: (id, cell), computed as ONE distributed argmin
    * pass against the final broadcast state — identical under the
    * small-corpus gate (the gate only accelerates the iterations; the
    * assignment expression and the exact integer state are the same
    * either way). This is the handle downstream curation composes on —
    * see `emb_cluster_sample` (per-cell bounded min-hash picks). */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, maxIters: Int = 25, detectConverged: Boolean = true,
                   scaleBits: Int = 20, initSample: Int = 512,
                   localMaxRows: Long = 65536): DataFrame = {
    val fit = kmeansFit(corpus, idCol, vecCol, k, maxIters, detectConverged,
      scaleBits, initSample, localMaxRows)
    // Materialize the assignment BEFORE dropping fit.q's persist: the
    // returned frame is lazy, so an unpersist-then-evaluate order would
    // recompute the quantization scan from the source corpus for the one
    // pass that reads it last — an extra full corpus scan at scale. The
    // checkpointed relation is just (id, cell): two narrow columns.
    val out = fit.q.withColumn("cell", kmAssignCellCol(fit.assignState))
      .select(col("id"), col("cell"))
      .localCheckpoint(true)
    fit.q.unpersist(blocking = false)
    out
  }

  /** Argmin cell against an exact integer centroid state (sums, n):
    * row-local double distances in a fixed ascending-dimension fold,
    * first-wins ties — deterministic across layouts and engines. */
  private def kmAssignCellCol(st: Array[(Array[Long], Long)]): Column = {
    val sLit = typedlit(st.map(_._1.toSeq).toSeq)
    val nLit = typedlit(st.map(_._2).toSeq)
    val d2s = transform(sLit, (ct, i) => aggregate(
      zip_with(col("q"), ct, (x, sd) => {
        val d = x.cast("double") -
          sd.cast("double") / element_at(nLit, i + 1).cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x))
    greatest(array_position(d2s, array_min(d2s)) - 1, lit(0L)).cast("int")
  }

  /** Deterministic k-means‖ oversampling init (Bahmani, Moseley, Vattani,
    * Kumar, Vassilvitskii — "Scalable K-Means++", VLDB 2012) over the
    * quantized corpus. The hash-min init is a pure function of the data
    * but distance-blind: on clustered data it can seed every centroid in
    * one region and leave Lloyd's to crawl out (inflating IVF probe
    * tails). k-means‖ seeds ∝ squared-distance mass in O(rounds) scans —
    * here made DETERMINISTIC by replacing the per-point Poisson trials
    * with md5-derived priorities: round r keeps the `l` rows smallest in
    * u(x)/d²(x, C) where u(x) is the row's md5-derived 64-bit uniform
    * (sequential-Poisson / Ohlsson-style weighted sampling; the same
    * uniform-key trick as the Efraimidis–Spirakis sampler used in
    * [[graft.ops.Sampling]], with the πps weight d²). Everything that
    * crosses an exchange is exact: d² is an integer on the quantized
    * coordinates, selection is a bounded top-`l`, candidate weights are
    * exact first-wins assignment counts, and the final recluster is a
    * driver greedy weighted k-center (BigInt scores, ties to the earlier
    * candidate) over ≤ 1 + rounds·l candidates — so the init, like the
    * Lloyd rounds after it, is layout-invariant and replayed relationally
    * by the DuckDB oracle (emb_kmeans_kpar). Cost: rounds+2 bounded-output
    * scans of the persisted quantized corpus. */
  private[graft] def kmeansParallelInit(q: DataFrame, k: Int,
                                        rounds: Int = 3,
                                        oversample: Int = 0): Array[Array[Long]] = {
    val l = if (oversample > 0) oversample else 2 * k
    val withU = q.select(col("id"), col("q"),
        md5(col("id").cast("string")).as("h"))
      .withColumn("u", conv(substring(col("h"), 1, 16), 16, 10).cast("double"))
    def d2Int(c: Seq[Long]): Column = aggregate(
      zip_with(col("q"), typedlit(c), (x, y) => (x - y) * (x - y)),
      lit(0L), (a, x) => a + x)
    def d2MinCol(cands: Seq[Seq[Long]]): Column =
      array_min(transform(typedlit(cands), c => aggregate(
        zip_with(col("q"), c, (x, y) => (x - y) * (x - y)),
        lit(0L), (a, x) => a + x)))
    // seed: the (md5(id), id)-minimum row — the hash-min init's anchor
    val first = withU.orderBy(col("h"), col("id")).limit(1)
      .select("q").collect()(0).getSeq[Long](0).toArray
    val cands = scala.collection.mutable.ArrayBuffer[Array[Long]](first)
    for (_ <- 1 to rounds) {
      val sel = withU
        .withColumn("d2", d2MinCol(cands.map(_.toSeq).toSeq))
        .filter(col("d2") > 0L) // rows on a candidate can't be sampled
        .orderBy((col("u") / col("d2").cast("double")).asc, col("h"), col("id"))
        .limit(l)
        .select("q").collect().map(_.getSeq[Long](0).toArray)
      cands ++= sel // priority order; duplicates get zero weight below
    }
    // exact candidate weights: first-wins argmin assignment counts
    val cLit = typedlit(cands.map(_.toSeq).toSeq)
    val d2s = transform(cLit, c => aggregate(
      zip_with(col("q"), c, (x, y) => (x - y) * (x - y)),
      lit(0L), (a, x) => a + x))
    val w = new Array[Long](cands.length)
    q.select((array_position(d2s, array_min(d2s)) - 1).cast("int").as("ci"))
      .groupBy("ci").agg(count(lit(1)).as("w")).collect()
      .foreach(r => w(r.getInt(0)) = r.getLong(1))
    // driver recluster: greedy weighted k-center, exact BigInt scores
    def d2L(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var d = 0
      while (d < a.length) {
        val t = a(d) - b(d)
        acc = Math.addExact(acc, Math.multiplyExact(t, t)); d += 1
      }
      acc
    }
    val chosen = scala.collection.mutable.ArrayBuffer[Int](
      w.indices.maxBy(i => (w(i), -i))) // max weight, tie: earlier candidate
    while (chosen.length < k) {
      var bestI = -1
      var bestS = BigInt(-1)
      for (i <- cands.indices if !chosen.contains(i)) {
        val md2 = chosen.iterator.map(j => d2L(cands(i), cands(j))).min
        val s = BigInt(w(i)) * BigInt(md2)
        if (s > bestS) { bestS = s; bestI = i }
      }
      require(bestS > 0,
        s"kmeans parallel init: fewer than $k distinct weighted candidates")
      chosen += bestI
    }
    chosen.iterator.map(cands(_)).toArray
  }

  private[graft] def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                               k: Int, maxIters: Int, detectConverged: Boolean,
                               scaleBits: Int, initSample: Int,
                               localMaxRows: Long,
                               parallelInit: Boolean = false): KmFit = {
    require(k > 0 && maxIters > 0)
    val S = (1L << scaleBits).toDouble
    def quant(v: Column): Column =
      transform(v, x => floor(x * S + lit(0.5)).cast("long"))

    // one-scan quantization; per-row |x|^2 is an exact integer fold
    val q = Par.spread(corpus
        .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
        .filter(col("v").isNotNull)
        .select(col("id"), quant(col("v")).as("q")))
      .withColumn("sq", aggregate(transform(col("q"), x => x * x),
        lit(0L), (acc, x) => acc + x))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materializes the cache before round 1; also feeds the small-corpus
    // gate — one extra scan next to maxIters round scans
    val nRows = q.count()

    // deterministic init — either the distance-aware k-means‖ pass over
    // the (already persisted) quantized corpus, or the default: k
    // distinct quantized vectors in (md5(id), id) order
    val init: Array[Array[Long]] =
      if (parallelInit) kmeansParallelInit(q, k)
      else {
        val sampleRows: Array[Array[Long]] = corpus
          .select(col(vecCol).cast("array<double>").as("v"),
            md5(col(idCol).cast("string")).as("h"), col(idCol).as("id"))
          .filter(col("v").isNotNull)
          .orderBy(col("h"), col("id"))
          .limit(initSample)
          .select(quant(col("v")))
          .collect()
          .map(_.getSeq[Long](0).toArray)
        val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Long]]
        sampleRows.foreach(v => seen += v.toSeq)
        seen.iterator.take(k).map(_.toArray).toArray
      }
    require(init.length == k,
      s"kmeans: corpus yields only ${init.length} distinct init vectors, need k=$k")
    val dim = init(0).length

    // state(cell) = (dimension sums, n); init centroid = (vector, 1)
    var state: Array[(Array[Long], Long)] = init.map(v => (v, 1L))
    // state entering the last executed round — what the final assignment
    // (and [[kmeansAssign]]) evaluates against
    var prev: Array[(Array[Long], Long)] = state
    // final-assignment aggregate rows: cell -> (n, sums, ss)
    var lastAgg: Map[Int, (Long, Array[Long], Long)] = Map.empty

    def converged(next: Array[(Array[Long], Long)]): Boolean =
      detectConverged &&
        next.zip(state).forall { case ((s1, n1), (s2, n2)) =>
          n1 == n2 && java.util.Arrays.equals(s1, s2) }

    if (nRows <= localMaxRows) {
      // Small-corpus gate (the pageRankConverged / union-find pattern):
      // maxIters synchronous rounds through the scheduler on a corpus
      // that fits on the driver is pure fixed overhead. The SAME exact
      // Long sums and the SAME double argmin (ascending-dimension
      // left-fold, first-wins ties, overflow-checked like ANSI) run in a
      // driver loop — bit-for-bit the distributed result (spec-proven by
      // forcing localMaxRows = 0). The distributed loop IS the 100 TB
      // path; this removes the per-round scheduler tax when the data
      // says it is safe.
      val rowsQ: Array[(Array[Long], Long)] = q.select("q", "sq").collect()
        .map(r => (r.getSeq[Long](0).toArray, r.getLong(1)))
      def d2Local(x: Array[Long], st: (Array[Long], Long)): Double = {
        val s = st._1; val cn = st._2.toDouble
        var acc = 0.0; var d = 0
        while (d < dim) {
          val diff = x(d).toDouble - s(d).toDouble / cn
          acc += diff * diff; d += 1
        }
        acc
      }
      var r = 0
      var done = false
      while (r < maxIters && !done) {
        prev = state
        val cnt = new Array[Long](k)
        val ss = new Array[Long](k)
        val sums = Array.fill(k)(new Array[Long](dim))
        rowsQ.foreach { case (x, sq) =>
          var best = 0; var bestD = d2Local(x, state(0))
          var c = 1
          while (c < k) {
            val d = d2Local(x, state(c))
            if (d < bestD) { best = c; bestD = d }
            c += 1
          }
          cnt(best) += 1
          ss(best) = Math.addExact(ss(best), sq)
          var d = 0
          while (d < dim) {
            sums(best)(d) = Math.addExact(sums(best)(d), x(d)); d += 1
          }
        }
        lastAgg = (0 until k).filter(cnt(_) > 0)
          .map(c => c -> ((cnt(c), sums(c), ss(c)))).toMap
        val next = state.indices.map { cell =>
          lastAgg.get(cell).map { case (n, s, _) => (s, n) }.getOrElse(state(cell))
        }.toArray
        if (converged(next)) done = true
        state = next
        r += 1
      }
    } else {
      var r = 0
      var done = false
      while (r < maxIters && !done) {
        prev = state
        val sums = (0 until dim).map(d => sum(element_at(col("q"), d + 1)).as(s"s$d"))
        val aggCols = count(lit(1)).as("n") +: sums :+ sum(col("sq")).as("ss")
        val rows = q.withColumn("cell", kmAssignCellCol(state))
          .groupBy("cell").agg(aggCols.head, aggCols.tail: _*)
          .collect()
        lastAgg = rows.map { row =>
          val cell = row.getInt(0)
          val n = row.getLong(1)
          val s = Array.tabulate(dim)(d => row.getLong(2 + d))
          cell -> (n, s, row.getLong(2 + dim))
        }.toMap
        val next = state.indices.map { cell =>
          lastAgg.get(cell).map { case (n, s, _) => (s, n) }.getOrElse(state(cell))
        }.toArray
        if (converged(next)) done = true
        state = next
        r += 1
      }
    }
    KmFit(q, dim, prev, lastAgg)
  }

  /** Maximal-marginal-relevance diversified re-rank (Carbonell &
    * Goldstein, SIGIR 1998) over the int8-quantized scan: per query, take
    * the `shortlist` nearest candidates by EXACT integer squared L2 over
    * the codes (d² = |a|² + |b|² − 2·a·b, every term from the codegen
    * byte-scan expressions), then greedily select `m` of them maximizing
    * λ·relevance − (1−λ)·redundancy with λ = 1/2, i.e. arg max
    * (min_{s∈S} d²(c, s)) − d²(q, c) — the first pick is the plain
    * nearest neighbour, each later pick trades closeness to the query
    * against distance to everything already picked. ALL scores are
    * integers (no cosine, no sqrt), so selection — including every
    * tie-break, (score DESC, id ASC) — replays bit-for-bit in the
    * oracle's unrolled greedy CTEs.
    *
    * Scale: the shortlist comes from the k-bounded [[topKPerGroup]]
    * aggregate over the (gated, bounded-query-set) scored scan — ≤ k
    * candidates per query per map partition cross the exchange. The
    * greedy loop then touches ONLY (query × shortlist) rows: each of the
    * m−1 unrolled steps is a qid-equi-join of a ≤shortlist-row relation
    * against a ≤(step)-row selected set, localCheckpoint'ed so the loop's
    * plan stays flat. Returns (qid, rnk, id, d2q). */
  def mmrRerank(packedCorpus: DataFrame, packedQueries: DataFrame,
                idCol: String, codeCol: String, qidCol: String,
                qcodeCol: String, shortlist: Int = 20, m: Int = 5,
                maxQueryRows: Int = BruteForceMaxQueryRows,
                acceptQuadraticCost: Boolean = false,
                localSolve: Boolean = true): DataFrame = {
    import graft.functions.GraftFunctions.{dot_i8, normsq_i8}
    require(m >= 1 && shortlist >= m)
    gateQuerySet(packedQueries, "mmrRerank", maxQueryRows, acceptQuadraticCost)
    val c = Par.spread(packedCorpus.select(col(idCol).as("id"), col(codeCol).as("code")))
      .filter(col("code").isNotNull)
      .withColumn("nsq", normsq_i8(col("code")))
    val q = packedQueries.select(col(qidCol).as("qid"), col(qcodeCol).as("qcode"))
      .filter(col("qcode").isNotNull)
      .withColumn("qnsq", normsq_i8(col("qcode")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("d2q",
        col("nsq") + col("qnsq") - lit(2L) * dot_i8(col("code"), col("qcode")))
    // top-`shortlist` by (d2q ASC, id ASC) via the bounded aggregate
    // (score = −d2q is exact: d2q ≤ 64·(254)² ≪ 2^53)
    val cand = topKPerGroup(
        scored.withColumn("neg", -col("d2q").cast("double")),
        "qid", "neg", "id", shortlist)
      .select(col("qid"), col("id"), (-col("sim")).cast("long").as("d2q"))
      .join(c.select(col("id"), col("code")), "id")
      .localCheckpoint(eager = true)
    // The greedy selection operates on a relation STRUCTURALLY bounded at
    // |queries| × shortlist rows (the query set is gated above), so for
    // integral id types the m rounds run on the driver over the collected
    // candidate table — the identical (score DESC, id ASC) argmax and the
    // identical exact-integer kernels (DotI8.dot/normSq, the same statics
    // the codegen expressions call), bit-equal to the distributed loop
    // (spec-proven). The distributed loop paid ~4 tiny jobs + a lineage
    // fence PER RANK of pure scheduling (measured: 40 jobs for m = 5 at
    // sf0.1); it remains the path for non-integral id types, whose
    // engine sort order the driver must not re-implement.
    val integralIds = {
      import org.apache.spark.sql.types._
      Seq("qid", "id").forall(cn => cand.schema(cn).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    if (integralIds && localSolve) {
      val spark = cand.sparkSession
      val rows = cand.select(col("qid").cast("long"), col("id").cast("long"),
        col("d2q"), col("code")).collect()
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)] // (qid, rnk, id, d2q)
      rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
        var remaining = rs.map(r =>
            (r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3)))
          .toVector
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Array[Byte])]
        var r = 1
        while (r <= m && remaining.nonEmpty) {
          val best =
            if (r == 1) remaining.minBy(c => (c._2, c._1)) // max −d2q, tie min id
            else remaining.minBy { c =>
              val nsqC = graft.functions.DotI8.normSq(c._3)
              val mind = selected.iterator.map { s =>
                nsqC + graft.functions.DotI8.normSq(s._3) -
                  2L * graft.functions.DotI8.dot(c._3, s._3)
              }.min
              (-(mind - c._2), c._1) // max score = mind − d2q, tie min id
            }
          out += ((qid, r.toLong, best._1, best._2))
          selected += best
          remaining = remaining.filterNot(c => c._1 == best._1)
          r += 1
        }
      }
      val qidT = cand.schema("qid").dataType
      val idT = cand.schema("id").dataType
      return spark.createDataFrame(out.toSeq)
        .toDF("qid", "rnk", "id", "d2q")
        .select(col("qid").cast(qidT).as("qid"), col("rnk"),
          col("id").cast(idT).as("id"), col("d2q"))
    }
    def pick(scoredCand: DataFrame, rnk: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("score").desc, col("id"))
      scoredCand.withColumn("w", row_number().over(w)).filter(col("w") === 1)
        .select(col("qid"), col("id"), col("code"), col("d2q"),
          lit(rnk.toLong).as("rnk"))
    }
    var sel = pick(cand.withColumn("score", -col("d2q")), 1)
      .localCheckpoint(eager = true)
    (2 to m).foreach { r =>
      val remaining = cand.join(sel.select("qid", "id"), Seq("qid", "id"), "left_anti")
      val scoredCand = remaining
        .join(sel.select(col("qid"), col("code").as("scode")), "qid")
        .groupBy("qid", "id", "code", "d2q")
        .agg(min(normsq_i8(col("code")) + normsq_i8(col("scode")) -
          lit(2L) * dot_i8(col("code"), col("scode"))).as("mind"))
        .withColumn("score", col("mind") - col("d2q"))
      sel = sel.union(pick(scoredCand, r)).localCheckpoint(eager = true)
    }
    sel.select(col("qid"), col("rnk"), col("id"), col("d2q"))
  }

  /** TOP PRINCIPAL COMPONENT of the embedding corpus by EXACT-INTEGER
    * power iteration — the "All-but-the-top" curation primitive (Mu &
    * Viswanath, ICLR 2018: embedding corpora carry a dominant non-zero
    * mean direction; removing it improves isotropy and retrieval) and
    * the PCA-whitening seed.
    *
    * ONE corpus pass computes the integer moment table: vectors
    * quantized x_fp = floor(x·2^20) (a float times a power of two is
    * an exact double; floor is IEEE-defined — both engines land the
    * same BIGINT), then M_jk = Σ x_j·x_k (j ≤ k) and S_j = Σ x_j in a
    * single d(d+1)/2 + d cell explode, map-side combined into
    * DECIMAL(38,0) sums — the shuffle carries ~2k cells per partition
    * REGARDLESS of corpus size. The centered scatter C = n·M − S·Sᵀ
    * (covariance × n²; centering via moments, no second pass) is
    * assembled on the driver in BigInt and `iters` power rounds run
    * there: w = C·v, v ← (w·2^20) div max|w| — integer division
    * TRUNCATING toward zero everywhere (BigInt `/` ≡ DuckDB's integer
    * `//`, probed: −7//2 = −3), so the trajectory is a pure function
    * of the data, replayed bit-for-bit by the oracle's unrolled
    * HUGEINT CTE chain. Driver state: d² BigInts (the kmeans
    * bounded-driver precedent). Returns one row per dimension
    * (dim, v_fp, var_fp) where var_fp = (vᵀCv) div (vᵀv·n²) is
    * the Rayleigh variance along the component in 2^40 fixed point. */
  /** ALL-BUT-THE-TOP projection (Mu & Viswanath 2018): remove the
    * dominant component from every vector — x′ = x_fp·(ṽᵀṽ) − (x_fpᵀṽ)·ṽ
    * with x_fp = floor(x·2^20) and ṽ = v_fp div 2^10 (the
    * [[topPrincipalComponent]] output coarsened by 2^10 so every
    * coordinate of the SCALED orthogonal-complement projection stays
    * far inside Int64: |x′| ≤ 2^46; the scale ṽᵀṽ cancels in cosine).
    * All projection arithmetic is exact integer; the final cast of the
    * exact coordinates to double for ranking is IEEE round-to-nearest —
    * identical in any engine, so downstream rankings replay in SQL.
    * Returns (id, label passthrough cols…, va: array<double>). */
  def allButTop(emb: DataFrame, idCol: String, embCol: String,
                vFp: Array[Long]): DataFrame = {
    val vt = vFp.map(_ / 1024L) // BigInt-free: v_fp fits long, div truncates like the oracle's //
    val vv = vt.map(v => v * v).sum
    val vtArr = array(vt.map(lit): _*)
    val xfp = expr(s"transform(`$embCol`, " +
      "e -> CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT))")
    emb.filter(col(embCol).isNotNull)
      .withColumn("_xfp", xfp)
      .withColumn("_xv", aggregate(
        zip_with(col("_xfp"), vtArr, (a, b) => a * b),
        lit(0L), (acc, e) => acc + e))
      .withColumn("va", zip_with(col("_xfp"), vtArr,
        (a, b) => (a * lit(vv) - col("_xv") * b).cast("double")))
      .drop("_xfp", "_xv", embCol)
  }

  def topPrincipalComponent(emb: DataFrame, embCol: String, dims: Int,
                            iters: Int = 8): DataFrame = {
    require(dims >= 1 && dims <= 512, s"dims in [1,512]: $dims")
    require(iters >= 1 && iters <= 64, s"iters in [1,64]: $iters")
    val spark = emb.sparkSession
    val fp = expr(s"transform(`$embCol`, " +
      "e -> CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT))")
    val rows = emb
      .filter(col(embCol).isNotNull && size(col(embCol)) === dims)
      .select(fp.as("x"))
      .localCheckpoint(true) // two consumers: count + moment aggregate
    val n = rows.count()
    require(n > 0, "topPrincipalComponent: empty corpus")
    // moment cells: products for j <= k, plus (j, -1) rows carrying S_j
    val cells = rows.select(explode(expr(
      """flatten(transform(x, (xj, j) -> concat(
        |  transform(slice(x, j + 1, size(x) - j),
        |            (xk, i) -> named_struct('j', j, 'k', j + i, 'p', xj * xk)),
        |  array(named_struct('j', j, 'k', CAST(-1 AS INT), 'p', xj)))))"""
        .stripMargin)).as("c"))
      .select(col("c.j").as("j"), col("c.k").as("k"),
        col("c.p").cast("decimal(38,0)").as("p"))
      .groupBy("j", "k").agg(sum("p").as("s"))
      .collect()
    rows.unpersist(blocking = false)
    val bigN = BigInt(n)
    val s = Array.fill(dims)(BigInt(0))
    val m = Array.fill(dims, dims)(BigInt(0))
    cells.foreach { r =>
      val (j, k) = (r.getInt(0), r.getInt(1))
      val v = BigInt(r.getDecimal(2).toBigInteger)
      if (k == -1) s(j) = v else { m(j)(k) = v; m(k)(j) = v }
    }
    val c = Array.tabulate(dims, dims)((j, k) => bigN * m(j)(k) - s(j) * s(k))
    val scale = BigInt(1048576)
    var v = Array.fill(dims)(scale)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims)(j =>
        (0 until dims).map(k => c(j)(k) * v(k)).sum)
      val mx = w.map(_.abs).max
      require(mx > 0, "topPrincipalComponent: zero scatter matrix")
      v = w.map(wj => wj * scale / mx) // BigInt / truncates like DuckDB //
    }
    val num = (for (j <- 0 until dims; k <- 0 until dims)
      yield v(j) * c(j)(k) * v(k)).sum
    val den = v.map(x => x * x).sum * bigN * bigN
    val lambda = num / den
    import spark.implicits._
    v.zipWithIndex
      .map { case (vf, j) => (j, vf.toLong, lambda.toLong) }.toSeq
      .toDF("dim", "v_fp", "var_fp")
  }
}
