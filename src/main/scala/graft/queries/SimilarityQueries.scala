package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Similarity-search queries over `embeddings` (vec_id, embedding
  * list<float>, label). Brute-force cosine is oracle-checked against
  * DuckDB (both sides: double precision, left-to-right summation). The
  * sign-LSH pipelines (lsh top-k, lsh recall, embedding near-dups) are
  * ALSO oracle-checked: approximate against the exact top-k, but exactly
  * reproducible — the oracle embeds the engine's derived plane constants
  * and recomputes signatures/buckets/ranks relationally. The IVF
  * pipeline is oracle-checked too: its sample/Lloyd/assignment stages are
  * deliberately portable folds the oracle unrolls in SQL. Only HLL
  * (opaque sketch state) remains rows-only. */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.table(s, dir, "embeddings")

  /** Fraction of an exact top-10 an ANN method recovers, per query. A
    * left join (not semi) so a query the ANN misses ENTIRELY still shows
    * up with recall 0.0 — dropping it would hide the worst regressions. */
  private def recallAt10(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select("qid", "id")
      .join(approx.select(col("qid"), col("id"), lit(1).as("hit")),
        Seq("qid", "id"), "left")
      .groupBy("qid").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      .withColumn("recall_at_10", round(col("hits") / 10.0, 2))
      .orderBy("qid")

  /** emb_top_pc oracle: the exact-integer power iteration unrolled —
    * quantize → one moment pass (per-row self-join on a row id) →
    * centered scatter in HUGEINT → `iters` (w = C·v, floor-renormalize)
    * rounds → Rayleigh variance. Every CTE that is referenced more than
    * once is MATERIALIZED (the q_ktruss inline-expansion lesson). */
  /** The shared power-iteration CTE chain (quantize → moments →
    * centered scatter → `iters` rounds, final vector in v$iters) —
    * used by both the emb_top_pc oracle and the all-but-the-top
    * composition. */
  private def topPcChainSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "v0" else s"v${i - 1}"
      s"""w$i AS MATERIALIZED (
         |  SELECT cf.j, sum(cf.c * v.v) AS w
         |  FROM cf JOIN $prev v ON v.j = cf.k GROUP BY cf.j),
         |v$i AS MATERIALIZED (
         |  SELECT j, (w * 1048576) // (SELECT max(abs(w)) FROM w$i) AS v
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""x AS MATERIALIZED (
       |  SELECT list_transform(embedding,
       |           e -> CAST(floor(e::DOUBLE * 1048576.0) AS BIGINT)) AS v
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
       |nn AS MATERIALIZED (SELECT count(*)::HUGEINT AS n FROM x),
       |xr AS (SELECT row_number() OVER () AS rid, v FROM x),
       |p2 AS MATERIALIZED (
       |  SELECT rid, u.j AS j, u.x AS x
       |  FROM (SELECT rid, unnest(list_transform(v, (e, j) ->
       |          struct_pack(j := j - 1, x := e))) AS u FROM xr)),
       |m AS (SELECT a.j AS j, b.j AS k, sum(a.x::HUGEINT * b.x) AS s
       |      FROM p2 a JOIN p2 b ON a.rid = b.rid AND a.j <= b.j
       |      GROUP BY 1, 2),
       |sv AS MATERIALIZED (
       |  SELECT j, sum(x)::HUGEINT AS s FROM p2 GROUP BY 1),
       |c0 AS MATERIALIZED (
       |  SELECT m.j, m.k, nn.n * m.s - sa.s * sb.s AS c
       |  FROM m JOIN sv sa ON sa.j = m.j JOIN sv sb ON sb.j = m.k
       |  CROSS JOIN nn),
       |cf AS MATERIALIZED (
       |  SELECT j, k, c FROM c0
       |  UNION ALL SELECT k, j, c FROM c0 WHERE j <> k),
       |v0 AS (SELECT j, CAST(1048576 AS HUGEINT) AS v FROM sv),
       |$rounds""".stripMargin
  }

  private def topPcSql(iters: Int): String =
    s"""WITH ${topPcChainSql(iters)},
       |ray AS (
       |  SELECT (SELECT sum(a.v * cf.c * b.v)
       |          FROM cf JOIN v$iters a ON a.j = cf.j
       |               JOIN v$iters b ON b.j = cf.k) AS num,
       |         (SELECT sum(v * v) FROM v$iters) AS den,
       |         nn.n AS n FROM nn)
       |SELECT CAST(v.j AS INT) AS dim, CAST(v.v AS BIGINT) AS v_fp,
       |       CAST(ray.num // (ray.den * ray.n * ray.n) AS BIGINT) AS var_fp
       |FROM v$iters v, ray ORDER BY dim""".stripMargin

  /** DCG position weights ⌊1e12 / log2(rank+1)⌋, rank 1..10, and their
    * cumulative sums — computed ONCE here on the driver and embedded as
    * identical literals in the engine and the oracle (the BenfordP /
    * EwmaWeights precedent: the SQL must never call log2 itself, libm
    * rounding is platform-defined). Integer weights make the DCG sum
    * order-free exact — no double accumulation crosses an exchange. */
  private val DcgWfp: Seq[Long] = (1 to 10).map(i =>
    math.floor(1e12 / (math.log(i + 1.0) / math.log(2.0))).toLong)
  private val DcgCumFp: Seq[Long] = DcgWfp.scanLeft(0L)(_ + _).tail

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RETRIEVAL EVALUATION — nDCG@10 / MRR@10 / P@10 of the brute-force
    // cosine arm against label-match relevance (the qrel every labeled
    // embedding corpus carries): the search-quality harness a retrieval
    // pipeline tunes against. All ranking inputs are the proven
    // sim_bruteforce path; every metric accumulates in INTEGER fixed
    // point (driver-embedded ⌊1e12/log2(r+1)⌋ weights, 1e12/first-rank
    // MRR, integer hit counts) so sums are order-free and only the
    // final single divisions are double — bit-replayed by the oracle.
    "sim_ndcg" -> ((s, dir) => {
      val e = emb(s, dir)
      val top = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", "embedding")
      val lbl = e.select(col("vec_id").as("id"), col("label"))
      val qlbl = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"))
      val nlbl = e.groupBy("label").agg(count(lit(1)).as("n_lbl"))
      val wArr = array(DcgWfp.map(lit): _*)
      val cumArr = array(DcgCumFp.map(lit): _*)
      val scored = top.join(lbl, "id").join(broadcast(qlbl), "qid")
        .withColumn("rel", (col("label") === col("qlabel")).cast("long"))
      val perQ = scored.groupBy("qid").agg(
        sum(when(col("rel") === 1L,
          element_at(wArr, col("rank").cast("int"))).otherwise(0L)).as("dcg_fp"),
        coalesce(max(when(col("rel") === 1L,
          expr("1000000000000L div rank"))), lit(0L)).as("mrr_fp"),
        sum("rel").as("hits"))
      perQ.join(broadcast(qlbl), "qid")
        .join(nlbl.withColumnRenamed("label", "qlabel"), "qlabel")
        .withColumn("n_rel", col("n_lbl") - 1) // the query itself is excluded
        .withColumn("idcg_fp", // n_rel >= 1 guarded: ndcg is 0 when nothing is relevant
          element_at(cumArr,
            greatest(least(col("n_rel"), lit(10L)), lit(1L)).cast("int")))
        .select(col("qid"), col("n_rel"), col("hits"),
          round(when(col("n_rel") <= 0L, lit(0.0)).otherwise(
            col("dcg_fp").cast("double") / col("idcg_fp").cast("double")), 4)
            .as("ndcg"),
          round(col("mrr_fp").cast("double") / 1e12, 4).as("mrr"),
          round(col("hits").cast("double") / 10.0, 4).as("p_at_10"))
        .orderBy("qid")
    }),

    // ALL-BUT-THE-TOP retrieval composition (Mu 2018): project the
    // dominant component out of every embedding (exact-integer scaled
    // orthogonal projection off emb_top_pc's vector) and measure what
    // changes in the top-10 — per-query overlap with the original
    // ranking and label-match precision before/after. The curation
    // question ("does isotropy correction move retrieval?") as one
    // oracled query: the oracle replays power iteration, projection,
    // BOTH rankings and the overlap join.
    "sim_abt_overlap" -> ((s, dir) => {
      val e = emb(s, dir)
      val pc = Similarity.topPrincipalComponent(e, "embedding",
        dims = 64, iters = 8).orderBy("dim").collect().map(_.getLong(1))
      val proj = Similarity.allButTop(e, "vec_id", "embedding", pc)
        .localCheckpoint(true) // corpus AND query side of the re-rank
      // round-13 A/B receipt: a LAZY persist of topA/topB (the round-12
      // verdict's matLazy suggestion — the eager fence had measured
      // slower already) measured neutral-to-SLOWER too: isolated
      // REPEAT=5 pairs 2.76/2.58 s plain vs 3.30/2.71 s persisted. AQE's
      // runtime exchange reuse already dedupes the re-rank subtrees; a
      // cache only adds its write. Both fence shapes are now measured —
      // the repeated-subtree print in the plan is cosmetic.
      val topA = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", "embedding")
      val topB = Similarity.bruteForceTopK(proj,
        proj.filter(col("vec_id") < 10), "vec_id", "va", "vec_id", "va")
      val lbl = e.select(col("vec_id").as("id"), col("label"))
      val qlbl = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"))
      def p10(t: DataFrame) = t.join(lbl, "id").join(broadcast(qlbl), "qid")
        .groupBy("qid").agg(sum(when(col("label") === col("qlabel"), 1L)
          .otherwise(0L)).as("hits"))
      val overlap = topA.select("qid", "id")
        .join(topB.select("qid", "id"), Seq("qid", "id"))
        .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
      qlbl.select("qid")
        .join(overlap, Seq("qid"), "left")
        .join(p10(topA).withColumnRenamed("hits", "hits_orig"), "qid")
        .join(p10(topB).withColumnRenamed("hits", "hits_abt"), "qid")
        .select(col("qid"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          col("hits_orig"), col("hits_abt"))
        .orderBy("qid")
    }),

    // TOP PRINCIPAL COMPONENT by exact-integer power iteration (Mu &
    // Viswanath 2018 "All-but-the-top") — one corpus pass aggregates
    // the d(d+1)/2-cell integer moment table (constant shuffle volume
    // at any corpus size), the 8 power rounds run on d² driver BigInts,
    // and the oracle replays quantization, scatter, every round's
    // floor-renormalized vector and the Rayleigh variance bit-for-bit.
    "emb_top_pc" -> ((s, dir) =>
      Similarity.topPrincipalComponent(emb(s, dir), "embedding",
          dims = 64, iters = 8)
        .orderBy("dim")),

    // Brute-force cosine top-10 for 10 query vectors (the baseline)
    "sim_bruteforce_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // Threshold pairs on a deterministic 5% query sample. DIAGNOSTIC
    // (SparkEntry.diagnostic): the query set grows with the corpus, so the
    // scan is quadratic by construction — it calibrates emb_near_dups,
    // the sub-quadratic sign-LSH production path for threshold pairs.
    // bruteForceTopK's scale gate would refuse a corpus-scale query set.
    "sim_threshold_pairs" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") % 20 === 0)
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .filter(col("sim") >= 0.2)
        .select(col("qid"), col("id"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "id")
    }),

    // LSH-bucketed ANN top-k — oracle-checked via embedded plane constants
    "sim_lsh_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // LSH recall vs brute force — the ANN quality metric, oracle-checked
    "sim_lsh_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      recallAt10(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"),
        Similarity.lshTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // IVF ANN: k-means coarse quantizer + probed exact search —
    // oracle-checked (the whole quantizer is reproduced in SQL)
    "sim_ivf_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF ANN over the FLOAT32-PACKED embedding layout: the scan reads
    // (vec_id, emb_f32 BINARY) — half the raw vector bytes, no
    // per-element parquet repetition levels — and a codegen expression
    // widens float32 → double so the identical IVF plan runs on top.
    // The narrowing is IEEE round-to-nearest-even, replayed bit-for-bit
    // by the oracle's CAST(x AS FLOAT); see README for the measured
    // bytes-scanned A/B.
    "sim_ivf_topk_f32" -> ((s, dir) => {
      import graft.functions.GraftFunctions.unpack_f32
      val p = graft.Tables.embeddingsPacked(s, dir)
        .select(col("vec_id"), unpack_f32(col("emb_f32")).as("embedding"))
      Similarity.ivfTopK(
        p, p.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF recall vs brute force — oracle-checked
    "sim_ivf_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      recallAt10(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"),
        Similarity.ivfTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // Product-quantization ANN: 4 subspace codebooks (trained by the
    // same deterministic hash-sample Lloyd as IVF), corpus stored as
    // 4 codes/vector (64× compression), search via asymmetric distance
    // tables — oracle-checked (all four codebooks are TRAINED IN SQL and
    // the ADC ranking replayed to an exact hash match)
    "sim_pq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.pqTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("adc"), 4).as("adc"))
        .orderBy("qid", "rank")
    }),

    // IVF-PQ (Jégou 2011's IVFADC): coarse 16-cell quantizer + 4
    // RESIDUAL-trained PQ codebooks; queries probe 4 cells and scan only
    // those postings with per-cell ADC tables of the query residual —
    // probe selectivity ON TOP of PQ's 64× compression, the composition
    // production ANN engines ship. Oracle replays the ENTIRE pipeline —
    // coarse Lloyd, sample residuals, 4 residual codebooks, probes, ADC —
    // in SQL to an exact hash match.
    "sim_ivfpq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("adc"), 4).as("adc"))
        .orderBy("qid", "rank")
    }),

    // PQ recall vs the exact-L2 baseline (ADC approximates L2², so the
    // honest reference ranking is L2, not cosine) — oracle-checked
    "sim_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val c = e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")).filter(col("v").isNotNull)
      val qq = q.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv")).filter(col("qv").isNotNull)
      val scored = c.crossJoin(broadcast(qq))
        .filter(col("id") =!= col("qid"))
        .withColumn("nd2", -aggregate(
          zip_with(col("v"), col("qv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      val exact = Similarity.topKPerGroup(scored, "qid", "nd2", "id", 10)
      recallAt10(exact,
        Similarity.pqTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // IVF-PQ recall vs the exact-L2 baseline — the quality screen for
    // the composed index: residual codebooks + probe truncation, both
    // losses measured in one number per query (oracle-checked end to end)
    "sim_ivfpq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val c = e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")).filter(col("v").isNotNull)
      val qq = q.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv")).filter(col("qv").isNotNull)
      val scored = c.crossJoin(broadcast(qq))
        .filter(col("id") =!= col("qid"))
        .withColumn("nd2", -aggregate(
          zip_with(col("v"), col("qv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      val exact = Similarity.topKPerGroup(scored, "qid", "nd2", "id", 10)
      recallAt10(exact,
        Similarity.ivfPqTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // Binary-quantized ANN: sign-bit signatures (32× compression), top-64
    // Hamming pre-filter, exact cosine re-rank — oracle-checked (the
    // signature fold, xor/popcount and both rank stages are relational)
    "sim_binary_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.binaryTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // Binary-ANN recall vs brute force — oracle-checked
    "sim_binary_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      recallAt10(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"),
        Similarity.binaryTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // Matryoshka-style dimension truncation: recall@10 of brute-force
    // cosine search over only the FIRST 16 of 64 dims vs the full vectors
    // — the standard screen before shipping truncated embeddings (4× less
    // storage/bandwidth at whatever recall this reports). Truncation is a
    // `slice` projection, so the measurement needs no re-embedding pass.
    "sim_truncated_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val et = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      recallAt10(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"),
        Similarity.bruteForceTopK(et, et.filter(col("vec_id") < 10),
          "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // Johnson-Lindenstrauss random-projection recall: brute-force cosine
    // over a 64→16 REAL projection (splitmix64-derived planes, the same
    // matrix family as sign-LSH) vs the full-dimension baseline — the
    // standard screen before shipping projected vectors (4× fewer bytes
    // per vector ahead of every distance scan). Oracle-checked: the plane
    // constants are embedded in the SQL and the projection + ranking are
    // replayed bit-for-bit.
    "sim_rp_recall" -> ((s, dir) => {
      import graft.functions.GraftFunctions.random_project
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val ep = e.select(col("vec_id"),
        random_project(col("embedding").cast("array<double>"), 16).as("embedding"))
      recallAt10(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"),
        Similarity.bruteForceTopK(ep, ep.filter(col("vec_id") < 10),
          "vec_id", "embedding", "vec_id", "embedding"))
    }),

    // Int8 scalar-quantized (SQ8) top-k over the packed
    // (vec_id, emb_i8 BINARY, scale) layout: 1 byte/dim on the wire (8×
    // fewer raw vector bytes than array<double>), exact integer dot/norm
    // arithmetic off the bytes — the oracle re-quantizes in SQL and
    // replays the ranking to an exact hash match.
    "sim_int8_topk" -> ((s, dir) => {
      val p = graft.Tables.embeddingsInt8(s, dir)
      Similarity.int8TopK(p, p.filter(col("vec_id") < 10),
        "vec_id", "emb_i8", "vec_id", "emb_i8")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // MMR diversified re-rank over the SQ8 scan (Carbonell 1998): top-20
    // shortlist by EXACT integer squared L2 on the codes, then 5 greedy
    // picks maximizing (min d² to the already-picked) − (d² to the
    // query), λ = 1/2 — pure-integer scores, so the greedy selection
    // (every tie-break included) replays bit-for-bit in unrolled CTEs.
    // The diversification that plain top-k lacks: near-duplicate
    // neighbours collapse to one representative; the remaining picks
    // spread across the shortlist's distinct regions.
    "sim_mmr_rerank" -> ((s, dir) => {
      val p = graft.Tables.embeddingsInt8(s, dir)
      Similarity.mmrRerank(p, p.filter(col("vec_id") < 10),
          "vec_id", "emb_i8", "vec_id", "emb_i8")
        .orderBy("qid", "rnk")
    }),

    // IVF over the SQ8 scan — FAISS's IVF+SQ8 composition: the coarse
    // quantizer trains/assigns/probes on the DEQUANTIZED codes
    // ((code·scale)/127, one codegen widening over the 1-byte scan), the
    // identical IVF plan runs on top, and the oracle replays the whole
    // pipeline over the same re-quantized doubles.
    "sim_ivf_topk_i8" -> ((s, dir) => {
      import graft.functions.GraftFunctions.unpack_i8
      val p = graft.Tables.embeddingsInt8(s, dir)
        .select(col("vec_id"),
          transform(unpack_i8(col("emb_i8")),
            c => (c.cast("double") * col("scale")) / lit(127.0)).as("embedding"))
      Similarity.ivfTopK(
        p, p.filter(col("vec_id") < 10), "vec_id", "embedding", "vec_id", "embedding")
        .select(col("qid"), col("id"), col("rank"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    }),

    // Int8 recall vs the full-precision brute force — the quality screen
    // that says what the 8× byte cut costs (oracle-checked end to end)
    "sim_int8_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val p = graft.Tables.embeddingsInt8(s, dir)
      recallAt10(
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding"),
        Similarity.int8TopK(p, p.filter(col("vec_id") < 10),
          "vec_id", "emb_i8", "vec_id", "emb_i8"))
    }),

    // Embedding near-dup pairs via sign-LSH buckets + exact cosine —
    // oracle-checked (bucket-local pair generation, no n² cross join)
    "emb_near_dups" -> ((s, dir) =>
      graft.ops.Dedup.embeddingNearDups(
          emb(s, dir), "vec_id", "embedding", threshold = 0.25, planes = 4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
        .limit(100)),

    // IVF index-balance report: per-cell population/share under the same
    // quantizer sim_ivf_topk searches with — cell skew, not mean size,
    // sets probe tail latency at scale
    "sim_ivf_cells" -> ((s, dir) =>
      Similarity.ivfCellProfile(emb(s, dir), "vec_id", "embedding")),

    // SemDeDup (Abbas 2023): portable-kmeans cells (√n of them), min-id
    // survivor pruning of same-cell cosine-≥0.3 neighbors — per-cell
    // keep stats; the oracle retrains the quantizer AND replays the
    // within-cell prune in SQL, dynamic cell count included
    "emb_semantic_prune" -> ((s, dir) =>
      Similarity.semanticPrune(emb(s, dir), "vec_id", "embedding",
          simThreshold = 0.3)
        .orderBy("cell")),

    // Int8 quantization reconstruction error per label (the 4× storage
    // lever); mse in 1e-9 units so rounding keeps signal
    "sim_quantized_error" -> ((s, dir) => {
      val e = emb(s, dir).select(col("label"),
        col("embedding").cast("array<double>").as("v"))
      val scale = Similarity.quantScale(col("v"))
      e.filter(array_max(transform(col("v"), x => abs(x))) > 0)
        .withColumn("scale", scale)
        .withColumn("q", transform(col("v"), x => round(x * col("scale"))))
        .withColumn("mse",
          aggregate(zip_with(col("v"), col("q"),
            (x, qq) => pow(x - qq / col("scale"), lit(2.0))),
            lit(0.0), (acc, x) => acc + x) / size(col("v")))
        .groupBy("label")
        .agg(round(avg("mse"), 9).as("avg_mse"))
        .orderBy("label")
    }),

    // Element-wise vector stats per label (array indexing + aggregation)
    "sim_vector_stats" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
        .groupBy("label")
        .agg(
          round(avg(element_at(col("v"), 1)), 4).as("avg_d1"),
          round(avg(element_at(col("v"), 64)), 4).as("avg_d64"),
          round(max(element_at(col("v"), 1)), 4).as("max_d1"),
          count(lit(1)).as("n"))
        .orderBy("label")),

    // Label centroid distances: vector aggregation via higher-order fns.
    // Oracle-checked: plain per-dimension sums + norm, mirrored in DuckDB
    // by an unnest-by-index aggregation (float→double casts are exact;
    // round(…,4) absorbs summation-order fp noise).
    "sim_label_centroids" -> ((s, dir) => {
      val e = emb(s, dir).select(col("label"),
        col("embedding").cast("array<double>").as("v"))
      val dim = 64
      val sums = (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"s$i"))
      e.groupBy("label").agg(sums.head, sums.tail: _*)
        .withColumn("centroid_norm",
          round(sqrt((0 until dim).map(i => col(s"s$i") * col(s"s$i")).reduce(_ + _)), 4))
        .select(col("label"), col("centroid_norm"))
        .orderBy("label")
    }),

    // Embedding-quality outlier filter: vectors far from their label's
    // centroid (> 1.02× the label's mean distance) — the standard
    // "drop mislabeled / garbage embeddings before training" gate. Two
    // map-side-combined aggregations over the corpus (centroid, then mean
    // distance); the per-label centroid and threshold tables are |labels|
    // rows and broadcast — nothing shuffles with the vector count, and
    // the distance is one codegen'd zip_with fold per row.
    "emb_centroid_outliers" -> ((s, dir) => {
      val dim = 64
      val e = emb(s, dir).select(col("label"), col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val sums = (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"s$i")) :+
        count(lit(1)).as("n")
      val cent = e.groupBy("label").agg(sums.head, sums.tail: _*)
        .select(col("label"),
          array((0 until dim).map(i => col(s"s$i") / col("n")): _*).as("c"))
      val dist = e.join(broadcast(cent), "label")
        .withColumn("d", sqrt(expr(
          "aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)")))
        .select("label", "vec_id", "d")
      val lim = dist.groupBy("label").agg(avg("d").as("avg_d"))
      dist.join(broadcast(lim), "label")
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(when(col("d") > lit(1.02) * col("avg_d"), 1L).otherwise(0L))
            .as("n_outliers"),
          round(avg("d"), 4).as("avg_dist"))
        .orderBy("label")
    }),

    // Incremental IVF maintenance: quantizer trained on (and FROZEN at)
    // the base corpus (vec_id % 5 != 0), the arrival batch (% 5 == 0)
    // assigned in one Δ-sized pass, per-cell MV merged by addition.
    // Oracle = full recompute over base ∪ delta with the base-trained
    // quantizer — equal because assignment depends only on the frozen
    // centroids, so the merged counts ARE the recomputed counts.
    "sim_ivf_append" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfAppendProfile(
        e.filter(col("vec_id") % 5 =!= 0),
        e.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding")
    }),

    // Distributed full-corpus Lloyd's k-means to a DETECTED fixed point
    // (cap 25): per-cell population, centroid norm, mean-squared
    // distortion. Exact integer state makes the run layout-invariant and
    // the oracle replayable — the SQL unrolls all 25 rounds; a converged
    // state is a fixed point, so the early-stopped engine and the
    // fully-unrolled oracle land on identical rows (see
    // Similarity.kmeansReport).
    "emb_kmeans" -> ((s, dir) =>
      Similarity.kmeansReport(emb(s, dir), "vec_id", "embedding",
        k = 8, maxIters = 25)),

    // Full-corpus k-means over the FLOAT32-PACKED scan: the per-round
    // work is a linear scan of the vectors, so the packed layout's byte
    // halving lands directly on the round cost at scale. UnpackF32
    // widens losslessly and the 2^20 quantization then runs on the
    // f32-rounded values — which the oracle replays by CAST(x AS FLOAT)
    // before the same unrolled rounds.
    "emb_kmeans_f32" -> ((s, dir) => {
      import graft.functions.GraftFunctions.unpack_f32
      val p = graft.Tables.embeddingsPacked(s, dir)
        .select(col("vec_id"), unpack_f32(col("emb_f32")).as("embedding"))
      Similarity.kmeansReport(p, "vec_id", "embedding", k = 8, maxIters = 25)
    }),

    // Same fixed-point Lloyd's, seeded by the DETERMINISTIC k-means‖
    // oversampling init (Bahmani 2012; md5-derived u/d² priorities in
    // place of Poisson trials, exact integer distances, greedy weighted
    // k-center recluster) — the distance-aware init that avoids the
    // hash-min init's clumped-seed failure mode on clustered data. The
    // oracle replays init rounds, candidate weights, the k-center
    // unroll, and all 25 Lloyd rounds relationally.
    "emb_kmeans_kpar" -> ((s, dir) =>
      Similarity.kmeansReport(emb(s, dir), "vec_id", "embedding",
        k = 8, maxIters = 25, parallelInit = true)),

    // Cluster-balanced diversity sampling — the curation decision the
    // k-means fixed point exists to feed: per semantic cell, the 3
    // members smallest in (md5(id), id) order. The per-cell pick is the
    // bounded KMinStrings aggregate (≤3 short strings per cell cross the
    // exchange, map-side combined — never a per-cell window sort of the
    // corpus), and the hash ranking makes the picks a pure function of
    // the data, replayed relationally by the oracle on the unrolled
    // assignment.
    "emb_cluster_sample" -> ((s, dir) => {
      import graft.functions.KMinStrings
      Similarity.kmeansAssign(emb(s, dir), "vec_id", "embedding",
          k = 8, maxIters = 25)
        .groupBy("cell")
        .agg(KMinStrings.kmin_strings(
          concat(md5(col("id").cast("string")), lit(":"),
            col("id").cast("string")), 3).as("picks"))
        .select(col("cell"), posexplode(col("picks")))
        .select(col("cell"), (col("pos") + 1).cast("int").as("rnk"),
          split(col("col"), ":").getItem(1).cast("long").as("vec_id"))
        .orderBy("cell", "rnk")
    })
  )

  /** The sign-LSH plane matrix as a DuckDB literal: the engine derives
    * plane components by splitmix64 hash-mixing (not expressible in SQL —
    * 64-bit wraparound multiply), so the oracle embeds the exact constants
    * (shortest-round-trip double literals, bit-exact on parse) and
    * recomputes signatures/buckets/cosines relationally from them. */
  private def planesLit(planes: Int, dims: Int): String =
    graft.functions.HyperplaneSig.matrix(planes, dims)
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Shared SQL for the binary-signature ANN pipeline (32-bit words,
    * Hamming top-64 pre-filter, exact cosine re-rank), mirroring
    * [[Similarity.binaryTopK]] stage by stage. The signature fold doubles
    * the accumulator per element — list_reduce without an init seeds with
    * the first bit, which yields the identical big-endian word. */
  private def binaryTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |        list_transform(generate_series(0, CAST(ceil(len(v)/32.0) AS INT) - 1),
       |          w -> list_reduce(list_transform(v[w*32+1 : w*32+32],
       |                 x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
       |               (a, b) -> a*2 + b)) AS sig
       |      FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, sig AS qsig FROM s WHERE vec_id < 10),
       |h AS (SELECT q.qid, s.vec_id AS id, s.v, q.qv,
       |        list_sum(list_transform(generate_series(1, len(s.sig)),
       |          w -> bit_count(xor(s.sig[w], q.qsig[w])))) AS ham
       |      FROM s CROSS JOIN q WHERE s.vec_id <> q.qid),
       |cand AS (SELECT qid, id, v, qv FROM (
       |    SELECT qid, id, v, qv, row_number() OVER (PARTITION BY qid ORDER BY ham, id) AS r
       |    FROM h) t
       |  WHERE r <= 64),
       |bin AS (
       |  SELECT qid, id, rank, sim FROM (
       |    SELECT qid, id, sim,
       |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank
       |    FROM (SELECT qid, id,
       |            ${dotSql("v", "qv")} / (${nrmSql("v")} * ${nrmSql("qv")}) AS sim
       |          FROM cand) sc) t
       |  WHERE rank <= 10)""".stripMargin

  /** Shared SQL for the banded sign-LSH top-k pipeline (planes=16,
    * bands=4×4 bits), mirroring [[Similarity.lshTopK]] stage by stage. */
  private def lshTopKSql: String =
    s"""WITH pl AS (SELECT ${planesLit(16, 64)}::DOUBLE[][] AS p),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |        CAST(list_sum(list_transform(generate_series(1, 16),
       |          i -> CASE WHEN ${dotSql("v", "pl.p[i]")} >= 0
       |               THEN (1::BIGINT << (i-1)) ELSE 0::BIGINT END)) AS BIGINT) AS sig
       |      FROM e CROSS JOIN pl),
       |cb AS (SELECT vec_id, v, bb.b AS band, (sig >> (bb.b * 4)) & 15 AS bucket
       |       FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bb),
       |q AS (SELECT vec_id AS qid, v AS qv, band, bucket FROM cb WHERE vec_id < 10),
       |cands AS (
       |  SELECT qid, id, qv, v FROM (
       |    SELECT q.qid, c.vec_id AS id, q.qv, c.v,
       |           row_number() OVER (PARTITION BY q.qid, c.vec_id ORDER BY q.band) AS rn
       |    FROM cb c JOIN q ON c.band = q.band AND c.bucket = q.bucket AND c.vec_id <> q.qid)
       |  WHERE rn = 1),
       |scored AS (SELECT qid, id,
       |  ${dotSql("v", "qv")} / (${nrmSql("v")} * ${nrmSql("qv")}) AS sim
       |  FROM cands),
       |lsh AS (
       |  SELECT qid, id, rank, sim FROM (
       |    SELECT qid, id, sim,
       |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank
       |    FROM scored) t
       |  WHERE rank <= 10)""".stripMargin

  // ---- IVF oracle: the ENTIRE learned-quantizer pipeline reproduced in
  // SQL, bit-for-bit. The engine's quantizer is deliberately portable:
  // the training sample is the md5-hex-ordered global top-N, Lloyd runs
  // sequential folds in sample order, and every distance/mean/cosine is a
  // left-to-right IEEE double fold. The SQL mirrors each step with
  // explicitly-sequential list_reduce folds (never list_sum/avg, whose
  // accumulation order is unspecified), so argmins, probes, and ranks
  // agree exactly — validated against an op-for-op replica. ----

  private def d2Sql(v: String, c: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), j -> ($v[j]-$c[j])*($v[j]-$c[j])), (a,b)->a+b)"
  private def dotSql(a: String, b: String, dims: Int = 64): String =
    s"list_reduce(list_transform(generate_series(1, $dims), j -> $a[j]*$b[j]), (a,b)->a+b)"
  private def nrmSql(v: String, dims: Int = 64): String =
    s"sqrt(list_reduce(list_transform(generate_series(1, $dims), j -> $v[j]*$v[j]), (a,b)->a+b))"

  // ---- Int8 (SQ8) oracle: re-derive the corpus-global scale (max |x|,
  // order-free so any evaluation order matches), re-quantize every vector
  // with the engine's exact arithmetic — floor((x*127)/s + 0.5) clamped to
  // ±127 — then rank by the all-integer quantized cosine. Every ranking
  // input is an integer, so the replay is bit-exact by construction. ----
  private def int8TopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |sc AS (SELECT max(list_reduce(list_transform(v, x -> abs(x)),
       |                 (a,b) -> greatest(a,b))) AS s FROM e),
       |n AS (SELECT vec_id, q,
       |        list_reduce(list_transform(q, c -> c*c), (a,b) -> a+b) AS nsq
       |      FROM (SELECT vec_id,
       |              list_transform(v, x -> CAST(greatest(-127.0, least(127.0,
       |                floor((x*127.0)/sc.s + 0.5))) AS BIGINT)) AS q
       |            FROM e CROSS JOIN sc) z),
       |i8 AS (
       |  SELECT qid, id, rank, sim FROM (
       |    SELECT qid, id, sim,
       |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank
       |    FROM (
       |      SELECT qq.vec_id AS qid, cc.vec_id AS id,
       |             CAST(${dotSql("cc.q", "qq.q")} AS DOUBLE) /
       |               sqrt(CAST(cc.nsq * qq.nsq AS DOUBLE)) AS sim
       |      FROM n cc CROSS JOIN (SELECT * FROM n WHERE vec_id < 10) qq
       |      WHERE cc.vec_id <> qq.vec_id AND cc.nsq > 0 AND qq.nsq > 0) s0) t
       |  WHERE rank <= 10)""".stripMargin

  /** sim_mmr_rerank oracle: re-quantize (same SQ8 arithmetic), shortlist
    * 20 by integer d² (row_number (d2q, id)), then the 5 greedy picks
    * unrolled — per step an anti-joined min-d²-to-selected aggregate and
    * a (score DESC, id) argmax. Every score is an integer. */
  private def mmrSql: String = {
    def step(r: Int): String = {
      val prev = s"u${r - 1}"
      s"""m$r AS (
         |  SELECT c.qid, c.id, min(${d2Sql("c.cq", "s.cq")}) AS mind
         |  FROM cand c JOIN $prev s ON s.qid = c.qid
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |                    WHERE x.qid = c.qid AND x.id = c.id)
         |  GROUP BY c.qid, c.id),
         |s$r AS (
         |  SELECT qid, id, cq, d2q, $r AS rnk FROM (
         |    SELECT c.qid, c.id, c.cq, c.d2q,
         |           row_number() OVER (PARTITION BY c.qid
         |             ORDER BY (m.mind - c.d2q) DESC, c.id) AS w
         |    FROM m$r m JOIN cand c ON c.qid = m.qid AND c.id = m.id) z
         |  WHERE w = 1),
         |u$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM s$r)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |sc AS (SELECT max(list_reduce(list_transform(v, x -> abs(x)),
       |                 (a,b) -> greatest(a,b))) AS s FROM e),
       |n AS (SELECT vec_id,
       |        list_transform(v, x -> CAST(greatest(-127.0, least(127.0,
       |          floor((x*127.0)/sc.s + 0.5))) AS BIGINT)) AS q
       |      FROM e CROSS JOIN sc),
       |d AS (SELECT qq.vec_id AS qid, cc.vec_id AS id, cc.q AS cq,
       |             ${d2Sql("cc.q", "qq.q")} AS d2q
       |      FROM n cc CROSS JOIN (SELECT * FROM n WHERE vec_id < 10) qq
       |      WHERE cc.vec_id <> qq.vec_id),
       |cand AS (SELECT qid, id, cq, d2q FROM (
       |    SELECT qid, id, cq, d2q,
       |           row_number() OVER (PARTITION BY qid ORDER BY d2q, id) AS w
       |    FROM d) z WHERE w <= 20),
       |u1 AS (SELECT qid, id, cq, d2q, 1 AS rnk FROM (
       |    SELECT qid, id, cq, d2q,
       |           row_number() OVER (PARTITION BY qid ORDER BY d2q, id) AS w
       |    FROM cand) z WHERE w = 1),
       |${(2 to 5).map(step).mkString(",\n")}
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, id, d2q FROM u5
       |ORDER BY qid, rnk""".stripMargin
  }

  /** One unrolled Lloyd iteration: assign sample rows to the previous
    * centers (first-wins argmin: ORDER BY d2, cell), then per-(cell, dim)
    * sequential-in-sample-order mean; empty cells keep their center. */
  private def lloydIterSql(i: Int): String = {
    val prev = if (i == 1) "init" else s"c${i - 1}"
    s"""a$i AS (
       |  SELECT rk, v, cell FROM (
       |    SELECT s.rk, s.v, c.cell,
       |           row_number() OVER (PARTITION BY s.rk ORDER BY ${d2Sql("s.v", "c.c")}, c.cell) AS w
       |    FROM smp s CROSS JOIN $prev c) z
       |  WHERE w = 1),
       |m$i AS (
       |  SELECT cell, list(m ORDER BY j) AS c FROM (
       |    SELECT cell, jj.j AS j,
       |           list_reduce(list(v[jj.j] ORDER BY rk), (a,b)->a+b) / count(*) AS m
       |    FROM a$i CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) jj
       |    GROUP BY cell, jj.j) g
       |  GROUP BY cell),
       |c$i AS (SELECT i.cell, COALESCE(m.c, i.c) AS c FROM init i LEFT JOIN m$i m ON i.cell = m.cell)""".stripMargin
  }

  /** Shared SQL prefix ending in `ivf AS (qid, id, rank, sim)` — the full
    * [[Similarity.ivfTopK]] pipeline (trainSample=4096, nlist=16, 5 Lloyd
    * iterations, nProbe=4, k=10) over the `vec_id < 10` query set. */
  private def ivfSql: String = ivfSqlFrom("CAST(embedding AS DOUBLE[])")

  /** The IVF oracle over float32-ROUNDED vectors — the same narrowing
    * (IEEE round-to-nearest-even) the engine's PackF32 applies, so the
    * packed-scan path hashes identically. */
  private def ivfF32Sql: String = ivfSqlFrom(
    "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(CAST(x AS FLOAT) AS DOUBLE))")

  /** The IVF oracle over int8-DEQUANTIZED vectors (FAISS's IVF+SQ8 shape):
    * every vector re-quantized with the engine's exact SQ8 arithmetic and
    * widened back as (code·scale)/127, so the quantizer training, cell
    * assignment, probes and ranking all replay on identical doubles. The
    * corpus-global scale rides in as a column of the FROM-clause derived
    * table (DuckDB lambdas admit column references but not subqueries). */
  private def ivfI8Sql: String = ivfSqlFrom(
    "list_transform(CAST(embedding AS DOUBLE[]), x -> " +
      "(CAST(CAST(greatest(-127.0, least(127.0, floor((x*127.0)/s0 + 0.5))) AS BIGINT) AS DOUBLE) * s0)/127.0)",
    """(SELECT emb.*,
      |   (SELECT max(list_reduce(list_transform(CAST(e2.embedding AS DOUBLE[]), x -> abs(x)),
      |               (a,b) -> greatest(a,b)))
      |    FROM embeddings e2 WHERE e2.embedding IS NOT NULL) AS s0
      | FROM embeddings emb)""".stripMargin)

  private def ivfSqlFrom(vExpr: String, fromExpr: String = "embeddings"): String = {
    val iters = (1 to 5).map(lloydIterSql).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, $vExpr AS v FROM $fromExpr
       |           WHERE embedding IS NOT NULL),
       |smp AS (
       |  SELECT v, rk FROM (
       |    SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |    FROM e) s
       |  WHERE rk <= 4096),
       |init AS (
       |  SELECT c, cell FROM (
       |    SELECT v AS c, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
       |      SELECT v, rk, row_number() OVER (PARTITION BY v ORDER BY rk) AS dup FROM smp) d
       |    WHERE dup = 1) x
       |  WHERE cell < 16),
       |$iters,
       |asg AS (
       |  SELECT id, v, cell FROM (
       |    SELECT e.vec_id AS id, e.v, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY ${d2Sql("e.v", "c.c")}, c.cell) AS w
       |    FROM e CROSS JOIN c5 c) z
       |  WHERE w = 1),
       |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |probe AS (
       |  SELECT qid, qv, cell FROM (
       |    SELECT q.qid, q.qv, c.cell,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY ${d2Sql("q.qv", "c.c")}, c.cell) AS pr
       |    FROM qv q CROSS JOIN c5 c) z
       |  WHERE pr <= 4),
       |scored AS (
       |  SELECT p.qid, a.id,
       |         ${dotSql("a.v", "p.qv")} / (${nrmSql("a.v")} * ${nrmSql("p.qv")}) AS sim
       |  FROM asg a JOIN probe p ON a.cell = p.cell AND a.id <> p.qid),
       |ivf AS (
       |  SELECT qid, id, rank, sim FROM (
       |    SELECT qid, id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank
       |    FROM scored) t
       |  WHERE rank <= 10)""".stripMargin
  }

  // ---- PQ oracle: FOUR 16-dim codebooks trained in SQL (same sample,
  // same sequential Lloyd folds as the IVF oracle, per subvector slice),
  // corpus encoded by first-wins argmin, queries expanded to per-cell
  // distance tables, ADC summed left-associatively to mirror Spark's
  // fixed-length fold — every float op identical, so ranks hash-match. ----
  private def pqSql: String = {
    val m = 4; val sub = 16; val ks = 16
    def d2N(v: String, c: String): String =
      s"list_reduce(list_transform(generate_series(1, $sub), j -> ($v[j]-$c[j])*($v[j]-$c[j])), (a,b)->a+b)"
    def lloydIter(p: String, i: Int): String = {
      val prev = if (i == 1) s"${p}init" else s"${p}c${i - 1}"
      s"""${p}a$i AS (
         |  SELECT rk, v, cell FROM (
         |    SELECT s.rk, s.v, c.cell,
         |           row_number() OVER (PARTITION BY s.rk ORDER BY ${d2N("s.v", "c.c")}, c.cell) AS w
         |    FROM ${p}smp s CROSS JOIN $prev c) z
         |  WHERE w = 1),
         |${p}m$i AS (
         |  SELECT cell, list(m ORDER BY j) AS c FROM (
         |    SELECT cell, jj.j AS j,
         |           list_reduce(list(v[jj.j] ORDER BY rk), (a,b)->a+b) / count(*) AS m
         |    FROM ${p}a$i CROSS JOIN (SELECT unnest(generate_series(1, $sub)) AS j) jj
         |    GROUP BY cell, jj.j) g
         |  GROUP BY cell),
         |${p}c$i AS (SELECT i.cell, COALESCE(m.c, i.c) AS c FROM ${p}init i LEFT JOIN ${p}m$i m ON i.cell = m.cell)""".stripMargin
    }
    def subspace(s: Int): String = {
      val p = s"s$s"
      val off = s * sub
      val sliced = s"[${off + 1}:${off + sub}]"
      s"""${p}smp AS (SELECT v$sliced AS v, rk FROM smp),
         |${p}init AS (
         |  SELECT c, cell FROM (
         |    SELECT v AS c, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
         |      SELECT v, rk, row_number() OVER (PARTITION BY v ORDER BY rk) AS dup FROM ${p}smp) d
         |    WHERE dup = 1) x
         |  WHERE cell < $ks),
         |${(1 to 5).map(i => lloydIter(p, i)).mkString(",\n")},
         |${p}asg AS (
         |  SELECT id, cell FROM (
         |    SELECT e.vec_id AS id, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY ${d2N(s"e.v$sliced", "c.c")}, c.cell) AS w
         |    FROM e CROSS JOIN ${p}c5 c) z
         |  WHERE w = 1),
         |${p}qd AS (SELECT q.qid, c.cell, ${d2N(s"q.qv$sliced", "c.c")} AS ds
         |           FROM qv q CROSS JOIN ${p}c5 c),
         |${p}ct AS (SELECT q.qid, a.id, q.ds FROM ${p}asg a JOIN ${p}qd q ON q.cell = a.cell)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |smp AS (
       |  SELECT v, rk FROM (
       |    SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |    FROM e) s
       |  WHERE rk <= 4096),
       |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |${(0 until m).map(subspace).mkString(",\n")},
       |adc AS (
       |  SELECT s0ct.qid, s0ct.id,
       |         s0ct.ds + s1ct.ds + s2ct.ds + s3ct.ds AS adc
       |  FROM s0ct
       |  JOIN s1ct ON s1ct.qid = s0ct.qid AND s1ct.id = s0ct.id
       |  JOIN s2ct ON s2ct.qid = s0ct.qid AND s2ct.id = s0ct.id
       |  JOIN s3ct ON s3ct.qid = s0ct.qid AND s3ct.id = s0ct.id
       |  WHERE s0ct.id <> s0ct.qid),
       |pq AS (
       |  SELECT qid, id, rank, adc FROM (
       |    SELECT qid, id, adc,
       |           row_number() OVER (PARTITION BY qid ORDER BY adc ASC, id) AS rank
       |    FROM adc) t
       |  WHERE rank <= 10)""".stripMargin
  }

  /** sim_ivfpq_topk oracle — the full IVFADC pipeline in SQL: coarse
    * 16-cell quantizer (same md5 sample + sequential Lloyd folds as the
    * IVF oracle), corpus + sample assigned first-wins to the FINAL
    * centers, residuals taken, FOUR residual codebooks trained per
    * subspace slice, corpus residuals encoded, queries probe 4 cells and
    * score probed postings by per-(query, cell) ADC tables of the query
    * residual. Ends in `ivfpq AS (qid, id, rank, adc)`.
    *
    * Every CTE is MATERIALIZED explicitly: the coarse-center chain `c5`
    * is referenced 4× (corpus assign, sample assign, probes, residuals)
    * and `res`/`probe` 5× each — DuckDB's default CTE inlining re-plans
    * the whole Lloyd chain per reference and the oracle goes from <1 s
    * to >10 min; with materialization it is sub-second. */
  private def ivfPqSql: String = ivfPqSqlRaw.replace("AS (", "AS MATERIALIZED (")

  private def ivfPqSqlRaw: String = {
    val m = 4; val sub = 16; val ks = 16
    def d2N(v: String, c: String): String =
      s"list_reduce(list_transform(generate_series(1, $sub), j -> ($v[j]-$c[j])*($v[j]-$c[j])), (a,b)->a+b)"
    def lloydIter(p: String, i: Int): String = {
      val prev = if (i == 1) s"${p}init" else s"$p" + s"c${i - 1}"
      s"""${p}a$i AS (
         |  SELECT rk, v, cell FROM (
         |    SELECT s.rk, s.v, c.cell,
         |           row_number() OVER (PARTITION BY s.rk ORDER BY ${d2N("s.v", "c.c")}, c.cell) AS w
         |    FROM ${p}smp s CROSS JOIN $prev c) z
         |  WHERE w = 1),
         |${p}m$i AS (
         |  SELECT cell, list(m ORDER BY j) AS c FROM (
         |    SELECT cell, jj.j AS j,
         |           list_reduce(list(v[jj.j] ORDER BY rk), (a,b)->a+b) / count(*) AS m
         |    FROM ${p}a$i CROSS JOIN (SELECT unnest(generate_series(1, $sub)) AS j) jj
         |    GROUP BY cell, jj.j) g
         |  GROUP BY cell),
         |${p}c$i AS (SELECT i.cell, COALESCE(m.c, i.c) AS c FROM ${p}init i LEFT JOIN ${p}m$i m ON i.cell = m.cell)""".stripMargin
    }
    def subspace(s: Int): String = {
      val p = s"s$s"
      val off = s * sub
      val sliced = s"[${off + 1}:${off + sub}]"
      s"""${p}smp AS (SELECT v$sliced AS v, rk FROM rsmp),
         |${p}init AS (
         |  SELECT c, cell FROM (
         |    SELECT v AS c, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
         |      SELECT v, rk, row_number() OVER (PARTITION BY v ORDER BY rk) AS dup FROM ${p}smp) d
         |    WHERE dup = 1) x
         |  WHERE cell < $ks),
         |${(1 to 5).map(i => lloydIter(p, i)).mkString(",\n")},
         |${p}asg AS (
         |  SELECT id, cell FROM (
         |    SELECT r.id, c.cell,
         |           row_number() OVER (PARTITION BY r.id ORDER BY ${d2N(s"r.r$sliced", "c.c")}, c.cell) AS w
         |    FROM res r CROSS JOIN ${p}c5 c) z
         |  WHERE w = 1),
         |${p}qd AS (SELECT p.qid, p.cell AS pcell, c.cell AS bcell,
         |                  ${d2N(s"p.qr$sliced", "c.c")} AS ds
         |           FROM probe p CROSS JOIN ${p}c5 c)""".stripMargin
    }
    val coarseIters = (1 to 5).map(lloydIterSql).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |smp AS (
       |  SELECT v, rk FROM (
       |    SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |    FROM e) s
       |  WHERE rk <= 4096),
       |init AS (
       |  SELECT c, cell FROM (
       |    SELECT v AS c, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
       |      SELECT v, rk, row_number() OVER (PARTITION BY v ORDER BY rk) AS dup FROM smp) d
       |    WHERE dup = 1) x
       |  WHERE cell < 16),
       |$coarseIters,
       |asg AS (
       |  SELECT id, v, cell FROM (
       |    SELECT e.vec_id AS id, e.v, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY ${d2Sql("e.v", "c.c")}, c.cell) AS w
       |    FROM e CROSS JOIN c5 c) z
       |  WHERE w = 1),
       |res AS (SELECT a.id, a.cell,
       |               list_transform(generate_series(1, 64), j -> a.v[j] - c.c[j]) AS r
       |        FROM asg a JOIN c5 c ON c.cell = a.cell),
       |csmp AS (
       |  SELECT rk, v, cell FROM (
       |    SELECT s.rk, s.v, c.cell,
       |           row_number() OVER (PARTITION BY s.rk ORDER BY ${d2Sql("s.v", "c.c")}, c.cell) AS w
       |    FROM smp s CROSS JOIN c5 c) z
       |  WHERE w = 1),
       |rsmp AS (SELECT s.rk,
       |                list_transform(generate_series(1, 64), j -> s.v[j] - c.c[j]) AS v
       |         FROM csmp s JOIN c5 c ON c.cell = s.cell),
       |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |probe AS (
       |  SELECT qid, cell,
       |         list_transform(generate_series(1, 64), j -> qv[j] - c[j]) AS qr
       |  FROM (
       |    SELECT q.qid, c.cell, c.c, q.qv,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY ${d2Sql("q.qv", "c.c")}, c.cell) AS pr
       |    FROM qv q CROSS JOIN c5 c) z
       |  WHERE pr <= 4),
       |${(0 until m).map(subspace).mkString(",\n")},
       |ivfpq AS (
       |  SELECT qid, id, rank, adc FROM (
       |    SELECT t.qid, t.id, t.adc,
       |           row_number() OVER (PARTITION BY t.qid ORDER BY t.adc ASC, t.id) AS rank
       |    FROM (
       |      SELECT p.qid, r.id,
       |             s0qd.ds + s1qd.ds + s2qd.ds + s3qd.ds AS adc
       |      FROM res r
       |      JOIN probe p ON p.cell = r.cell AND r.id <> p.qid
       |      JOIN s0asg a0 ON a0.id = r.id
       |      JOIN s0qd ON s0qd.qid = p.qid AND s0qd.pcell = r.cell AND s0qd.bcell = a0.cell
       |      JOIN s1asg a1 ON a1.id = r.id
       |      JOIN s1qd ON s1qd.qid = p.qid AND s1qd.pcell = r.cell AND s1qd.bcell = a1.cell
       |      JOIN s2asg a2 ON a2.id = r.id
       |      JOIN s2qd ON s2qd.qid = p.qid AND s2qd.pcell = r.cell AND s2qd.bcell = a2.cell
       |      JOIN s3asg a3 ON a3.id = r.id
       |      JOIN s3qd ON s3qd.qid = p.qid AND s3qd.pcell = r.cell AND s3qd.bcell = a3.cell
       |    ) t) ranked
       |  WHERE rank <= 10)""".stripMargin
  }

  /** emb_semantic_prune oracle: retrain the √n-cell quantizer with the
    * same md5-ordered sample + sequential Lloyd folds as the IVF oracle
    * (cell count a scalar subquery so it tracks the corpus), assign the
    * corpus, prune min-id-survivor within cells at cosine ≥ 0.3. */
  private def semanticPruneSql: String = {
    val iters = (1 to 5).map(lloydIterSql).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |nn AS (SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS INT)) AS nl FROM e),
       |smp AS (
       |  SELECT v, rk FROM (
       |    SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |    FROM e) s
       |  WHERE rk <= 4096),
       |init AS (
       |  SELECT c, cell FROM (
       |    SELECT v AS c, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
       |      SELECT v, rk, row_number() OVER (PARTITION BY v ORDER BY rk) AS dup FROM smp) d
       |    WHERE dup = 1) x
       |  WHERE cell < (SELECT nl FROM nn)),
       |$iters,
       |asg AS (
       |  SELECT id, v, cell FROM (
       |    SELECT e.vec_id AS id, e.v, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY ${d2Sql("e.v", "c.c")}, c.cell) AS w
       |    FROM e CROSS JOIN c5 c) z
       |  WHERE w = 1),
       |pruned AS (
       |  SELECT DISTINCT b.cell, b.id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
       |  WHERE ${dotSql("a.v", "b.v")} / (${nrmSql("a.v")} * ${nrmSql("b.v")}) >= 0.3)""".stripMargin
  }

  /** sim_ndcg oracle: the sim_bruteforce ranking, label-match relevance,
    * and the SAME driver-embedded integer DCG weights. */
  private def ndcgSql: String = {
    val wList = DcgWfp.mkString("[", ", ", "]")
    val cumList = DcgCumFp.mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel FROM e
       |      WHERE vec_id < 10),
       |top AS (
       |  SELECT qid, vec_id AS id, rank FROM (
       |    SELECT q.qid, e.vec_id,
       |           row_number() OVER (PARTITION BY q.qid
       |             ORDER BY list_dot_product(qv, v) /
       |                      (sqrt(list_dot_product(v, v)) *
       |                       sqrt(list_dot_product(qv, qv))) DESC,
       |                      e.vec_id) AS rank
       |    FROM e, q WHERE e.vec_id <> q.qid) t
       |  WHERE rank <= 10),
       |nl AS (SELECT label, count(*) AS n_lbl FROM e GROUP BY 1),
       |sc AS (SELECT t.qid, t.rank,
       |              CASE WHEN el.label = q.qlabel THEN 1 ELSE 0 END AS rel
       |       FROM top t JOIN e el ON el.vec_id = t.id
       |            JOIN q ON q.qid = t.qid),
       |pq AS (SELECT qid,
       |              CAST(sum(CASE WHEN rel = 1 THEN ($wList)[rank]
       |                            ELSE 0 END) AS BIGINT) AS dcg_fp,
       |              COALESCE(max(CASE WHEN rel = 1
       |                                THEN 1000000000000 // rank END),
       |                       0) AS mrr_fp,
       |              CAST(sum(rel) AS BIGINT) AS hits
       |       FROM sc GROUP BY 1)
       |SELECT p.qid,
       |       CAST(nl.n_lbl - 1 AS BIGINT) AS n_rel,
       |       p.hits,
       |       round(CASE WHEN nl.n_lbl - 1 <= 0 THEN 0.0
       |                  ELSE p.dcg_fp::DOUBLE /
       |                       (($cumList)[greatest(least(nl.n_lbl - 1, 10), 1)])::DOUBLE
       |             END, 4) AS ndcg,
       |       round(p.mrr_fp::DOUBLE / 1e12, 4) AS mrr,
       |       round(p.hits::DOUBLE / 10.0, 4) AS p_at_10
       |FROM pq p JOIN q ON q.qid = p.qid JOIN nl ON nl.label = q.qlabel
       |ORDER BY p.qid""".stripMargin
  }

  /** sim_abt_overlap oracle: the power chain, the integer projection,
    * both cosine rankings and the overlap/precision rollup. */
  private def abtOverlapSql(iters: Int): String = {
    def rank(xt: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, vec_id AS id, rank FROM (
         |    SELECT qb.qid, xb.vec_id,
         |           row_number() OVER (PARTITION BY qb.qid
         |             ORDER BY list_dot_product(qb.va, xb.va) /
         |                      (sqrt(list_dot_product(xb.va, xb.va)) *
         |                       sqrt(list_dot_product(qb.va, qb.va))) DESC,
         |                      xb.vec_id) AS rank
         |    FROM $xt xb,
         |         (SELECT vec_id AS qid, va FROM $xt WHERE vec_id < 10) qb
         |    WHERE xb.vec_id <> qb.qid) t
         |  WHERE rank <= 10)""".stripMargin
    s"""WITH ${topPcChainSql(iters)},
       |vt AS MATERIALIZED (
       |  SELECT j, CAST(v // 1024 AS BIGINT) AS t FROM v$iters),
       |vtl AS MATERIALIZED (
       |  SELECT list(t ORDER BY j) AS l, CAST(sum(t * t) AS BIGINT) AS vv
       |  FROM vt),
       |xa AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS va
       |  FROM embeddings),
       |q1 AS (
       |  SELECT q0.vec_id, q0.label, q0.q, vtl.l, vtl.vv,
       |         CAST(list_sum(list_transform(q0.q, (e, i) -> e * vtl.l[i]))
       |              AS BIGINT) AS xv
       |  FROM (SELECT vec_id, label,
       |               list_transform(embedding,
       |                 e -> CAST(floor(e::DOUBLE * 1048576.0) AS BIGINT)) AS q
       |        FROM embeddings WHERE embedding IS NOT NULL) q0, vtl),
       |xb AS MATERIALIZED (
       |  SELECT vec_id, label,
       |         list_transform(q, (e, i) -> CAST(e * vv - xv * l[i] AS DOUBLE))
       |           AS va
       |  FROM q1),
       |${rank("xa", "ta")},
       |${rank("xb", "tb")},
       |ql AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
       |       WHERE vec_id < 10),
       |ov AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_overlap
       |       FROM ta a JOIN tb b ON a.qid = b.qid AND a.id = b.id
       |       GROUP BY 1),
       |pa AS (SELECT t.qid,
       |              CAST(sum(CASE WHEN el.label = q.qlabel THEN 1 ELSE 0 END)
       |                   AS BIGINT) AS hits_orig
       |       FROM ta t JOIN xa el ON el.vec_id = t.id
       |            JOIN ql q ON q.qid = t.qid GROUP BY 1),
       |pb AS (SELECT t.qid,
       |              CAST(sum(CASE WHEN el.label = q.qlabel THEN 1 ELSE 0 END)
       |                   AS BIGINT) AS hits_abt
       |       FROM tb t JOIN xa el ON el.vec_id = t.id
       |            JOIN ql q ON q.qid = t.qid GROUP BY 1)
       |SELECT q.qid, CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |       pa.hits_orig, pb.hits_abt
       |FROM ql q LEFT JOIN ov ON ov.qid = q.qid
       |     JOIN pa ON pa.qid = q.qid JOIN pb ON pb.qid = q.qid
       |ORDER BY q.qid""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "emb_top_pc" -> topPcSql(iters = 8),
    "sim_ndcg" -> ndcgSql,
    "sim_abt_overlap" -> abtOverlapSql(iters = 8),
    "sim_ivf_cells" ->
      s"""$ivfSql
         |SELECT cell, count(*) AS n_members,
         |       round(count(*) * 1.0 / (SELECT count(*) FROM asg), 4) AS share
         |FROM asg GROUP BY 1 ORDER BY 1""".stripMargin,
    "emb_semantic_prune" ->
      s"""$semanticPruneSql
         |SELECT a.cell, count(*) AS n_members,
         |       CAST(count(p.id) AS BIGINT) AS n_pruned,
         |       round((count(*) - count(p.id)) * 1.0 / count(*), 4) AS keep_frac
         |FROM asg a LEFT JOIN pruned p ON a.cell = p.cell AND a.id = p.id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_pq_topk" ->
      s"""$pqSql
         |SELECT qid, id, rank, round(adc, 4) AS adc FROM pq ORDER BY qid, rank""".stripMargin,
    "sim_ivfpq_topk" ->
      s"""$ivfPqSql
         |SELECT qid, id, rank, round(adc, 4) AS adc FROM ivfpq ORDER BY qid, rank""".stripMargin,
    "sim_ivfpq_recall" ->
      s"""$ivfPqSql,
         |exact AS MATERIALIZED (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${d2Sql("e.v", "q.qv")} ASC, e.vec_id) AS rank
         |    FROM e CROSS JOIN qv q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN ivfpq a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_pq_recall" ->
      s"""$pqSql,
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${d2Sql("e.v", "q.qv")} ASC, e.vec_id) AS rank
         |    FROM e CROSS JOIN qv q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN pq a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_ivf_topk" ->
      s"""$ivfSql
         |SELECT qid, id, rank, round(sim, 4) AS sim FROM ivf ORDER BY qid, rank""".stripMargin,
    "sim_ivf_topk_f32" ->
      s"""$ivfF32Sql
         |SELECT qid, id, rank, round(sim, 4) AS sim FROM ivf ORDER BY qid, rank""".stripMargin,
    "sim_ivf_recall" ->
      s"""$ivfSql,
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${dotSql("e.v", "q.qv")} / (${nrmSql("e.v")} * ${nrmSql("q.qv")}) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN qv q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN ivf a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_binary_topk" ->
      s"""$binaryTopKSql
         |SELECT qid, id, rank, round(sim, 4) AS sim FROM bin ORDER BY qid, rank""".stripMargin,
    "sim_binary_recall" ->
      s"""$binaryTopKSql,
         |qv2 AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${dotSql("e.v", "q.qv")} / (${nrmSql("e.v")} * ${nrmSql("q.qv")}) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN qv2 q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN bin a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_rp_recall" ->
      s"""WITH pl AS (SELECT ${planesLit(16, 64)}::DOUBLE[][] AS m),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT vec_id,
         |        list_transform(generate_series(1, 16),
         |          pp -> list_reduce(list_transform(generate_series(1, 64),
         |                  j -> v[j]*pl.m[pp][j]), (a,b)->a+b)) AS y
         |      FROM e CROSS JOIN pl),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |qp AS (SELECT vec_id AS qid, y AS qy FROM p WHERE vec_id < 10),
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${dotSql("e.v", "q.qv")} / (${nrmSql("e.v")} * ${nrmSql("q.qv")}) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10),
         |rp AS (
         |  SELECT qid, id FROM (
         |    SELECT qq.qid, p.vec_id AS id,
         |           row_number() OVER (PARTITION BY qq.qid ORDER BY
         |             ${dotSql("p.y", "qq.qy", 16)} / (${nrmSql("p.y", 16)} * ${nrmSql("qq.qy", 16)}) DESC,
         |             p.vec_id) AS rank
         |    FROM p CROSS JOIN qp qq WHERE p.vec_id <> qq.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN rp a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_int8_topk" ->
      s"""$int8TopKSql
         |SELECT qid, id, rank, round(sim, 4) AS sim FROM i8 ORDER BY qid, rank""".stripMargin,
    "sim_mmr_rerank" -> mmrSql,
    "sim_ivf_topk_i8" ->
      s"""$ivfI8Sql
         |SELECT qid, id, rank, round(sim, 4) AS sim FROM ivf ORDER BY qid, rank""".stripMargin,
    "sim_int8_recall" ->
      s"""$int8TopKSql,
         |qv2 AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${dotSql("e.v", "q.qv")} / (${nrmSql("e.v")} * ${nrmSql("q.qv")}) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN qv2 q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN i8 a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_truncated_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${dotSql("e.v", "q.qv")} / (${nrmSql("e.v")} * ${nrmSql("q.qv")}) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10),
         |tr AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             ${dotSql("e.v", "q.qv", 16)} / (${nrmSql("e.v", 16)} * ${nrmSql("q.qv", 16)}) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN tr a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "emb_near_dups" ->
      s"""WITH pl AS (SELECT ${planesLit(4, 64)}::DOUBLE[][] AS p),
         |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings WHERE embedding IS NOT NULL),
         |s AS (SELECT id, v, ${nrmSql("v")} AS nrm,
         |        CAST(list_sum(list_transform(generate_series(1, 4),
         |          i -> CASE WHEN ${dotSql("v", "pl.p[i]")} >= 0
         |               THEN (1::BIGINT << (i-1)) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
         |      FROM e CROSS JOIN pl)
         |SELECT id_a, id_b, round(c, 4) AS cosine FROM (
         |  SELECT a.id AS id_a, b.id AS id_b, ${dotSql("a.v", "b.v")}/(a.nrm*b.nrm) AS c
         |  FROM s a JOIN s b ON a.bucket = b.bucket AND a.id < b.id)
         |WHERE c >= 0.25
         |ORDER BY round(c, 4) DESC, id_a, id_b LIMIT 100""".stripMargin,
    "sim_lsh_topk" ->
      s"""$lshTopKSql
         |SELECT qid, id, rank, round(sim, 4) AS sim FROM lsh ORDER BY qid, rank""".stripMargin,
    "sim_lsh_recall" ->
      s"""$lshTopKSql,
         |qe AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, e.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             list_dot_product(q.qv, e.v) /
         |               (sqrt(list_dot_product(e.v, e.v))*sqrt(list_dot_product(q.qv, q.qv))) DESC,
         |             e.vec_id) AS rank
         |    FROM e CROSS JOIN qe q WHERE e.vec_id <> q.qid) t
         |  WHERE rank <= 10)
         |SELECT x.qid,
         |       CAST(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       round(sum(CASE WHEN a.id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 2) AS recall_at_10
         |FROM exact x LEFT JOIN lsh a ON x.qid = a.qid AND x.id = a.id
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "sim_label_centroids" ->
      """WITH ex AS (
        |  SELECT label, r.range AS i, CAST(embedding[r.range] AS DOUBLE) AS x
        |  FROM embeddings, range(1, 65) r
        |), sums AS (SELECT label, i, sum(x) AS s2 FROM ex GROUP BY label, i)
        |SELECT label, round(sqrt(sum(s2 * s2)), 4) AS centroid_norm
        |FROM sums GROUP BY label ORDER BY label""".stripMargin,
    "sim_quantized_error" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS mabs FROM e),
        |s AS (SELECT label, v, 127.0 / mabs AS scale FROM m WHERE mabs > 0),
        |q AS (SELECT label, v, scale, list_transform(v, x -> round(x * scale)) AS qv FROM s),
        |mse AS (
        |  SELECT label,
        |         list_sum(list_transform(generate_series(1, len(v)),
        |           i -> pow(v[i] - qv[i] / scale, 2))) / len(v) AS mse
        |  FROM q)
        |SELECT label, round(avg(mse), 9) AS avg_mse FROM mse GROUP BY label ORDER BY label""".stripMargin,
    "sim_vector_stats" ->
      """SELECT label,
        |       round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_d1,
        |       round(avg(CAST(embedding[64] AS DOUBLE)), 4) AS avg_d64,
        |       round(max(CAST(embedding[1] AS DOUBLE)), 4) AS max_d1,
        |       count(*) AS n
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "sim_bruteforce_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10)
        |SELECT qid, vec_id AS id, rank, round(sim, 4) AS sim FROM (
        |  SELECT qid, vec_id,
        |         list_dot_product(qv, v) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY list_dot_product(qv, v) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) DESC,
        |                    vec_id) AS rank
        |  FROM e, q WHERE vec_id <> qid) t
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "sim_threshold_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 20 = 0)
        |SELECT qid, vec_id AS id, round(sim, 4) AS sim FROM (
        |  SELECT qid, vec_id,
        |         list_dot_product(qv, v) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY list_dot_product(qv, v) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) DESC,
        |                    vec_id) AS rank
        |  FROM e, q WHERE vec_id <> qid) t
        |WHERE rank <= 3 AND sim >= 0.2 ORDER BY qid, id""".stripMargin,
    "emb_centroid_outliers" ->
      """WITH ex AS (
        |  SELECT label, vec_id, r.range AS i,
        |         CAST(embedding[r.range] AS DOUBLE) AS x
        |  FROM embeddings, range(1, 65) r),
        |cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |dist AS (
        |  SELECT ex.label, ex.vec_id, sqrt(sum((x - c) * (x - c))) AS d
        |  FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
        |  GROUP BY 1, 2),
        |lim AS (SELECT label, avg(d) AS avg_d FROM dist GROUP BY 1)
        |SELECT dist.label, count(*) AS n,
        |       CAST(sum(CASE WHEN d > 1.02 * avg_d THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers,
        |       round(avg(d), 4) AS avg_dist
        |FROM dist JOIN lim ON dist.label = lim.label
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "emb_kmeans" -> kmeansSql(k = 8, iters = 25),
    "emb_kmeans_f32" -> kmeansF32Sql(k = 8, iters = 25),
    "emb_kmeans_kpar" -> kmeansKparSql(k = 8, iters = 25, rounds = 3, l = 16),
    "emb_cluster_sample" -> clusterSampleSql(k = 8, iters = 25, m = 3),
    "sim_ivf_append" -> ivfAppendSql
  )

  /** emb_cluster_sample oracle: the [[kmeansSql]] pipeline's final
    * assignment (a converged engine run lands on the same rows — fixed
    * point), then per-cell row_number over the identical
    * `md5(id) || ':' || id` pick key, ≤ m. */
  private def clusterSampleSql(k: Int, iters: Int, m: Int): String =
    s"""${kmeansPrefixSql(k, iters)}
       |SELECT CAST(cell AS INT) AS cell, CAST(rnk AS INT) AS rnk, id AS vec_id
       |FROM (SELECT cell, id,
       |             row_number() OVER (PARTITION BY cell
       |               ORDER BY md5(CAST(id AS VARCHAR)) || ':' || CAST(id AS VARCHAR)) AS rnk
       |      FROM a$iters)
       |WHERE rnk <= $m
       |ORDER BY cell, rnk""".stripMargin

  /** sim_ivf_append oracle: the [[ivfSql]] pipeline with the sample —
    * and hence the quantizer — restricted to the BASE corpus
    * (vec_id % 5 != 0), then base ∪ delta assigned against it; per-cell
    * base/new splits by id class. */
  private def ivfAppendSql: String = {
    val iters = (1 to 5).map(lloydIterSql).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |smp AS (
       |  SELECT v, rk FROM (
       |    SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |    FROM e WHERE vec_id % 5 <> 0) s
       |  WHERE rk <= 4096),
       |init AS (
       |  SELECT c, cell FROM (
       |    SELECT v AS c, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
       |      SELECT v, rk, row_number() OVER (PARTITION BY v ORDER BY rk) AS dup FROM smp) d
       |    WHERE dup = 1) x
       |  WHERE cell < 16),
       |$iters,
       |asg AS (
       |  SELECT id, cell FROM (
       |    SELECT e.vec_id AS id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY ${d2Sql("e.v", "c.c")}, c.cell) AS w
       |    FROM e CROSS JOIN c5 c) z
       |  WHERE w = 1)
       |SELECT CAST(cell AS INT) AS cell,
       |       count(*) FILTER (WHERE id % 5 <> 0) AS n_base,
       |       count(*) FILTER (WHERE id % 5 = 0) AS n_new,
       |       count(*) AS n_total,
       |       round(count(*) * 1.0 / (SELECT count(*) FROM asg), 4) AS share
       |FROM asg GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Squared L2 between a quantized corpus vector and an exact-integer
    * centroid state (sums `s`, count `n`): the same row-local double ops,
    * in the same left-to-right dimension order, as the engine's
    * `Similarity.kmeansReport` argmin. */
  private def kmD2Sql(x: String, s: String, n: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), j -> " +
      s"(CAST($x[j] AS DOUBLE) - CAST($s[j] AS DOUBLE)/CAST($n AS DOUBLE)) * " +
      s"(CAST($x[j] AS DOUBLE) - CAST($s[j] AS DOUBLE)/CAST($n AS DOUBLE))), " +
      "(a,b) -> a+b)"

  /** One unrolled full-corpus k-means round: first-wins argmin against
    * the previous exact state, exact integer per-dim sums + count +
    * Σ|x|² per cell, empty cells carrying the previous state forward. */
  private def kmeansIterSql(i: Int): String = {
    val prev = s"c${i - 1}"
    s"""a$i AS MATERIALIZED (
       |  SELECT id, q, cell FROM (
       |    SELECT e.id, e.q, c.cell,
       |           row_number() OVER (PARTITION BY e.id ORDER BY ${kmD2Sql("e.q", "c.s", "c.n")}, c.cell) AS w
       |    FROM e CROSS JOIN $prev c) z
       |  WHERE w = 1),
       |g$i AS MATERIALIZED (
       |  SELECT cell, list(sd ORDER BY j) AS s FROM (
       |    SELECT cell, jj.j AS j, CAST(sum(q[jj.j]) AS BIGINT) AS sd
       |    FROM a$i CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) jj
       |    GROUP BY cell, jj.j) t
       |  GROUP BY cell),
       |h$i AS MATERIALIZED (
       |  SELECT cell, count(*) AS n,
       |         CAST(sum(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS BIGINT) AS ss
       |  FROM a$i GROUP BY cell),
       |c$i AS MATERIALIZED (
       |  SELECT p.cell, COALESCE(g.s, p.s) AS s, COALESCE(h.n, p.n) AS n
       |  FROM $prev p LEFT JOIN g$i g ON p.cell = g.cell
       |                LEFT JOIN h$i h ON p.cell = h.cell)""".stripMargin
  }

  /** emb_kmeans oracle: quantize to `floor(x·2^20 + 0.5)` integers,
    * init from the k distinct md5-ordered vectors, unroll all `iters`
    * rounds (a converged engine state is a fixed point, so the capped
    * unroll reproduces a detected early stop exactly), report nonempty
    * cells of the final assignment via Σ|x−m|² = Σ|x|² − |s|²/n. */
  private def kmeansPrefixSql(k: Int, iters: Int): String =
    kmeansPrefixSqlFrom(k, iters, "x")

  /** `xExpr` maps each raw double element before quantization — "x" for
    * the plain path, the FLOAT round trip for the packed-f32 path. */
  private def kmeansPrefixSqlFrom(k: Int, iters: Int, xExpr: String): String = {
    val rounds = (1 to iters).map(kmeansIterSql).mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |                        x -> CAST(floor(($xExpr) * 1048576.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |e AS MATERIALIZED (SELECT vec_id AS id, q FROM e0),
       |smp AS (
       |  SELECT q, rk FROM (
       |    SELECT q, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |    FROM e0) s
       |  WHERE rk <= 512),
       |c0 AS (
       |  SELECT cell, s, CAST(1 AS BIGINT) AS n FROM (
       |    SELECT q AS s, row_number() OVER (ORDER BY rk) - 1 AS cell FROM (
       |      SELECT q, rk, row_number() OVER (PARTITION BY q ORDER BY rk) AS dup FROM smp) d
       |    WHERE dup = 1) x
       |  WHERE cell < $k),
       |$rounds""".stripMargin
  }

  /** Exact integer squared distance between two quantized vectors —
    * BIGINT arithmetic, bit-for-bit the engine's zip_with fold. */
  private def kmD2IntSql(x: String, c: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), j -> " +
      s"($x[j] - $c[j]) * ($x[j] - $c[j])), (a,b) -> a+b)"

  /** emb_kmeans_kpar init prefix: the deterministic k-means‖ replay.
    * Round r keeps the `l` rows smallest in u/d² (md5-derived uniform u,
    * exact integer d² to the candidate set), candidates are weighted by
    * first-wins assignment counts, and k seeds come from an unrolled
    * greedy weighted k-center (HUGEINT scores ≙ the engine's BigInt).
    * Produces the same c0 shape the Lloyd-round unroll consumes.
    * EVERY chained CTE is MATERIALIZED (the trussSql lesson): kch_j is
    * referenced three times per greedy level (candidate join, NOT IN,
    * union), so default inlining re-expands the whole prefix 3^k-fold —
    * measured 453 s at sf0.01 (500 vectors!) before pinning. */
  private def kmeansKparPrefixSql(k: Int, iters: Int, rounds: Int,
                                  l: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val off = 1 + (r - 1) * l
      s"""kd$r AS MATERIALIZED (
         |  SELECT hh.id, min(${kmD2IntSql("hh.q", "c.q")}) AS d2
         |  FROM hh CROSS JOIN kp${r - 1} c GROUP BY hh.id),
         |ks$r AS MATERIALIZED (
         |  SELECT hh.q,
         |         CAST($off AS BIGINT) + row_number() OVER (
         |           ORDER BY hh.u / CAST(d.d2 AS DOUBLE), hh.h, hh.id) - 1 AS ord
         |  FROM kd$r d JOIN hh USING (id)
         |  WHERE d.d2 > 0
         |  QUALIFY ord < $off + $l),
         |kp$r AS MATERIALIZED (SELECT * FROM kp${r - 1} UNION ALL SELECT q, ord FROM ks$r)""".stripMargin
    }.mkString(",\n")
    val greedy = (2 to k).map { j =>
      s"""kg$j AS MATERIALIZED (
         |  SELECT w2.ord, w2.q, CAST(${j - 1} AS BIGINT) AS cell FROM (
         |    SELECT w.ord,
         |           CAST(any_value(w.w) AS HUGEINT) *
         |             min(${kmD2IntSql("w.q", "c.q")}) AS score
         |    FROM kwgt w CROSS JOIN kch${j - 1} c
         |    WHERE w.ord NOT IN (SELECT ord FROM kch${j - 1})
         |    GROUP BY w.ord
         |    ORDER BY score DESC, w.ord LIMIT 1) t JOIN kwgt w2 ON t.ord = w2.ord),
         |kch$j AS MATERIALIZED (SELECT * FROM kch${j - 1} UNION ALL SELECT ord, q, cell FROM kg$j)""".stripMargin
    }.mkString(",\n")
    val lloydRounds = (1 to iters).map(kmeansIterSql).mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |                        x -> CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |e AS MATERIALIZED (SELECT vec_id AS id, q FROM e0),
       |hh AS MATERIALIZED (
       |  SELECT vec_id AS id, q, md5(CAST(vec_id AS VARCHAR)) AS h,
       |         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE AS u
       |  FROM e0),
       |kp0 AS MATERIALIZED (SELECT q, CAST(0 AS BIGINT) AS ord FROM (
       |  SELECT q, row_number() OVER (ORDER BY h, id) AS rk FROM hh) z WHERE rk = 1),
       |$roundCtes,
       |kasn AS MATERIALIZED (
       |  SELECT id, ord FROM (
       |    SELECT hh.id, c.ord,
       |           row_number() OVER (PARTITION BY hh.id
       |             ORDER BY ${kmD2IntSql("hh.q", "c.q")}, c.ord) AS rw
       |    FROM hh CROSS JOIN kp$rounds c) z
       |  WHERE rw = 1),
       |kwgt AS MATERIALIZED (
       |  SELECT c.ord, c.q, COALESCE(a.w, CAST(0 AS BIGINT)) AS w
       |  FROM kp$rounds c LEFT JOIN
       |    (SELECT ord, count(*) AS w FROM kasn GROUP BY ord) a USING (ord)),
       |kch1 AS MATERIALIZED (SELECT ord, q, CAST(0 AS BIGINT) AS cell FROM (
       |  SELECT ord, q FROM kwgt ORDER BY w DESC, ord LIMIT 1) t),
       |$greedy,
       |c0 AS MATERIALIZED (SELECT cell, q AS s, CAST(1 AS BIGINT) AS n FROM kch$k),
       |$lloydRounds""".stripMargin
  }

  private def kmeansKparSql(k: Int, iters: Int, rounds: Int, l: Int): String = {
    s"""${kmeansKparPrefixSql(k, iters, rounds, l)}
       |SELECT CAST(g.cell AS INT) AS cell, h.n AS n,
       |       round(sqrt(list_reduce(list_transform(g.s,
       |           sd -> (CAST(sd AS DOUBLE)/CAST(h.n AS DOUBLE)) * (CAST(sd AS DOUBLE)/CAST(h.n AS DOUBLE))),
       |           (a,b) -> a+b)) / 1048576.0, 4) AS norm,
       |       round((CAST(h.ss AS DOUBLE) - list_reduce(list_transform(g.s,
       |           sd -> CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)), (a,b) -> a+b) / CAST(h.n AS DOUBLE))
       |         / (CAST(h.n AS DOUBLE) * 1048576.0 * 1048576.0), 6) AS mse
       |FROM g$iters g JOIN h$iters h ON g.cell = h.cell
       |ORDER BY cell""".stripMargin
  }

  private def kmeansSql(k: Int, iters: Int): String =
    kmeansSqlFrom(k, iters, "x")

  private def kmeansF32Sql(k: Int, iters: Int): String =
    kmeansSqlFrom(k, iters, "CAST(CAST(x AS FLOAT) AS DOUBLE)")

  private def kmeansSqlFrom(k: Int, iters: Int, xExpr: String): String = {
    s"""${kmeansPrefixSqlFrom(k, iters, xExpr)}
       |SELECT CAST(g.cell AS INT) AS cell, h.n AS n,
       |       round(sqrt(list_reduce(list_transform(g.s,
       |           sd -> (CAST(sd AS DOUBLE)/CAST(h.n AS DOUBLE)) * (CAST(sd AS DOUBLE)/CAST(h.n AS DOUBLE))),
       |           (a,b) -> a+b)) / 1048576.0, 4) AS norm,
       |       round((CAST(h.ss AS DOUBLE) - list_reduce(list_transform(g.s,
       |           sd -> CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)), (a,b) -> a+b) / CAST(h.n AS DOUBLE))
       |         / (CAST(h.n AS DOUBLE) * 1048576.0 * 1048576.0), 6) AS mse
       |FROM g$iters g JOIN h$iters h ON g.cell = h.cell
       |ORDER BY cell""".stripMargin
  }
}
