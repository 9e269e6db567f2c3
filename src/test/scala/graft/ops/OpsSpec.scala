package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup / similarity / text-analysis / multimodal operators. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tonight")
  private val unrelated = "completely different words appear in this other document body text"

  private def docs = Seq(
    (1L, base), (2L, base), (3L, nearDup), (4L, unrelated)
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per fingerprint, whitespace-insensitive") {
    val withWs = Seq((1L, base), (2L, "  " + base.replace(" ", "  ") + " "), (3L, unrelated))
      .toDF("doc_id", "text")
    val survivors = Dedup.exact(withWs, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSeq.sorted
    assert(survivors == Seq(1L, 3L))
  }

  test("minhash LSH surfaces exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containment: an excerpt inside a long doc scores ~1 while its jaccard is low") {
    val long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      base)
    val excerpt = base // wholly contained in `long`
    val d = Seq((1L, excerpt), (2L, long), (3L, unrelated)).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(d, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 2L)))   // excerpt → container, directed
    assert(!r.contains((2L, 1L)))  // container is NOT inside the excerpt
    assert(!r.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment: stop-shingle df cap drops boilerplate from the universe") {
    // 5 docs all share one boilerplate sentence; with maxDf 4 the shared
    // shingles vanish and nothing pairs
    val bp = "standard footer text repeated on every single page here now"
    val d = (1L to 5L).map(i => (i, s"$bp unique token$i")).toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(d, "doc_id", "text",
      threshold = 0.5, maxDf = 4L)
    assert(capped.count() == 0L)
    val uncapped = Dedup.containmentPairs(d, "doc_id", "text",
      threshold = 0.5, maxDf = 5L)
    assert(uncapped.count() > 0L)
  }

  test("norm-join gate: broadcast while small, hash join past the cutoff — never a pair-table sort") {
    // the 100×-rehearsal finding: past the broadcast threshold, the
    // sort-merge default sorts the Σdf² pair relation twice. The gate
    // must pick broadcast below 2²¹ MEASURED docs, SHUFFLE_HASH above,
    // and NO hint at all when the size is unknown (docRows <= 0) — a
    // forced broadcast on an unmeasured corpus is a driver-memory bet;
    // AQE decides from the runtime size instead. Big-corpus plan must
    // contain a ShuffledHashJoin and NO SortMergeJoin.
    assert(Dedup.normJoinHint(0L).isEmpty)
    assert(Dedup.normJoinHint(-1L).isEmpty)
    assert(Dedup.normJoinHint(1L) == Some("broadcast"))
    assert(Dedup.normJoinHint(1L << 21) == Some("broadcast"))
    assert(Dedup.normJoinHint((1L << 21) + 1) == Some("shuffle_hash"))
    val d = Seq((1L, "w1 w2 w3"), (2L, "w1 w2 w4")).toDF("doc_id", "text")
    def plan(rows: Long) = Dedup.cosinePairsTf(
        d, "doc_id", "text", n = 1, threshold = 0.5, maxDf = 128L,
        docRows = rows)
      .queryExecution.executedPlan.toString
    val big = plan(3000000L)
    assert(big.contains("ShuffledHashJoin"), big.take(2000))
    assert(!big.contains("SortMergeJoin"), big.take(2000))
    assert(plan(0L).contains("BroadcastHashJoin"))
    // same gate, same guarantees on the containment side
    val cBig = Dedup.containmentPairs(d, "doc_id", "text",
        threshold = 0.1, maxDf = 128L, docRows = 3000000L)
      .queryExecution.executedPlan.toString
    assert(cBig.contains("ShuffledHashJoin") && !cBig.contains("SortMergeJoin"),
      cBig.take(2000))
  }

  test("tf-cosine: repetition separates docs whose token SETS are identical") {
    // same vocabulary {w1, w2}; B repeats w1 4× → jaccard(sets) = 1 but
    // cos² = (1·4 + 1·1)² / ((1+1)(16+1)) = 25/34 ≈ 0.735, cos ≈ 0.857
    val d = Seq((1L, "w1 w2"), (2L, "w1 w1 w1 w1 w2"),
      (3L, "other words entirely")).toDF("doc_id", "text")
    val r = Dedup.cosinePairsTf(d, "doc_id", "text", n = 1, threshold = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r.isEmpty) // 0.735 < 0.81: the repetition keeps them apart
    val loose = Dedup.cosinePairsTf(d, "doc_id", "text", n = 1, threshold = 0.8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // floor(25e12 / 34) — exact integer fixed point
    assert(loose == Set((1L, 2L, 5L, 735294117647L)))
  }

  test("tf-cosine: identical docs score exactly 1e12; df cap drops boilerplate") {
    val d = Seq((1L, base), (2L, base), (3L, unrelated)).toDF("doc_id", "text")
    val r = Dedup.cosinePairsTf(d, "doc_id", "text", n = 1, threshold = 0.99)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.map(p => (p._1, p._2, p._4)).toSeq == Seq((1L, 2L, 1000000000000L)))
    // 5 docs share a boilerplate phrase; df cap 4 removes the shared
    // tokens from the universe and nothing pairs
    val bp = "standard footer text repeated on every single page"
    val bpd = (1L to 5L).map(i => (i, s"$bp token$i")).toDF("doc_id", "text")
    assert(Dedup.cosinePairsTf(bpd, "doc_id", "text",
      n = 1, threshold = 0.5, maxDf = 4L).count() == 0L)
    assert(Dedup.cosinePairsTf(bpd, "doc_id", "text",
      n = 1, threshold = 0.5, maxDf = 5L).count() > 0L)
  }

  test("tf-cosine buckets/norms are persisted and retire with the consuming action") {
    // round-12 ADVICE: the PlanBudgetSpec string-count pin (2→12) can no
    // longer detect a dropped cache, so pin it directly — the optimized
    // plan must read the lazily persisted buckets/norms subtrees through
    // InMemoryRelation, and (round-13 verdict item #1) the generation
    // must be GONE once the consuming action completes, not parked until
    // the next invocation.
    val d = Seq((1L, base), (2L, base + " extra tail"), (3L, unrelated))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    def newIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    val r = Dedup.cosinePairsTf(d, "doc_id", "text", threshold = 0.3)
    assert(r.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "cosinePairsTf lost its buckets/norms persists")
    r.count() // the consuming action
    val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
    while (newIds.nonEmpty && System.nanoTime < deadline) Thread.sleep(25)
    assert(newIds.isEmpty,
      s"buckets/norms generation survived its consuming action: $newIds")
  }

  test("tf-cosine pairs are layout-invariant") {
    val d = Seq((1L, base), (2L, base + " extra tail"), (3L, unrelated),
      (4L, nearDup)).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.cosinePairsTf(df, "doc_id", "text", threshold = 0.3)
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(d.repartition(1)) == run(d.repartition(7)))
  }

  test("containment pairs are layout-invariant") {
    val long = base + " plus more trailing words to grow the container document"
    val d = Seq((1L, base), (2L, long), (3L, unrelated), (4L, base)).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.3)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(run(d.repartition(1)) == run(d.repartition(7)))
  }

  test("prefix-filtering candidates are lossless: every jaccard>=t pair survives") {
    // brute-force truth: all pairs with jaccard >= 0.5
    val n = docs.count().toInt
    val all = (for (a <- 1 to n; b <- a + 1 to n) yield (a.toLong, b.toLong))
      .toDF("id_a", "id_b")
    val truth = Dedup.jaccardVerify(all, docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty) // (1,2) identical at least
    val got = Dedup.jaccardVerify(
        Dedup.prefixJaccardCandidates(docs, "doc_id", "text", threshold = 0.5),
        docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == truth)
  }

  test("prefix filtering excludes globally-hot shingles from candidate generation") {
    // every doc shares one hot phrase; each also has a unique rare tail.
    // At t=0.9 the prefix is 1 shingle — the rarest — so the hot shingle
    // generates no candidate pairs at all (the skew defense).
    val hot = Seq.tabulate(6)(i => (i.toLong, s"alpha beta gamma unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    val cands = Dedup.prefixJaccardCandidates(hot, "doc_id", "text", threshold = 0.9)
    assert(cands.count() == 0)
  }

  test("winnowing: any shared substring of length >= w+k-1 yields a shared fingerprint") {
    import graft.ops.TextAnalysis.winnowFingerprints
    val sharedRun = "zqxjvkwpyf" + "mntbgd" // 16 chars >= w+k-1 = 15 for k=8, w=8
    val df = Seq(
      (1L, "aaaa" + sharedRun + "bbbb"),
      (2L, "cccccccc" + sharedRun + "dddd"),
      (3L, "totally unrelated content here with no common run at all")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        winnowFingerprints(col("text"), 8, 8).as("fps"))
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert(fps(1L).intersect(fps(3L)).isEmpty)
  }

  test("winnowing: short texts fingerprint to the empty set, never a phantom") {
    import graft.ops.TextAnalysis.winnowFingerprints
    val df = Seq((1L, "short"), (2L, ""), (3L, "exactly8")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), winnowFingerprints(col("text"), 8, 8).as("fps"))
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.size).toMap
    assert(got(1L) == 0)
    assert(got(2L) == 0)
    assert(got(3L) == 1) // single k-gram -> single window minimum
  }

  test("prefix candidate plan is an equi-join on the shingle, never a cross product") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      Dedup.prefixJaccardCandidates(docs, "doc_id", "text", threshold = 0.5)).toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("jaccard verify: identical docs = 1.0, disjoint docs ≈ 0") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("simhash: identical docs have hamming 0 and pair up") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 0))
  }

  test("brute-force cosine top-k: identical vector ranks first with sim 1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", "vec_id", "embedding", k = 2)
      .select("id", "rank", "sim").as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(top.head._1 == 1L && math.abs(top.head._3 - 1.0) < 1e-12)
    assert(top(1)._1 == 2L)
  }

  test("LSH ANN finds the identical vector (recall sanity)") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    } :+ (100L, Array.tabulate(8)(d => math.sin(0 * 8 + d).toFloat)) // clone of vec 0
    val emb = vecs.toDF("vec_id", "embedding")
    val top = Similarity.lshTopK(emb, emb.filter(col("vec_id") === 100L),
      "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .select("id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(top.nonEmpty && top.head._1 == 0L)
  }

  test("near-dup clustering: transitive pairs collapse to min-id clusters") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L &&
      clusters(9L) == 1L) // 9-3-2-1 transitively linked
    assert(clusters(5L) == 5L && clusters(6L) == 5L)
  }

  test("near-dup clustering: distributed propagation path agrees with union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val driver = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.nearDupClusters(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == driver)
    assert(dist(4L) == 1L && dist(8L) == 7L)
  }

  test("near-dup clustering preserves non-numeric id types on the driver path") {
    val pairs = Seq(("doc-b", "doc-a"), ("doc-c", "doc-b")).toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(String, String)].collect().toMap
    assert(clusters.values.toSet == Set("doc-a"))
  }

  test("IVF ANN finds the identical vector via probed cells") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    } :+ (100L, Array.tabulate(8)(d => math.sin(0 * 8 + d).toFloat)) // clone of 0
    val emb = vecs.toDF("vec_id", "embedding")
    val top = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 100L),
      "vec_id", "embedding", "vec_id", "embedding", k = 3, nlist = 4, nProbe = 2)
      .select("id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(top.nonEmpty && top.head._1 == 0L)
  }

  test("IVF runs a full query workload (whole corpus as queries), no driver collect path") {
    // 300 distinct vectors + 300 exact clones; every clone must find its
    // twin at rank 1 because a query's own cell is always its nearest probe
    val base = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 17 + d * 3).toFloat))
    }
    val clones = base.map { case (i, v) => (i + 1000L, v) }
    val emb = (base ++ clones).toDF("vec_id", "embedding").repartition(4)
    val top = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, nlist = 8, nProbe = 2)
      .select("qid", "id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length == 600 * 3)
    val rank1 = top.filter(_._3 == 1L).map(t => t._1 -> (t._2, t._4)).toMap
    (0 until 300).foreach { i =>
      val (id, sim) = rank1(i.toLong)
      assert(id == i + 1000L, s"query $i should find its clone first, got $id")
      assert(math.abs(sim - 1.0) < 1e-9)
    }
  }

  test("IVF accepts non-numeric qid types (no long cast on the probe path)") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = Seq(("probe-zero", Array.tabulate(8)(d => math.sin(0 + d).toFloat)))
      .toDF("qname", "qemb")
    val top = Similarity.ivfTopK(emb, q, "vec_id", "embedding", "qname", "qemb",
      k = 3, nlist = 4, nProbe = 4)
      .select("qid", "id", "rank").as[(String, Long, Long)].collect().sortBy(_._3)
    assert(top.length == 3)
    assert(top.head._1 == "probe-zero" && top.head._2 == 0L) // exact vector, full probe
  }

  test("IVF output is bit-identical across parallelism layouts") {
    // The quantizer trains on a hash-ordered global sample and assigns
    // cells per-row against a broadcast centroid literal — neither step may
    // depend on how the corpus is partitioned. Run the same search over a
    // 1-partition and a 13-partition layout of the same data.
    val vecs = (0 until 240).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 13 + d * 5).toFloat))
    }
    def run(parts: Int): Seq[(Long, Long, Long, Double)] = {
      val emb = vecs.toDF("vec_id", "embedding").repartition(parts)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 12),
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nlist = 6, nProbe = 2)
        .select("qid", "id", "rank", "sim")
        .as[(Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._3)).toSeq
    }
    val a = run(1)
    val b = run(13)
    assert(a == b, "IVF results diverged across partition layouts")
    assert(a.size == 12 * 5)
  }

  test("PQ gives an exact duplicate vector the minimal ADC in the top-k") {
    // duplicate of vector 0 at id 100: identical subvectors take identical
    // codes, so the duplicate attains the minimal asymmetric distance —
    // other corpus vectors may TIE (quantization collapses near vectors
    // onto the same codes) but none may beat it
    val vecs = (0 until 120).map { i =>
      val src = if (i == 100) 0 else i
      (i.toLong, Array.tabulate(8)(d => math.cos(src * 7 + d * 3).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", "vec_id", "embedding", k = 5, m = 2, ks = 8)
      .select("qid", "id", "rank", "adc")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._3)
    val dup = top.find(_._2 == 100L)
    assert(dup.isDefined, s"duplicate missing from top-k: ${top.toSeq}")
    assert(dup.get._4 == top.head._4, "duplicate ADC is not minimal")
  }

  test("PQ output is bit-identical across parallelism layouts") {
    val vecs = (0 until 240).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 13 + d * 5).toFloat))
    }
    def run(parts: Int): Seq[(Long, Long, Long, Double)] = {
      val emb = vecs.toDF("vec_id", "embedding").repartition(parts)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 12),
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, m = 4, ks = 8)
        .select("qid", "id", "rank", "adc")
        .as[(Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._3)).toSeq
    }
    val a = run(1)
    val b = run(13)
    assert(a == b, "PQ results diverged across partition layouts")
    assert(a.size == 12 * 5)
  }

  test("IVF-PQ ranks an exact duplicate first and is layout-invariant") {
    val vecs = (0 until 80).map(i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 3.7 + d * 1.3)))) :+
      ((999L, Array.tabulate(64)(d => math.sin(5 * 3.7 + d * 1.3)))) // dup of 5
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 5)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqTopK(c, q, "vec_id", "embedding", "vec_id", "embedding",
          k = 5, nlist = 4, nProbe = 2, m = 4, ks = 8)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val r = run(emb)
    // the duplicate shares the query's cell and codes, so its ADC is the
    // pure quantization floor — it must survive into the top-k (ADC is an
    // approximation: another vector's UNDERestimated distance may edge it
    // off rank 1, which is the PQ trade, not a bug)
    assert(r.map(_._2).contains(999L))
    assert(r.head._4 <= r.last._4) // ranked by ascending approximate L2²
    assert(run(emb.repartition(7)) == r)
  }

  test("interval join matches pairs within tolerance, inclusive, no dups") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("lid", "k", "t")
    val r = Seq(
      (10L, 7L, ts("2024-01-01 10:04:59")), // inside
      (11L, 7L, ts("2024-01-01 10:05:00")), // boundary: inclusive
      (12L, 7L, ts("2024-01-01 09:55:00")), // boundary the other side
      (13L, 7L, ts("2024-01-01 10:05:01")), // outside
      (14L, 8L, ts("2024-01-01 10:00:00"))  // wrong key
    ).toDF("rid", "k", "t")
    val got = IntervalJoin.within(l, r, "k", "k", "t", "t", toleranceMs = 5 * 60 * 1000L)
      .select("r_rid").as[Long].collect().toSeq.sorted
    assert(got == Seq(10L, 11L, 12L))
  }

  test("text analysis: tokens, ratios, langid, fingerprint") {
    val df = Seq("The cat and the dog. And a bird!").toDF("text")
    val row = TextAnalysis.withQualityFeatures(df)
      .select("n_tokens", "stop_density", "lang_guess").as[(Int, Double, String)].head()
    assert(row._1 == 8)
    assert(row._2 > 0.3)
    assert(row._3 == "en")
    val fp1 = Seq("a  b\tc").toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[String].head()
    val fp2 = Seq("A b C").toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[String].head()
    assert(fp1 == fp2)
  }

  test("char entropy: uniform chars score high, repetition scores zero") {
    import graft.functions.CharEntropy
    assert(CharEntropy.of("aaaa") == 0.0)
    assert(math.abs(CharEntropy.of("ab") - 1.0) < 1e-12)        // 2 symbols, p=0.5
    assert(math.abs(CharEntropy.of("abcd") - 2.0) < 1e-12)      // 4 symbols
    assert(CharEntropy.of("") == 0.0)
    // matches the column expression through codegen
    val viaCol = Seq("abab", "zzzz").toDF("t")
      .select(graft.functions.GraftFunctions.char_entropy(col("t")))
      .as[Double].collect()
    assert(math.abs(viaCol(0) - 1.0) < 1e-12 && viaCol(1) == 0.0)
  }

  test("int8 quantization: bounded values, small reconstruction error, zero-safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // all-zero: scale 0, no NaN
      .toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    val rows = vecs.select(col("id"),
      Similarity.quantizeInt8(col("v")).as("q"),
      Similarity.quantScale(col("v")).as("s"))
      .as[(Long, Seq[Byte], Double)].collect().sortBy(_._1)
    val (_, q1, s1) = rows(0)
    assert(q1 == Seq[Byte](64, -127, 32, 0)) // 0.5*127, -1*127, 0.25*127
    assert(math.abs(s1 - 127.0) < 1e-12)
    // reconstruction error bounded by half a quantization step
    q1.zip(Seq(0.5, -1.0, 0.25, 0.0)).foreach { case (qb, x) =>
      assert(math.abs(qb / s1 - x) <= 0.5 / s1 + 1e-12)
    }
    assert(rows(1)._2 == Seq[Byte](0, 0, 0, 0) && rows(1)._3 == 0.0)
  }

  test("SQ8 pack/unpack/dot: 1 byte per dim, clamped codes, exact integer algebra") {
    import graft.functions.GraftFunctions._
    val df = Seq((1L, Seq(0.5, -1.0, 0.25, 0.0), 1.0)).toDF("id", "v", "s")
    val packed = df.select(pack_i8(col("v"), col("s")).as("b"))
    val blob = packed.head.getAs[Array[Byte]](0)
    assert(blob.length == 4) // 1 byte per dimension
    // codes = floor(x*127/s + 0.5) clamped to ±127
    assert(packed.select(unpack_i8(col("b"))).head.getSeq[Long](0) ==
      Seq(64L, -127L, 32L, 0L))
    // out-of-range values clamp instead of wrapping
    val big = Seq((1L, Seq(9.0, -9.0), 1.0)).toDF("id", "v", "s")
      .select(unpack_i8(pack_i8(col("v"), col("s"))))
    assert(big.head.getSeq[Long](0) == Seq(127L, -127L))
    // dot and normsq are the exact integer sums off the bytes
    val two = Seq((Seq(1.0, 2.0, -3.0), Seq(2.0, 0.0, 1.0), 127.0))
      .toDF("a", "b", "s")
      .select(dot_i8(pack_i8(col("a"), col("s")), pack_i8(col("b"), col("s"))).as("d"),
        normsq_i8(pack_i8(col("a"), col("s"))).as("n"))
    assert(two.as[(Long, Long)].head == ((1L * 2 + 2 * 0 + -3 * 1, 1L + 4 + 9)))
    // nulls pass through (null-intolerant)
    val nulls = Seq((null.asInstanceOf[Seq[Double]], 1.0)).toDF("v", "s")
    assert(nulls.select(pack_i8(col("v"), col("s"))).head.isNullAt(0))
  }

  test("int8TopK ranks an identical vector first with quantized cosine exactly 1.0") {
    import graft.functions.GraftFunctions._
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.5, -0.25)),
      (1L, Seq(1.0, 0.0, 0.5, -0.25)),  // duplicate of 0
      (2L, Seq(-1.0, 0.2, -0.5, 0.25)), // near-opposite
      (3L, Seq(0.0, 1.0, 0.0, 0.6))
    ).toDF("vec_id", "v")
    val scale = vecs.select(max(aggregate(col("v"),
      lit(0.0), (acc, x) => greatest(acc, abs(x)))).as("s"))
    val packed = vecs.crossJoin(broadcast(scale))
      .select(col("vec_id"), pack_i8(col("v"), col("s")).as("code"))
    val got = Similarity.int8TopK(packed, packed.filter(col("vec_id") === 0),
      "vec_id", "code", "vec_id", "code", k = 3)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    assert(got.head._2 == 1L && got.head._4 == 1.0) // identical codes: exactly 1
    assert(got.last._2 == 2L && got.last._4 < 0)    // opposite ranks last, negative
  }

  test("MMR re-rank: first pick is the nearest neighbour; a duplicate loses its slot to a diverse pick") {
    // q at origin; 1 and 2 are EXACT duplicates; 3 is equidistant from q
    // but orthogonal to 1. First pick: d2q ties (all 9) → min id = 1.
    // Second: score(2) = d²(2,1) − d²(q,2) = 0 − 9 = −9 but score(3) =
    // d²(3,1) − d²(q,3) = 18 − 9 = +9 → the duplicate loses to the
    // diverse pick even at equal relevance.
    val rows = Seq(
      (0L, Array[Byte](0, 0)),
      (1L, Array[Byte](3, 0)),
      (2L, Array[Byte](3, 0)),   // exact duplicate of 1
      (3L, Array[Byte](0, 3)),   // orthogonal, same distance to q
      (4L, Array[Byte](20, 20))) // far away, fills the shortlist
      .toDF("vec_id", "code")
    val got = Similarity.mmrRerank(rows, rows.filter(col("vec_id") === 0L),
        "vec_id", "code", "vec_id", "code", shortlist = 4, m = 3)
      .orderBy("rnk").as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._3).toSeq == Seq(1L, 3L, 2L),
      s"expected diversity pick 3 before duplicate 2, got ${got.toSeq}")
    assert(got.head._4 == 9L) // d²(q, 1) = 3²
  }

  test("MMR re-rank is layout-invariant") {
    val rows = (0L to 30L).map(i =>
      (i, Array[Byte]((i % 7).toByte, (i % 5).toByte, (3 - i % 3).toByte)))
      .toDF("vec_id", "code")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.mmrRerank(df, df.filter(col("vec_id") < 2L),
          "vec_id", "code", "vec_id", "code", shortlist = 10, m = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(rows.repartition(1)) == run(rows.repartition(7)))
  }

  test("MMR re-rank: driver greedy solve is bit-equal to the distributed loop") {
    // duplicates, ties, an under-m query (shortlist smaller than m picks
    // is impossible, but a query with fewer candidates than m is not)
    val rows = (0L to 30L).map(i =>
      (i, Array[Byte]((i % 7).toByte, (i % 5).toByte, (3 - i % 3).toByte)))
      .toDF("vec_id", "code")
    def run(local: Boolean) =
      Similarity.mmrRerank(rows, rows.filter(col("vec_id") < 3L),
          "vec_id", "code", "vec_id", "code", shortlist = 8, m = 5,
          localSolve = local)
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(true) == run(false))
  }

  test("bigram top share: exact ratio, null under two tokens") {
    val got = Seq("a b a b a", "x y z", "solo", "r r r r")
      .toDF("t")
      .select(graft.functions.GraftFunctions
        .bigram_top_share(TextAnalysis.tokens(col("t"))))
      .as[Option[Double]].collect()
    assert(got(0).contains(0.5))   // "a b"×2 of 4 bigrams
    assert(got(1).contains(0.5))   // 2 distinct bigrams, max 1 of 2
    assert(got(2).isEmpty)         // 1 token → no bigrams
    assert(got(3).contains(1.0))   // "r r"×3 of 3
  }

  test("token top share: exact ratio, null on empty") {
    val got = Seq("a b a b a", "x y z", "solo", "")
      .toDF("t")
      .select(graft.functions.GraftFunctions
        .token_top_share(TextAnalysis.tokens(col("t"))))
      .as[Option[Double]].collect()
    assert(got(0).contains(0.6))   // "a"×3 of 5 tokens
    assert(got(1).exists(s => math.abs(s - 1.0 / 3) < 1e-12))
    assert(got(2).contains(1.0))   // single token
    // split(trim("")) yields [""], one empty token → share 1.0 (the
    // quality gate upstream filters empty docs before this expression)
    assert(got(3).contains(1.0))
  }

  test("PII redaction scrubs emails and URLs, leaves clean text alone") {
    val rows = Seq(
      "write to alice.smith+test@sub.example.co.uk today",
      "see https://ex.com/a?q=1#f and http://plain.org next",
      "mail bob@ex.io at https://ex.io/bob",
      "no pii here at all")
    val got = rows.toDF("text")
      .select(TextAnalysis.redactPII(col("text")),
        TextAnalysis.emailCount(col("text")), TextAnalysis.urlCount(col("text")))
      .as[(String, Int, Int)].collect()
    assert(got(0) == (("write to <EMAIL> today", 1, 0)))
    assert(got(1) == (("see <URL> and <URL> next", 0, 2)))
    assert(got(2) == (("mail <EMAIL> at <URL>", 1, 1)))
    assert(got(3) == (("no pii here at all", 0, 0)))
  }

  test("train split is deterministic, id-keyed, and roughly proportioned") {
    val ids = (0L until 2000L).toDF("id")
    val split = ids.select(col("id"), TextAnalysis.trainSplit(col("id")).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700) // ~80% of 2000
    assert(counts("val") > 120 && counts("val") < 280)
    // stable under re-evaluation and row order
    val again = ids.orderBy(col("id").desc)
      .select(col("id"), TextAnalysis.trainSplit(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val first = split.as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("context-window packing fills bins sequentially within budget") {
    val docs = Seq((1L, 100L), (2L, 50L), (3L, 80L), (4L, 40L), (5L, 200L))
      .toDF("doc_id", "n_tokens")
    val bins = TextAnalysis.packBins(docs, "doc_id", "n_tokens", budget = 150L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // cum-starts: 0,100,150,230,270 → bins 0,0,1,1,1 at budget 150
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("distributed packing handles empty and single-partition inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(TextAnalysis.packBinsDistributed(empty, "doc_id", "n_tokens", 100L).count() == 0)
    val one = Seq((1L, 10L)).toDF("doc_id", "n_tokens")
    val got = TextAnalysis.packBinsDistributed(one, "doc_id", "n_tokens", 100L)
      .select("doc_id", "bin").as[(Long, Long)].head()
    assert(got == ((1L, 0L)))
  }

  test("distributed packing equals the global-window variant bin-for-bin") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 1000L).map(i => (i, 10L + rnd.nextInt(200).toLong))
      .toDF("doc_id", "n_tokens")
    val global = TextAnalysis.packBins(docs, "doc_id", "n_tokens", budget = 1000L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val dist = TextAnalysis.packBinsDistributed(docs, "doc_id", "n_tokens",
      budget = 1000L, partitions = 7)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(dist.size == 1000)
    assert(dist == global)
  }

  test("packing with DUPLICATE order keys is deterministic and variant-equivalent") {
    // many rows share an order key with differing token counts — the tie
    // hash must impose one total order on both variants and across runs
    val rnd = new scala.util.Random(7)
    val docs = (0L until 600L).map(i => (i % 40, 10L + rnd.nextInt(90).toLong, s"payload-$i"))
      .toDF("grp", "n_tokens", "body")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "n_tokens", "body", "bin")
        .as[(Long, Long, String, Long)].collect().toSet
    val global = asMap(TextAnalysis.packBins(docs, "grp", "n_tokens", budget = 500L))
    val dist = asMap(TextAnalysis.packBinsDistributed(docs, "grp", "n_tokens",
      budget = 500L, partitions = 9))
    val dist2 = asMap(TextAnalysis.packBinsDistributed(docs.repartition(13),
      "grp", "n_tokens", budget = 500L, partitions = 5))
    assert(global.size == 600)
    assert(dist == global, "distributed packing diverged on duplicate order keys")
    assert(dist2 == global, "packing depends on input partitioning")
  }

  test("txt_entropy excludes empty docs from the per-lang average (oracle parity)") {
    // an empty doc has engine entropy 0.0 but no rows under the oracle's
    // unnest — both sides now filter length(text) > 0, so its presence
    // must not move the average
    val dir = java.nio.file.Files.createTempDirectory("docs-empty").toString
    Seq(
      (1L, "aabb", "en", "s", 4L),
      (2L, "", "en", "s", 0L),
      (3L, "aabb", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("txt_entropy")(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(got == Map("en" -> 1.0)) // entropy("aabb") = 1 bit; empty doc excluded
  }

  test("multimodal: per-partition kernel emits deterministic features") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "hello world", "en", "srcA", 11L), (2L, "other bytes", "en", "srcB", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val feats = Multimodal.extractFeatures(media, Multimodal.StubKernels.imageFeature)
      .collect().sortBy(_.media_id)
    assert(feats.length == 2)
    assert(feats(0).n_bytes == 11L)
    assert(feats(0).feature.length == 8)
    // deterministic: same input → same checksum
    val again = Multimodal.extractFeatures(media, Multimodal.StubKernels.imageFeature)
      .collect().sortBy(_.media_id)
    assert(feats(0).checksum == again(0).checksum)
  }

  test("multimodal frame sampling explodes every Nth fixed-size frame") {
    val media = Seq((1L, ("x" * 1000).getBytes)).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(media, frameBytes = 256, everyNth = 2)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(frames == Seq(0, 2)) // 4 frames, every 2nd
  }

  test("keepBestPerCluster retains the best copy per cluster plus singletons") {
    val docs = Seq(
      (1L, "a", 50L), (2L, "a", 90L), (3L, "a", 90L), // cluster {1,2,3}: 2 wins (score tie → min id)
      (4L, "b", 10L),                                 // singleton
      (5L, "c", 30L), (6L, "c", 70L)                  // cluster {5,6}: 6 wins
    ).toDF("doc_id", "text", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "cluster")
    val kept = Dedup.keepBestPerCluster(docs, clusters, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 4L, 6L))
  }

  test("binary signature packs sign bits into 32-bit words, big-endian") {
    val df = Seq(Tuple1(Array.tabulate(64)(i => if (i == 0 || i == 63) 1.0 else -1.0)))
      .toDF("v")
    val sig = df.select(Similarity.binarySignature(col("v"))).as[Seq[Long]].head()
    // dim 0 is the leftmost bit of word 0; dim 63 the last bit of word 1
    assert(sig == Seq(1L << 31, 1L))
    val zeros = Seq(Tuple1(Array.fill(5)(0.0))).toDF("v") // d % 32 != 0, all non-positive
      .select(Similarity.binarySignature(col("v"))).as[Seq[Long]].head()
    assert(zeros == Seq(0L))
  }

  test("binary ANN with full-corpus rerank equals the brute-force top-k") {
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 7.3 + d * 1.7)))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    // rerank >= corpus: the Hamming pre-filter cannot drop a true
    // neighbour, so the result must be EXACTLY the brute-force answer
    val bin = Similarity.binaryTopK(emb, q, "vec_id", "embedding",
      "vec_id", "embedding", k = 10, rerank = 60)
      .orderBy("qid", "rank").collect().toSeq
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
      "vec_id", "embedding", k = 10)
      .orderBy("qid", "rank").collect().toSeq
    assert(bin == bf)
  }

  test("cross-snapshot dedup flags only incoming docs near-duplicating the reference") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val base = (1 to 40).map(i => s"w$i")
    val ref = Seq(mk(100L, base), mk(101L, (1 to 40).map(i => s"x$i"))).toDF("doc_id", "text")
    val inc = Seq(
      mk(1L, base),                              // verbatim dup of ref 100
      mk(2L, base.updated(0, "CHANGED")),        // near-dup (j ~ 0.92)
      mk(3L, (1 to 40).map(i => s"z$i")),        // unrelated
      mk(4L, (1 to 40).map(i => s"x$i").updated(5, "ALT")) // near-dup of 101
    ).toDF("doc_id", "text")
    val flagged = Dedup.againstReference(inc, ref, "doc_id", "text", threshold = 0.8)
      .orderBy("doc_id").collect()
    assert(flagged.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(flagged.head.getDouble(2) == 1.0) // verbatim: max_jaccard 1.0
    // survivors via anti-join: only the unrelated doc remains
    val survivors = inc.join(
      Dedup.againstReference(inc, ref, "doc_id", "text", threshold = 0.8),
      Seq("doc_id"), "left_anti").select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(3L))
  }

  test("clusterAppend equals the full recompute and never re-derives base pairs") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val w = (1 to 40).map(i => s"w$i"); val x = (1 to 40).map(i => s"x$i")
    val y = (1 to 40).map(i => s"y$i"); val z = (1 to 40).map(i => s"z$i")
    // base: near-dup groups {1,2} and {5,6}, singleton 9
    val base = Seq(mk(1L, w), mk(2L, w.updated(0, "ALT")),
      mk(5L, x), mk(6L, x.updated(3, "ALT")), mk(9L, y)).toDF("doc_id", "text")
    // delta: 10 joins base cluster {1,2}; 11 clusters with base SINGLETON
    // 9 (not in the MV); 12-13 near-dup each other only; 14 unrelated
    val delta = Seq(mk(10L, w.updated(1, "ALT2")), mk(11L, y.updated(0, "ALT")),
      mk(12L, z), mk(13L, z.updated(2, "ALT")),
      mk(14L, (1 to 40).map(i => s"q$i"))).toDF("doc_id", "text")
    def fullClusters(d: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupClusters(
        Dedup.jaccardVerify(
            Dedup.minhashCandidatePairs(d, "doc_id", "text", 64, 32),
            d, "doc_id", "text")
          .filter(col("jaccard") >= 0.8).select("id_a", "id_b"))
    val full = fullClusters(base.union(delta)).as[(Long, Long)].collect().toMap
    val mv = fullClusters(base).localCheckpoint(true)
    val inc = Dedup.clusterAppend(mv, base, delta, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc(10L) == 1L && inc(11L) == 9L && inc(13L) == 12L && !inc.contains(14L))
    // base pairs are NEVER re-derived: hand the append an MV that labels
    // the base near-dups 1 and 2 APART — a maintenance fold must respect
    // the MV (a full recompute would re-merge them)
    val forked = Seq((1L, 1L), (2L, 2L), (5L, 5L), (6L, 5L)).toDF("id", "cluster")
    val out = Dedup.clusterAppend(forked, base,
        Seq(mk(12L, z), mk(13L, z.updated(2, "ALT"))).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 2L && out(13L) == 12L)
  }

  test("contamination report: verbatim benchmark doc scores 1.0, unrelated below") {
    val words = (1 to 30).map(i => s"tok$i")
    val bench = Seq((900L, words.mkString(" "))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, words.mkString(" ")),                       // the benchmark doc itself
      (2L, (words.take(15) ++ (1 to 15).map(i => s"other$i")).mkString(" ")), // ~half
      (3L, (1 to 30).map(i => s"none$i").mkString(" "))) // no overlap
      .toDF("doc_id", "text")
    val all = TextAnalysis.contaminationReport(corpus, bench, "doc_id", "text",
      n = 3, minOverlap = 0.0).orderBy("doc_id").collect()
    assert(all.length == 3)
    assert(all(0).getDouble(3) == 1.0)
    assert(all(1).getDouble(3) > 0.3 && all(1).getDouble(3) < 0.7)
    assert(all(2).getDouble(3) == 0.0)
    val gated = TextAnalysis.contaminationReport(corpus, bench, "doc_id", "text",
      n = 3, minOverlap = 0.9).select("doc_id").as[Long].collect().toSeq
    assert(gated == Seq(1L))
  }

  test("token-budget sampling: budget rule exact, deterministic, layout-invariant") {
    val docs = (1L to 300L).map(i => (i, if (i % 3 == 0L) "a" else "b", 10 + (i % 7).toInt))
      .toDF("id", "stratum", "n_tok")
    def run(parts: Int): Seq[Long] =
      TextAnalysis.tokenBudgetSample(docs.repartition(parts), "id", "n_tok", "stratum",
        Map("a" -> 200L), defaultBudget = 400L)
        .select("id").as[Long].collect().toSeq.sorted
    val ids = run(1)
    assert(ids == run(13)) // pure function of (id, stratum, tokens)
    // the admission rule: tokens BEFORE each admitted doc < budget, and
    // every non-admitted doc would start at/after the budget
    val kept = docs.filter(col("id").isin(ids: _*))
      .groupBy("stratum").agg(sum("n_tok").as("t"))
      .as[(String, Long)].collect().toMap
    // budget a=200: kept tokens in [200, 200 + max doc) ; b=400 likewise
    assert(kept("a") >= 200L && kept("a") < 200L + 17)
    assert(kept("b") >= 400L && kept("b") < 400L + 17)
  }

  test("jdk image kernel: PNG round-trip recovers exact raster features") {
    // generator-recorded truth, computed straight from the raster formula
    def expected(id: Long): (Int, Int, Double, Double, Double) = {
      val w = Multimodal.Synth.rasterWidth(id)
      val h = Multimodal.Synth.rasterHeight(id)
      val px = for { x <- 0 until w; y <- 0 until h }
        yield Multimodal.Synth.rasterPixel(id, x, y)
      (w, h,
        px.map(_._1).sum.toDouble / (w * h),
        px.map(_._2).sum.toDouble / (w * h),
        px.map(_._3).sum.toDouble / (w * h))
    }
    val ids = Seq(0L, 3L, 17L, 44L)
    val media = ids.toDF("id").as[Long]
      .map(id => Multimodal.MediaRow(id, Multimodal.Synth.png(id), "image/png", "s"))
    val got = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    got.zip(ids.sorted).foreach { case (f, id) =>
      val (w, h, r, g, b) = expected(id)
      assert(f.decodable && f.width == w && f.height == h, s"id=$id $f")
      assert(f.mean_r == r && f.mean_g == g && f.mean_b == b, s"id=$id $f")
    }
  }

  test("box resize: reference block means, ceil dims, truncated bytes rejected") {
    import spark.implicits._
    def expected(id: Long): (Int, Int, Long, Long, Long) = {
      val w = Multimodal.Synth.rasterWidth(id)
      val h = Multimodal.Synth.rasterHeight(id)
      val ow = (w + 1) / 2; val oh = (h + 1) / 2
      var tr = 0L; var tg = 0L; var tb = 0L
      for (by <- 0 until oh; bx <- 0 until ow) {
        val blk = for (y <- by * 2 until math.min(by * 2 + 2, h);
                       x <- bx * 2 until math.min(bx * 2 + 2, w))
          yield Multimodal.Synth.rasterPixel(id, x, y)
        tr += blk.map(_._1.toLong).sum / blk.size
        tg += blk.map(_._2.toLong).sum / blk.size
        tb += blk.map(_._3.toLong).sum / blk.size
      }
      (ow, oh, tr, tg, tb)
    }
    val ids = Seq(1L, 8L, 13L) // mix of even/odd dims (partial edge blocks)
    val media = ids.toDF("id").as[Long]
      .map(id => Multimodal.MediaRow(id, Multimodal.Synth.png(id), "image/png", "s"))
    val got = Multimodal.resizeImages(media, 2).collect().sortBy(_.media_id)
    got.zip(ids.sorted).foreach { case (f, id) =>
      val (ow, oh, r, g, b) = expected(id)
      assert(f.decodable && f.out_w == ow && f.out_h == oh, s"id=$id $f")
      assert(f.sum_r == r && f.sum_g == g && f.sum_b == b, s"id=$id $f")
    }
    val junk = Multimodal.JdkKernels.resizeImage(
      Multimodal.MediaRow(99L, Array[Byte](1, 2, 3), "image/png", "s"), 2)
    assert(!junk.decodable)
  }

  test("canonicalize: NFC composes, controls strip, whitespace collapses") {
    import spark.implicits._
    val composed = "café"             // é as one code point
    val decomposed = "café"          // e + combining acute
    val rows = Seq(
      ("nfc_a", composed + " X"), ("nfc_b", decomposed + " X"),
      ("ctrl", "abc"),
      ("ws", "  Mixed\tSpaceAnd\r\nNewlines  "),
      ("case", "UPPER lower")
    ).toDF("k", "t")
      .select(col("k"), TextAnalysis.canonicalize(col("t")).as("c"))
      .as[(String, String)].collect().toMap
    assert(rows("nfc_a") == rows("nfc_b"), // the whole point of NFC
      s"${rows("nfc_a")} != ${rows("nfc_b")}")
    assert(rows("ctrl") == "abc")
    assert(rows("ws") == "mixed space and newlines")
    assert(rows("case") == "upper lower")
  }

  test("leakage-safe split never straddles a near-dup pair across splits") {
    import spark.implicits._
    // three dup clusters + singletons; ids chosen so a PLAIN id-hash
    // split WOULD straddle at least one cluster (asserted below)
    val docs = ((1L to 60L).map(i => (i, s"unique doc number $i text")) ++
      Seq((101L, "alpha beta gamma delta"), (102L, "alpha beta gamma delta"),
        (103L, "alpha beta gamma delta epsilon"),
        (201L, "one two three four five"), (202L, "one two three four five"),
        (301L, "red green blue yellow"), (302L, "red green blue yellow")))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardVerify(
        Dedup.minhashCandidatePairs(docs, "doc_id", "text", 64, 32),
        docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.8).select("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs)
    val split = Dedup.leakageSafeSplit(docs, clusters, "doc_id")
      .select("doc_id", "split")
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(split.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddling.isEmpty)
    // the naive id-hash split DOES straddle on this fixture — the
    // property above is meaningful, not vacuous
    val naive = docs.withColumn("split", TextAnalysis.trainSplit(col("doc_id")))
      .select("doc_id", "split")
    val naiveStraddle = pairs
      .join(naive.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(naive.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(!naiveStraddle.isEmpty,
      "fixture too weak: naive split did not straddle any pair")
  }

  test("perceptual hash matches the raster-formula reference; near-dup is close") {
    // reference aHash computed straight from the formula (no codec)
    def refHash(id: Long, perturb: Boolean): (Long, Long) = {
      val gray = (0 until 64).map { i =>
        val (x, y) = (i % 8, i / 8)
        val (r0, g, b) = Multimodal.Synth.rasterPixel(id, x, y)
        val r = if (perturb && x == 7 && y == 7) (r0 + 8) % 256 else r0
        r + g + b
      }
      val sum = gray.sum
      var hi = 0L; var lo = 0L
      for (i <- 0 until 64 if gray(i) * 64 > sum)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      (hi, lo)
    }
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    for (id <- Seq(0L, 3L, 18L, 44L)) {
      val got = Multimodal.JdkPHash.phash(
        Multimodal.MediaRow(id, Multimodal.Synth.png(id), "image/png", "s"))
      assert(got.decodable && (got.hi, got.lo) == refHash(id, perturb = false),
        s"id=$id $got")
      val near = Multimodal.JdkPHash.phash(
        Multimodal.MediaRow(id, Multimodal.Synth.pngNear(id), "image/png", "s"))
      assert((near.hi, near.lo) == refHash(id, perturb = true), s"id=$id $near")
      assert(hamming((got.hi, got.lo), (near.hi, near.lo)) <= 3, s"id=$id")
    }
    val junk = Multimodal.JdkPHash.phash(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3), "image/png", "s"))
    assert(!junk.decodable)
  }

  test("jdk image kernel: BMP decodes identically, garbage rejects cleanly") {
    val id = 7L
    val w = Multimodal.Synth.rasterWidth(id)
    val h = Multimodal.Synth.rasterHeight(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for { x <- 0 until w; y <- 0 until h } {
      val (r, g, b) = Multimodal.Synth.rasterPixel(id, x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val png = Multimodal.JdkKernels.decodeImage(
      Multimodal.MediaRow(id, Multimodal.Synth.png(id), "image/png", "s"))
    val bmp = Multimodal.JdkKernels.decodeImage(
      Multimodal.MediaRow(id, bos.toByteArray, "image/bmp", "s"))
    assert(bmp == png.copy(media_id = bmp.media_id)) // both lossless codecs
    val bad = Multimodal.JdkKernels.decodeImage(
      Multimodal.MediaRow(9L, Array[Byte](1, 2, 3, 4), "image/png", "s"))
    assert(!bad.decodable && bad.width == 0 && bad.height == 0)
    val truncated = Multimodal.JdkKernels.decodeImage(
      Multimodal.MediaRow(10L, Multimodal.Synth.png(3L).take(40), "image/png", "s"))
    assert(!truncated.decodable)
  }

  test("jdk image kernel: JPEG decodes real dimensions (lossy means close)") {
    val id = 12L
    val w = Multimodal.Synth.rasterWidth(id)
    val h = Multimodal.Synth.rasterHeight(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for { x <- 0 until w; y <- 0 until h }
      img.setRGB(x, y, 0x808080) // flat gray — JPEG preserves it closely
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val f = Multimodal.JdkKernels.decodeImage(
      Multimodal.MediaRow(id, bos.toByteArray, "image/jpeg", "s"))
    assert(f.decodable && f.width == w && f.height == h)
    assert(math.abs(f.mean_r - 0x80) < 4 && math.abs(f.mean_b - 0x80) < 4, f)
  }

  test("jdk audio kernel: WAV round-trip recovers rate, length and RMS") {
    val ids = Seq(0L, 5L, 13L)
    val media = ids.toDF("id").as[Long]
      .map(id => Multimodal.MediaRow(id, Multimodal.Synth.wav(id), "audio/wav", "s"))
    val got = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    got.zip(ids.sorted).foreach { case (f, id) =>
      val n = Multimodal.Synth.wavSampleCount(id)
      val sumSq = (0 until n).map { i =>
        val s = Multimodal.Synth.wavSample(id, i).toLong; s * s
      }.sum
      assert(f.decodable && f.sample_rate == 8000 && f.channels == 1, f)
      assert(f.n_samples == n && f.rms == math.sqrt(sumSq.toDouble / n), f)
    }
    val bad = Multimodal.JdkKernels.decodeAudio(
      Multimodal.MediaRow(9L, Array[Byte](82, 73, 70, 70), "audio/wav", "s"))
    assert(!bad.decodable)
  }

  test("stratified sampling: deterministic, rate-respecting, layout-independent") {
    val docs = (1L to 2000L).map(i => (i, if (i % 4 == 0L) "minor" else "major"))
      .toDF("id", "stratum")
    def kept(parts: Int): Seq[Long] = docs.repartition(parts)
      .filter(TextAnalysis.stratifiedKeep(col("id"), col("stratum"),
        Map("major" -> 0.25), defaultRate = 1.0))
      .select("id").as[Long].collect().toSeq.sorted
    val once = kept(1)
    assert(once == kept(7)) // pure function of the id — layout-independent
    val majorKept = once.count(_ % 4 != 0L).toDouble / 1500
    assert(math.abs(majorKept - 0.25) < 0.05, s"major keep rate $majorKept")
    assert(once.count(_ % 4 == 0L) == 500) // default rate 1.0 keeps every minor row
  }

  test("semantic prune: min-id survivor within cells, singletons untouched") {
    // Two exact copies (cosine 1) must share a cell (duplicate init
    // vectors collapse to one center) and only the smaller id survives.
    // The eps-perturbed near-copy becomes its OWN init center at this
    // tiny scale and is untouched — pruning recall is cluster-granular by
    // design (SemDeDup's contract: pairwise work only within cells).
    val d = 64
    def vec(seed: Int, eps: Double = 0.0): Seq[Double] =
      (0 until d).map(j => math.sin(seed * 31 + j).abs + (if (j == 0) eps else 0.0))
    val rows = Seq(
      (1L, vec(1)), (2L, vec(1)), (3L, vec(1, eps = 0.05)),
      (10L, vec(7)), (11L, vec(13)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.semanticPrune(df, "vec_id", "embedding", simThreshold = 0.99)
      .as[(Int, Long, Long, Double)].collect()
    assert(out.map(_._2).sum == 5L) // every vector accounted for
    assert(out.map(_._3).sum == 1L, s"expected exactly id 2 pruned: ${out.toSeq}")
    // the duplicate-holding cell keeps exactly one of two
    val fat = out.filter(_._2 == 2L)
    assert(fat.length == 1 && fat.head._3 == 1L && fat.head._4 == 0.5)
    // plan guard: pairwise work must stay cell-local — an equi-join on
    // the cell key, never a cartesian/nested-loop corpus product
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      Similarity.semanticPrune(df, "vec_id", "embedding", 0.99)).toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("chunk windows: overlap, tail chunk, short doc, full coverage") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val d = Seq((1L, doc), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(d, "doc_id", "text", win = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(c => (c._1, c._2)).toSeq
    // starts 0,3,6 — and 6+4=10 reaches the end, so no start-9 tail
    assert(out.filter(_._1 == 1L).map(c => (c._2, c._3, c._4)) == Seq(
      (0L, "t1 t2 t3 t4", 4L), (1L, "t4 t5 t6 t7", 4L), (2L, "t7 t8 t9 t10", 4L)))
    // sub-window doc → one whole-document chunk
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, "a b", 2L)))
    // an 11-token doc needs the short tail chunk at start 9
    val d11 = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val tail = TextAnalysis.chunkWindows(d11, "doc_id", "text", win = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().maxBy(_._2)
    assert(tail == ((1L, 3L, "t10 t11", 2L)))
  }
}
