package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank: mass conservation, symmetry, hub dominance, and
  * the bit-identical-across-layouts property the integer arithmetic
  * exists to provide. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .toDF("src", "dst", "w")

  private def ranks(e: DataFrame): Map[Long, Long] =
    Graph.pageRank(e, "src", "dst", "w").as[(Long, Long)].collect().toMap

  test("two symmetric nodes split the mass exactly evenly") {
    val r = ranks(sym((1L, 2L, 3L)))
    assert(r(1L) == r(2L))
    // mass ~1e12, minus bounded flooring loss per round
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.sum > 999999999000L)
  }

  test("hub of a star out-ranks every leaf") {
    val r = ranks(sym((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 1L)))
    val hub = r(1L)
    (2L to 5L).foreach(l => assert(hub > r(l)))
    (3L to 5L).foreach(l => assert(r(l) == r(2L))) // leaves identical
  }

  test("heavier edges pull proportionally more rank") {
    // 1-2 strongly tied, 3 attached weakly to 2
    val r = ranks(sym((1L, 2L, 10L), (2L, 3L, 1L)))
    assert(r(1L) > r(3L))
  }

  test("ranks are bit-identical across partition layouts") {
    val e = sym((1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 5L), (4L, 1L, 1L), (2L, 4L, 3L))
    val a = ranks(e.repartition(1))
    val b = ranks(e.repartition(7))
    assert(a == b)
  }

  private def tris(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.triangleCounts(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("personalized PageRank: mass concentrates at the seed, decays with distance") {
    // path 1-2-3-4, seed {1}: teleport mass lands only on 1. Asserted
    // near the fixed point (40 rounds; the point-mass start oscillates
    // with path parity at low round counts). NOTE the correct stationary
    // shape: the seed's NEIGHBOR out-ranks the seed here (node 2 collects
    // node 1's entire out-mass plus half of node 3's; solving the
    // stationary equations gives pi_2 = 1.185 pi_1) — what personalization
    // guarantees is proximity dominance (seed beats distance-2+) and
    // monotone decay beyond the neighbor, not seed-first
    val e = sym((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val seeds = Seq(1L).toDF("id")
    val r = Graph.personalizedPageRank(e, "src", "dst", "w", seeds, "id", iters = 40)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(3L) && r(1L) > r(4L)) // seed beats distance >= 2
    assert(r(2L) > r(3L) && r(3L) > r(4L)) // monotone decay past the neighbor
    // total mass bounded by 1e12, minus flooring loss
    assert(r.values.sum <= 1000000000000L && r.values.sum > 990000000000L)
    // uniform seed set over ALL nodes = plain PageRank, bit-for-bit
    val all = Seq(1L, 2L, 3L, 4L).toDF("id")
    val ppr = Graph.personalizedPageRank(e, "src", "dst", "w", all, "id")
      .as[(Long, Long)].collect().toMap
    val pr = Graph.pageRank(e, "src", "dst", "w").as[(Long, Long)].collect().toMap
    assert(ppr == pr)
    // seeds outside the graph hold no mass; a non-total graph is refused
    val r2 = Graph.personalizedPageRank(e, "src", "dst", "w",
      Seq(1L, 99L).toDF("id"), "id", iters = 40).as[(Long, Long)].collect().toMap
    assert(r2 == r)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", seeds, "id").count()
    }
  }

  test("triangle counts: one triangle gives each corner exactly 1") {
    assert(tris((1L, 2L), (2L, 3L), (1L, 3L)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle counts: a path has no triangles") {
    assert(tris((1L, 2L), (2L, 3L), (3L, 4L)).isEmpty)
  }

  test("triangle counts: K4 gives every node C(3,2)=3 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val r = tris(k4: _*)
    assert(r == (1L to 4L).map(_ -> 3L).toMap)
  }

  test("triangle counts: shared-edge triangles count once per triangle") {
    // two triangles sharing edge 1-2: {1,2,3} and {1,2,4}
    val r = tris((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  private def core(k: Int, rounds: Int, pairs: (Long, Long)*): Seq[(Int, Long, Long)] =
    Graph.kCorePeel(pairs.toDF("a", "b"), "a", "b", k, rounds)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq

  test("k-core peel: a 4-cycle dies in round 1 of the 3-core") {
    val r = core(3, 2, (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(r == Seq((1, 0L, 0L), (2, 0L, 0L)))
  }

  test("k-core peel: K4 survives every round; a pendant peels off first") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = core(3, 3, (k4 :+ ((4L, 5L))): _*)
    // pendant node 5 (deg 1) drops in round 1; K4 (all deg >= 3) is stable
    assert(r == Seq((1, 4L, 6L), (2, 4L, 6L), (3, 4L, 6L)))
  }

  test("k-core peel: cascading peel needs the second round") {
    // chain 5-6 hangs off K4 via 5: removing 6 (deg 1) in round 1 drops
    // 5 to deg 1, which peels only in round 2
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = core(2, 3, (k4 ++ Seq((4L, 5L), (5L, 6L))): _*)
    assert(r == Seq((1, 5L, 7L), (2, 4L, 6L), (3, 4L, 6L)))
  }

  test("dangling mass is redistributed: a directed chain's sink gains, total mass holds") {
    // 1 -> 2 -> 3: node 3 is dangling; its damped mass must flow back to
    // everyone instead of leaking
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val r = ranks(e)
    assert(r.keySet == Set(1L, 2L, 3L)) // sinks appear in the result
    assert(r(3L) > r(2L) && r(2L) > r(1L)) // rank accumulates downstream
    // mass ~1e12 minus bounded per-round flooring loss — nothing leaked
    assert(r.values.sum <= 1000000000000L && r.values.sum > 999999990000L)
  }

  test("dangling term is exactly zero on a total graph (bit-for-bit with the old form)") {
    // symmetric graph: every node has out-edges, so the generalized
    // recurrence must reduce to the dangling-free one — pin the known
    // two-node fixed point (even split, bounded flooring loss)
    val r = ranks(sym((1L, 2L, 3L)))
    assert(r(1L) == r(2L) && r.values.sum > 999999999000L)
  }

  test("k-core converged: K4 + pendant chain reaches the fixed point") {
    // 2-core: 6 drops in round 1, 5 cascades in round 2, round 3 is the
    // first no-op -> n_rounds = 3, K4 is the fixed point
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = Graph.kCoreConverged((k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b"),
        "a", "b", k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((3L, 4L, 6L)))
  }

  test("k-core converged: everything peels away to the empty fixed point") {
    // round 1 removes every node; round 2 is the first NO-OP round, which
    // is what n_rounds reports (mirrors the oracle's count-lag rule)
    val r = Graph.kCoreConverged(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"),
        "a", "b", k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((2L, 0L, 0L)))
  }

  test("connected components: two chains and an isolate-pair histogram") {
    // components {1,2,3,4} (path), {10,11} (edge), {20,21} (edge):
    // sizes 4, 2, 2 -> histogram (2 -> 2 components, 4 -> 1 component)
    val r = Graph.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L)).toDF("a", "b"),
        "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(2L -> 2L, 4L -> 1L))
  }

  test("connected components: a long path needs diameter rounds but converges") {
    val path = (1L until 12L).map(i => (i, i + 1))
    val r = Graph.connectedComponents(path.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(12L -> 1L))
  }

  test("normalize: loops, duplicates, null endpoints and both orientations collapse") {
    val dirty = Seq(
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(1L)),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[java.lang.Long]))
      .toDF("a", "b")
    val r = Graph.normalize(dirty, "a", "b").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 2L), (2L, 3L)))
  }

  test("normalize is idempotent and makes the undirected ops dirt-proof") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("a", "b")
    // same graph with reversed copies, duplicates, and a self-loop mixed in
    val dirty = clean.union(
      Seq((2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (1L, 3L)).toDF("a", "b"))
    assert(Graph.normalize(clean, "a", "b").as[(Long, Long)].collect().toSet ==
      Graph.normalize(dirty, "a", "b").as[(Long, Long)].collect().toSet)
    def tri(df: DataFrame) = Graph.triangleCounts(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(tri(clean) == tri(Graph.normalize(dirty, "a", "b")))
    def core(df: DataFrame) = Graph.kCoreConverged(df, "a", "b", k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(core(clean) == core(Graph.normalize(dirty, "a", "b")))
    def comp(df: DataFrame) = Graph.connectedComponents(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp(clean) == comp(Graph.normalize(dirty, "a", "b")))
  }

  test("normalizeDirected merges duplicate links, drops loops, and is idempotent") {
    val clean = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L)).toDF("src", "dst", "w")
    // dirty copy: the (1,2) link observed as two rows (2+1=3), a self-loop
    val dirty = Seq((1L, 2L, 2L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 2L),
      (2L, 2L, 9L)).toDF("src", "dst", "w")
    def norm(df: DataFrame) = Graph.normalizeDirected(df, "src", "dst", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(norm(dirty) == norm(clean))
    assert(norm(clean) == clean.as[(Long, Long, Long)].collect().toSet)
    // and the recurrence agrees: pageRank over the normalized dirty list
    // is bit-for-bit pageRank over the clean list
    def pr(df: DataFrame) = Graph.pageRank(
      Graph.normalizeDirected(df, "src", "dst", "w"), "src", "dst", "w", 5)
      .as[(Long, Long)].collect().toMap
    assert(pr(dirty) == pr(clean))
  }

  test("star contraction matches min-label propagation's histogram") {
    // deterministic scraggly graph: chains, a clique, isolated edges
    val edges = ((1L until 9L).map(i => (i, i + 1)) ++ // 9-node path
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L)) ++ // triangle + tail
      Seq((30L, 31L), (40L, 41L))).toDF("a", "b")
    val star = Graph.connectedComponentsStar(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val label = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(star == label && star == Map(2L -> 2L, 4L -> 1L, 9L -> 1L))
  }

  test("star contraction: a 10k-node chain converges in O(log n) phases") {
    // the adversarial shape for min-label propagation (diameter = n), and
    // exactly the graph the SoCC'14 bound exists for: phases must stay
    // within ~2·log2(n) (+2 confirming no-op phases, + slack)
    val n = 10000L
    val chain = spark.range(0L, n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val (hist, phases) =
      Graph.connectedComponentsStarWithPhases(chain, "a", "b")
    assert(hist.as[(Long, Long)].collect().toMap == Map(n -> 1L))
    val bound = 2 * math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt + 6
    assert(phases <= bound, s"took $phases phases, bound $bound")
  }

  test("star contraction handles self-loop-only nodes and empty graphs") {
    val loops = Seq((5L, 5L), (6L, 6L), (1L, 2L)).toDF("a", "b")
    val r = Graph.connectedComponentsStar(loops, "a", "b")
      .as[(Long, Long)].collect().toMap
    // 5 and 6 are singleton components; {1,2} is one 2-component
    assert(r == Map(1L -> 2L, 2L -> 1L))
  }

  test("star contraction on STRING ids (DataFrame loop) matches min-label") {
    // non-integral ids bypass the RDD inner loop — this keeps the
    // DataFrame fixed point covered now that integral ids don't hit it
    val edges = Seq(("ant", "bee"), ("bee", "cat"), ("xun", "yak"),
      ("zed", "zed")).toDF("a", "b")
    val star = Graph.connectedComponentsStar(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    // {ant,bee,cat}, {xun,yak}, {zed} → sizes 3, 2, 1 (min-label
    // propagation is not comparable here: its numeric sum-signature
    // convergence test supports only numeric-castable ids)
    assert(star == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
    // and the labeling itself is each component's minimum (string order)
    val lbl = Graph.starComponentLabels(edges, "a", "b")._1
      .as[(String, String)].collect().toMap
    assert(lbl == Map("ant" -> "ant", "bee" -> "ant", "cat" -> "ant",
      "xun" -> "xun", "yak" -> "xun", "zed" -> "zed"))
  }

  test("union-find gate labels equal the distributed star labels") {
    def lbls(df: DataFrame) = df.as[(Long, Long)].collect().toMap
    val edges = ((1L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L)) ++
      Seq((30L, 31L), (40L, 41L), (50L, 50L))).toDF("a", "b")
    val local = Graph.starComponentLabels(edges, "a", "b", localMaxEdges = 1000)
    val dist = Graph.starComponentLabels(edges, "a", "b")
    assert(local._2 == 0 && dist._2 > 0) // gate took the driver path
    assert(lbls(local._1) == lbls(dist._1))
  }

  test("incremental components equal the full recompute, batch by batch") {
    def lbls(df: DataFrame) = df.as[(Long, Long)].collect().toMap
    // base MV: components {1,2,3}, {10,11}, {20,21}
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val mv0 = Graph.starComponentLabels(base, "a", "b")._1
    // batch 1: a merge edge (dirty: duplicated + reversed), a brand-new
    // pair, and a self-loop-only new node
    val d1 = Seq((3L, 10L), (10L, 3L), (30L, 31L), (7L, 7L)).toDF("a", "b")
    val mv1 = Graph.incrementalComponents(mv0, "id", "l", d1, "a", "b")
      .localCheckpoint(true)
    assert(lbls(mv1) == lbls(Graph.starComponentLabels(base.union(d1), "a", "b")._1))
    // batch 2: a NEW node bridging two existing components transitively
    val d2 = Seq((31L, 99L), (99L, 20L)).toDF("a", "b")
    val mv2 = Graph.incrementalComponents(mv1, "id", "l", d2, "a", "b")
      .localCheckpoint(true)
    assert(lbls(mv2) == lbls(Graph.starComponentLabels(
      base.union(d1).union(d2), "a", "b")._1))
    // a no-op batch (already-connected endpoints) changes nothing
    val mv3 = Graph.incrementalComponents(mv2, "id", "l",
      Seq((2L, 1L)).toDF("a", "b"), "a", "b")
    assert(lbls(mv3) == lbls(mv2))
  }

  test("pageRank driver gate, RDD loop and DataFrame loop are bit-identical " +
      "on total, dangling, and isolated-receiver shapes") {
    def both(e: DataFrame): (Map[Long, Long], Map[Long, Long]) = {
      // gated driver solve (default) vs forced-distributed RDD loop vs
      // forced DataFrame loop — all three must agree bit-for-bit
      val local = Graph.pageRank(e, "src", "dst", "w")
        .as[(Long, Long)].collect().toMap
      val rdd = Graph.pageRank(e, "src", "dst", "w", localMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      val df = Graph.pageRank(e, "src", "dst", "w", forceDataFrameLoop = true)
        .as[(Long, Long)].collect().toMap
      assert(local == rdd)
      (rdd, df)
    }
    // total + all-receiving (symmetric): the lean zero-action chain
    val s = both(sym((1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 5L), (2L, 4L, 3L)))
    assert(s._1 == s._2)
    // dangling sinks (4 and 5 have no out-edges): per-round mass term
    val d = both(Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (1L, 5L, 1L))
      .toDF("src", "dst", "w"))
    assert(d._1 == d._2)
    // total but NOT all-receiving (1 receives nothing): left-join path
    val i = both(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w"))
    assert(i._1 == i._2)
    // and the RDD loop is layout-invariant
    val e = sym((1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 5L))
    val base = Graph.pageRank(e, "src", "dst", "w").as[(Long, Long)].collect().toMap
    val rep = Graph.pageRank(e.repartition(13), "src", "dst", "w")
      .as[(Long, Long)].collect().toMap
    assert(base == rep)
  }

  test("pageRank to convergence: fixed point equals the iterated recurrence") {
    val e = sym((1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 5L), (4L, 1L, 1L), (2L, 4L, 3L))
    val conv = Graph.pageRankConverged(e, "src", "dst", "w")
      .as[(Long, Long, Long)].collect()
    val iters = conv.head._3
    assert(conv.map(_._3).distinct.length == 1 && iters >= 1)
    // running the FIXED-iteration form for n_iters rounds lands on the
    // same ranks (and so does one round more — it is a fixed point)
    val atN = ranks2(e, iters.toInt)
    val atN1 = ranks2(e, iters.toInt + 1)
    val c = conv.map(t => t._1 -> t._2).toMap
    assert(c == atN && c == atN1)
  }

  test("pageRank to convergence: dangling chain converges and keeps mass") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRankConverged(e, "src", "dst", "w")
      .as[(Long, Long, Long)].collect()
    val mass = r.map(_._2).sum
    assert(mass <= 1000000000000L && mass > 999999990000L)
    assert(r.map(_._3).distinct.length == 1)
  }

  test("pageRank to convergence: local solve is bit-for-bit the distributed loop") {
    // lean (symmetric) and dangling graphs, each solved by the gated
    // driver loop (default) AND the forced-distributed loop
    // (localMaxNodes = 0): identical (id, pr, n_iters) on both shapes
    val lean = sym((1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 5L), (4L, 1L, 1L), (2L, 4L, 3L))
    val dangling = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    for (e <- Seq(lean, dangling)) {
      val local = Graph.pageRankConverged(e, "src", "dst", "w")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      // forced-distributed, RDD round loop (the integral-id default)
      val dist = Graph.pageRankConverged(e, "src", "dst", "w", localMaxNodes = 0)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      // forced-distributed, DataFrame round loop (the documented shape)
      val distDf = Graph.pageRankConverged(e, "src", "dst", "w",
          localMaxNodes = 0, forceDataFrameLoop = true)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(local == dist)
      assert(local == distDf)
    }
  }

  private def ranks2(e: DataFrame, iters: Int): Map[Long, Long] =
    Graph.pageRank(e, "src", "dst", "w", iters = iters)
      .as[(Long, Long)].collect().toMap

  test("triangle counts are layout-invariant") {
    val e = (for (i <- 1L to 8L; j <- (i + 1) to 8L if (i + j) % 3 != 0)
      yield (i, j)).toDF("a", "b")
    val one = Graph.triangleCounts(e.repartition(1), "a", "b")
      .as[(Long, Long)].collect().toMap
    val many = Graph.triangleCounts(e.repartition(5), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(one == many && one.nonEmpty)
  }

  private def hitsScores(e: DataFrame, iters: Int = 3): Map[Long, (Long, Long)] =
    Graph.hits(e, "src", "dst", iters = iters)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("HITS: broad buyer out-hubs narrow buyers, shared part out-auths niche parts") {
    // customers 1,2,3 → part 100; customer 1 additionally → 101, 102
    val e = Seq((1L, 100L), (2L, 100L), (3L, 100L), (1L, 101L), (1L, 102L))
      .toDF("src", "dst")
    val r = hitsScores(e)
    assert(r(1L)._1 > r(2L)._1)            // hub: 1 beats 2
    assert(r(2L)._1 == r(3L)._1)           // symmetric customers tie
    assert(r(100L)._2 > r(101L)._2)        // authority: 100 beats 101
    assert(r(101L)._2 == r(102L)._2)       // symmetric parts tie
  }

  test("HITS: bipartite sides are pure — customers carry no authority, parts no hub mass") {
    val e = Seq((1L, 100L), (2L, 100L), (2L, 101L)).toDF("src", "dst")
    val r = hitsScores(e)
    Seq(1L, 2L).foreach(c => assert(r(c)._2 == 0L))
    Seq(100L, 101L).foreach(p => assert(r(p)._1 == 0L))
  }

  test("HITS: each L1 normalization restores ~Total mass (bounded flooring loss)") {
    val e = Seq((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L), (3L, 102L))
      .toDF("src", "dst")
    val r = hitsScores(e)
    val auth = r.values.map(_._2).sum
    val hub = r.values.map(_._1).sum
    // flooring drops < 1 unit per node per normalization
    assert(auth <= 1000000000000L && auth > 1000000000000L - 10L)
    assert(hub <= 1000000000000L && hub > 1000000000000L - 10L)
  }

  test("HITS scores are bit-identical across partition layouts") {
    val e = (for (c <- 1L to 9L; p <- 100L to 109L if (c * 7 + p) % 3 != 0)
      yield (c, p)).toDF("src", "dst")
    assert(hitsScores(e.repartition(1)) == hitsScores(e.repartition(7)))
  }

  test("shortest paths: weighted multi-source Bellman-Ford, hop-bounded, layout-invariant") {
    // path 1 -2- 2 -5- 3 -1- 4, separate pair 9 -7- 10; seeds {1, 10}
    val e = Seq((1L, 2L, 2L), (2L, 3L, 5L), (3L, 4L, 1L), (9L, 10L, 7L))
      .toDF("src", "dst", "w")
    val sym = e.union(e.select(col("dst"), col("src"), col("w")))
    val seeds = Seq(1L, 10L).toDF("id")
    val d = Graph.shortestPaths(sym, "src", "dst", "w", seeds, "id", rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 2L, 3L -> 7L, 4L -> 8L,
      10L -> 0L, 9L -> 7L))
    // the K-round contract: one round relaxes exactly one hop
    val d1 = Graph.shortestPaths(sym, "src", "dst", "w",
        Seq(1L).toDF("id"), "id", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 2L))
    val dr = Graph.shortestPaths(sym.repartition(7), "src", "dst", "w",
        seeds, "id", rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(dr == d)
    // the driver gate, the RDD round loop and the DataFrame loop are
    // bit-identical
    val drdd = Graph.shortestPaths(sym, "src", "dst", "w", seeds, "id",
        rounds = 6, localMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(drdd == d)
    val ddf = Graph.shortestPaths(sym, "src", "dst", "w", seeds, "id",
        rounds = 6, forceDataFrameLoop = true)
      .as[(Long, Long)].collect().toMap
    assert(ddf == d)
  }

  test("label propagation: bridged cliques form two communities inside one component") {
    // K4 on {1..4} + K4 on {11..14} + one bridge edge (4, 11): connected
    // components would merge everything; LPA keeps the density classes
    val cliq = for (s <- Seq(1L, 11L); i <- 0 to 3; j <- (i + 1) to 3)
      yield (s + i, s + j)
    val e = (cliq :+ ((4L, 11L))).toDF("a", "b")
    val l = Graph.labelPropagation(e, "a", "b", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(Set(1L, 2L, 3L, 4L).map(l).size == 1)
    assert(Set(11L, 12L, 13L, 14L).map(l).size == 1)
    assert(l(1L) != l(11L))
    // deterministic across partition layouts
    val r = Graph.labelPropagation(e.repartition(7), "a", "b", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == l)
    // the driver gate (default) is bit-identical to the forced-distributed
    // round loop
    val dist = Graph.labelPropagation(e, "a", "b", iters = 4,
        localMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == l)
  }

  test("HITS RDD loop is bit-identical to the DataFrame loop; empty input refused") {
    // bipartite (disjoint hub/authority sides) and a directed graph whose
    // nodes play both roles (exercises the full-outer score merge)
    val bip = Seq((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L), (3L, 102L),
      (1L, 102L)).toDF("src", "dst")
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    for (e <- Seq(bip, dir)) {
      def run(df: Boolean) = Graph.hits(e, "src", "dst", iters = 3,
        forceDataFrameLoop = df)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(run(false) == run(true))
    }
    intercept[IllegalArgumentException] {
      Graph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    }
  }

  test("personalized PageRank RDD loop is bit-identical to the DataFrame loop") {
    // all-receiving (symmetric union) and isolated-receiver total shapes
    val symg = sym((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (2L, 4L, 3L))
    // total (every node has out-edges) but node 3 receives nothing
    val iso = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 1L, 2L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L, 3L).toDF("id")
    for (e <- Seq(symg, iso)) {
      // driver gate (default) vs forced-distributed RDD loop vs DataFrame
      // loop — all three bit-identical
      val local = Graph.personalizedPageRank(e, "src", "dst", "w",
        seeds, "id", iters = 5)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val rdd = Graph.personalizedPageRank(e, "src", "dst", "w",
        seeds, "id", iters = 5, localMaxEdges = 0L)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val df = Graph.personalizedPageRank(e, "src", "dst", "w",
        seeds, "id", iters = 5, forceDataFrameLoop = true)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(local == rdd)
      assert(rdd == df)
    }
  }

  private def raPairs(e: DataFrame, maxDeg: Long = 1024L): Map[(Long, Long), (Long, Long)] =
    Graph.linkPredictRA(e, "a", "b", maxDeg)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("RA link prediction: wedge through one shared neighbour, score = Total/deg") {
    // path 2 - 1 - 3: candidate (2,3) via z=1, deg(1)=2
    val r = raPairs(Seq((1L, 2L), (1L, 3L)).toDF("a", "b"))
    assert(r == Map((2L, 3L) -> (1L, 500000000000L)))
  }

  test("RA link prediction: existing edges are never candidates") {
    val r = raPairs(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b"))
    // triangle: every wedge closes an EXISTING edge → nothing to predict
    assert(r.isEmpty)
  }

  test("RA link prediction: multiple common neighbours accumulate") {
    // 1 and 2 share neighbours 10 (deg 2) and 11 (deg 4)
    val r = raPairs(Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 11L), (4L, 11L)).toDF("a", "b"))
    assert(r((1L, 2L))._1 == 2L)
    assert(r((1L, 2L))._2 == 500000000000L + 250000000000L)
  }

  test("RA link prediction: super-hub wedges are excluded by the degree cap") {
    // star hub 1 with 5 leaves; cap 4 removes every wedge
    val star = (2L to 6L).map(l => (1L, l)).toDF("a", "b")
    assert(raPairs(star, maxDeg = 4L).isEmpty)
    assert(raPairs(star, maxDeg = 5L).size == 10) // all leaf pairs back
  }

  test("RA link prediction is layout-invariant") {
    val e = (for (i <- 1L to 7L; j <- (i + 1) to 7L if (i * 3 + j) % 4 != 0)
      yield (i, j)).toDF("a", "b")
    assert(raPairs(e.repartition(1)) == raPairs(e.repartition(5)))
  }

  private def jacPairs(e: DataFrame, maxDeg: Long = 1024L): Map[(Long, Long), (Long, Long)] =
    Graph.linkPredictJaccard(e, "a", "b", maxDeg)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("Jaccard link prediction: path wedge scores |∩|/|∪| exactly") {
    // path 2 - 1 - 3: candidate (2,3), Γ(2)={1}, Γ(3)={1} → J = 1/1
    val r = jacPairs(Seq((1L, 2L), (1L, 3L)).toDF("a", "b"))
    assert(r == Map((2L, 3L) -> (1L, 1000000000000L)))
    // triangle: every wedge closes an existing edge → nothing predicted
    assert(jacPairs(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")).isEmpty)
  }

  test("Jaccard link prediction: hub cap prunes wedges, denominators stay FULL") {
    // x=1, y=2 share z=10 (deg 2, kept); x also touches hub 11 (deg 4)
    val e = Seq((1L, 10L), (2L, 10L), (1L, 11L), (3L, 11L), (4L, 11L),
      (5L, 11L)).toDF("a", "b")
    val r = jacPairs(e, maxDeg = 3L)
    // n_common counts only the capped wedge (z=10); deg(1)=2 includes the
    // hub edge → J(1,2) = 1 / (2 + 1 − 1) = 0.5
    assert(r((1L, 2L)) == (1L, 500000000000L))
    // no candidate is built THROUGH the hub: (3,4) share only z=11
    assert(!r.contains((3L, 4L)))
  }

  test("Jaccard link prediction is layout-invariant") {
    val e = (for (i <- 1L to 7L; j <- (i + 1) to 7L if (i * 3 + j) % 4 != 0)
      yield (i, j)).toDF("a", "b")
    assert(jacPairs(e.repartition(1)) == jacPairs(e.repartition(5)))
  }

  test("random walks replay the md5-argmin recurrence hop for hop") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val seeds = Seq(1L, 4L, 99L) // 99 is isolated: its walks emit nothing
    val got = Graph.randomWalks(edges.toDF("a", "b"), "a", "b",
        seeds.toDF("id"), "id", walksPerSeed = 2, steps = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // driver replica of the contract: next = argmin_v md5("seed_walk_t_v")
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val want = for {
      seed <- seeds; walk <- 1L to 2L
      (step, node) <- (1L to 3L).scanLeft((0L, seed)) { case ((_, u), t) =>
        (t, nbrs.get(u).map(_.minBy(v => md5(s"${seed}_${walk}_${t}_$v")))
          .getOrElse(-1L))
      }.tail if node != -1L
    } yield (seed, walk, step, node)
    assert(got == want.toSet)
    assert(!got.exists(_._1 == 99L))
    // the driver gate (default) is bit-identical to the forced-distributed
    // round loop
    val dist = Graph.randomWalks(edges.toDF("a", "b"), "a", "b",
        seeds.toDF("id"), "id", walksPerSeed = 2, steps = 3,
        localMaxEdges = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(dist == got)
  }

  test("local clustering: clique scores 1e12, star hub 0, deg<2 excluded") {
    // K3 plus a pendant (4-1), plus star hub 10 with 3 mutually-unlinked
    // leaves: clique corners cc=1 (node 1's extra pendant drops it to
    // 1/3), hub cc=0, pendant/leaves (deg 1) excluded entirely
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("a", "b")
    val got = Graph.localClustering(e, "a", "b")
      .select("id", "deg", "n_tri", "cc_fp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      1L -> (3L, 1L, 333333333333L), // 2·1·1e12 div (3·2)
      2L -> (2L, 1L, 1000000000000L),
      3L -> (2L, 1L, 1000000000000L),
      10L -> (3L, 0L, 0L)))
  }

  test("random walks are layout-invariant") {
    val e = (for (i <- 1L to 9L; j <- (i + 1) to 9L if (i + j) % 3 != 0)
      yield (i, j)).toDF("a", "b")
    val seeds = Seq(1L, 5L, 9L).toDF("id")
    def run(df: DataFrame) = Graph.randomWalks(df, "a", "b",
        seeds, "id", walksPerSeed = 2, steps = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(e.repartition(1)) == run(e.repartition(7)))
  }

  private def trussRounds(pairs: (Long, Long)*): Seq[(Int, Long, Long)] =
    trussRoundsGate(16384L, pairs: _*)

  private def trussRoundsGate(gate: Long,
                              pairs: (Long, Long)*): Seq[(Int, Long, Long)] =
    Graph.kTruss(pairs.toDF("a", "b"), "a", "b", k = 4, rounds = 3,
        localMaxEdges = gate)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq

  test("k-truss: K4 is its own 4-truss — every edge closes 2 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(trussRounds(k4: _*) ==
      Seq((1, 4L, 6L), (2, 4L, 6L), (3, 4L, 6L)))
  }

  test("k-truss: a pendant triangle on K4 peels in round 1") {
    // K4 on 1..4 plus triangle (3,4,5): edges (3,5),(4,5) close ONE
    // triangle each; (3,4) closes 3 — the pendant dies, K4 survives,
    // and (3,4)'s support falls back to 2 within the survivor set
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(trussRounds(k4 ++ Seq((3L, 5L), (4L, 5L)): _*) ==
      Seq((1, 4L, 6L), (2, 4L, 6L), (3, 4L, 6L)))
  }

  test("k-truss: a degree-1000 hub doesn't blow up the wedge join") {
    // Hub 0 linked to leaves 1..1000; nodes 1..5 also form K5. Unoriented,
    // the hub alone would emit ~10^6 wedge rows PER ROUND (deg² at the hub);
    // degree-oriented, hub wedges are bounded by the orientation (the hub
    // is the (degree, id)-largest endpoint of every edge, so its
    // out-degree is 0). Triangle math: edge (0,i≤5) closes 4 triangles,
    // K5-internal edges close 4 (3 clique + hub), hub-leaf edges (j>5)
    // close 0 — so round 1 peels exactly to K6 on {0..5} and the 4-truss
    // fixed point holds from there.
    val hub = (1L to 1000L).map(j => (0L, j))
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    // gate = 0 FORCES the distributed oriented loop — this fixture pins
    // the wedge bound, so it must never slip through the driver gate
    assert(trussRoundsGate(0L, hub ++ k5: _*) ==
      Seq((1, 6L, 15L), (2, 6L, 15L), (3, 6L, 15L)))
  }

  test("k-truss: driver gate is bit-equal to the distributed loop") {
    // mixed fixture: K4 + pendant triangle + a path tail — exercises
    // survive/peel/cascade in one graph on BOTH paths
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val fix = k4 ++ Seq((3L, 5L), (4L, 5L), (5L, 6L), (6L, 7L))
    assert(trussRoundsGate(0L, fix: _*) == trussRoundsGate(16384L, fix: _*))
  }

  test("k-truss: two triangles sharing an edge cascade to empty") {
    // {a,b,c} + {b,c,d}: (b,c) has support 2 and survives round 1 while
    // every other edge (support 1) dies; round 2 kills (b,c) too —
    // the cascade a fixed-round peel must expose
    val got = trussRounds((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(got == Seq((1, 2L, 1L), (2, 0L, 0L), (3, 0L, 0L)))
  }
}
