package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables. The reference has no graph
  * operator; this extends the engine with the canonical iterative-compute
  * pattern (Pregel-style synchronous rounds as join + re-aggregate) that
  * a link-analysis or influence stage of a data pipeline needs.
  *
  * Determinism: PageRank is usually run in floating point, where the
  * per-node Σ of neighbor contributions depends on reduction order —
  * NOT reproducible across partitionings, let alone engines. Here every
  * rank is an exact 64-bit integer in fixed-point units of 1e-12 of the
  * total mass: contributions are `(pr · 85 · w) div (100 · W)` integer
  * ops, and integer addition is associative — so the result is
  * bit-identical across layouts and engines (the DuckDB oracle replays
  * the same recurrence), and the layout-invariance gate covers it like
  * any other query.
  */
object Graph {

  private val Total = 1000000000000L // 1e12 fixed-point mass
  private val Base = Total * 15 / 100 // (1 - damping) numerator, d = 0.85

  /** Materialization for the iterative ops, with bounded cache lifetime:
    * plain lazy `persist` (measured 4-5x cheaper here than eager
    * localCheckpoint, whose per-materialization jobs forgo the single
    * action's stage pipelining / exchange reuse), plus a one-generation
    * registry — each public op first unpersists everything the PREVIOUS
    * invocation cached (its result is long materialized by then), so
    * repeated bench invocations hold at most one generation of graph
    * cache instead of accumulating for the session (advisor finding,
    * round 6). Unpersisting is safe at any time: a late re-read of a
    * retired frame just recomputes its lineage. */
  private val generation = new scala.collection.mutable.ArrayBuffer[DataFrame]
  private def retireLastGeneration(): Unit = generation.synchronized {
    generation.foreach(_.unpersist(blocking = false))
    generation.clear()
  }
  private def mat(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    generation.synchronized { generation += p }
    p
  }

  /** Edge-list NORMALIZATION front for the undirected graph ops
    * ([[triangleCounts]], [[kCorePeel]], [[kCoreConverged]],
    * [[connectedComponents]], [[connectedComponentsStar]]): those
    * operators require a SIMPLE graph as deduplicated `a < b` pairs, but
    * real edge lists carry self-loops, duplicate rows, and both
    * orientations of the same edge. This drops null endpoints and
    * self-loops, canonicalizes each edge to (least, greatest), and
    * dedups — idempotent on already-clean input, so routing a clean
    * fixture through it changes nothing (spec-proven). One projection +
    * one distinct (a single shuffle on the pair key); at 100 TB this is
    * the standard ingest step before any iterative op, paid once.
    */
  def normalize(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol); val b = col(bCol)
    edges.filter(a.isNotNull && b.isNotNull && a =!= b)
      .select(least(a, b).as(aCol), greatest(a, b).as(bCol))
      .distinct()
  }

  /** DIRECTED-edge normalization front for [[pageRank]] /
    * [[pageRankConverged]]: drops null endpoints and self-loops (a
    * self-link contributes rank to itself — standard link-analysis
    * hygiene is to remove them), and merges duplicate (src, dst) rows by
    * SUMMING their weights — the same observed link twice is twice the
    * weight, not two edges (the recurrence divides by total out-weight,
    * so splitting vs merging duplicates is arithmetically identical
    * there, but merged edges make the edge⋈rank join linear in DISTINCT
    * links). Idempotent on clean input (spec-proven). One filter + one
    * (src, dst) aggregation — a single shuffle, the standard paid-once
    * ingest step.
    */
  def normalizeDirected(edges: DataFrame, srcCol: String, dstCol: String,
                        wCol: String): DataFrame =
    edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .groupBy(srcCol, dstCol).agg(sum(col(wCol)).as(wCol))

  /** Weighted PageRank over a GENERAL directed edge list. Dangling nodes
    * (out-weight 0) redistribute their damped mass uniformly: each round,
    * pr'(v) = Base/n + Σ_{u→v} (pr(u)·85·w)/(100·tw(u)) + (D·85)/(100·n)
    * where D = Σ pr over dangling nodes — every term in the same 1e-12
    * integer fixed-point, so the result stays bit-identical across
    * layouts/engines (DuckDB replays the identical recurrence). On a
    * total edge list (every node has out-weight > 0) D = 0 every round
    * and the recurrence reduces exactly to the dangling-free form.
    * Returns (id, pr) with pr in 1e-12 units.
    *
    * Scale: the edge table (with its per-source total weight) is
    * materialized once ([[mat]]) so the 5-iteration plan never re-derives
    * the caller's (possibly expensive) lineage, and each iteration is ONE
    * join of the rank relation against edges on the source key plus ONE
    * re-aggregate on the destination key — the dangling-graph path adds a
    * |V|-row anti-join + scalar sum and a left join back onto the node
    * relation (isolated receivers keep earning base + dangling mass).
    * The rank relation (|V| rows) shuffles per round, edges only at
    * materialization. Driver state: the node count and two structure
    * flags.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int = 5,
               forceDataFrameLoop: Boolean = false,
               localMaxEdges: Long = 65536L): DataFrame = {
    // cap 200: [[pageRankConverged]] replays this recurrence to its exact
    // integer fixed point, whose slow flooring tail can run past 50 rounds
    // even on small graphs
    require(iters >= 1 && iters <= 200)
    retireLastGeneration()
    // materialize the INPUT lineage exactly once: every derived relation
    // below (out-weights, node set, totality probes, the per-round join
    // input) reads the cached edge relation, never the caller's plan
    val ed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).as("w"))
      .transform(mat)
    // Small-graph driver gate (the [[pageRankConvergedLocal]] / kTruss
    // precedent): a ≤`localMaxEdges` integral edge list runs the identical
    // fixed-iteration recurrence in a driver array loop — same Long
    // arithmetic, same total/dangling branches, bit-equal to both
    // distributed loops (spec-proven) — instead of paying ~10 tiny-job
    // round trips of setup probes + per-round scheduling that dwarf the
    // data work. One limit-probed collect decides; `localMaxEdges = 0`
    // (or a non-integral schema) keeps the distributed path, which
    // remains the 100 TB shape.
    smallGraphEdges(ed, "src", "dst", Some("w"), localMaxEdges,
        forceDataFrameLoop).foreach { es =>
      return pageRankLocalFixed(ed.sparkSession, es,
        ed.schema("src").dataType, iters)
    }
    val ow = ed.groupBy("src").agg(sum(col("w")).as("tw"))
    // e feeds one join per iteration — materialize the ow join once too
    val e = ed.join(ow, "src").transform(mat)
    val nodes = ed.select(col("src").as("id"))
      .union(ed.select(col("dst").as("id")))
      .distinct()
    val srcs = ow.select("src")
    // driver-side setup scalars: |V| plus two structure flags, each a tiny
    // count over already-materialized relations
    val n = nodes.count()
    val base = Base / n // integer division — DuckDB's `//` for positives
    // every node has out-weight → the dangling mass is provably 0 every
    // round; every node has in-edges → the per-round left join against
    // the node relation changes nothing (every node receives a
    // contribution row). When both hold (e.g. any symmetric graph) the
    // recurrence reduces exactly — bit-for-bit — to the lean
    // one-join-one-aggregate loop, so that is the plan we run.
    val total = ow.count() == n
    val allReceive = e.select("dst").distinct().count() == n

    // Integral ids and weights take the RDD round loop (below): same
    // integer recurrence, but the edge relation is hash-partitioned by
    // source ONCE and every round's rank join is co-partitioned (narrow)
    // — one shuffle per round (the dst re-aggregate) at ANY scale, where
    // the DataFrame loop re-plans per round and, past the broadcast
    // threshold, re-shuffles edges every round. Non-integral inputs keep
    // the DataFrame loop (also forced by specs for the parity proof).
    val integral = {
      import org.apache.spark.sql.types._
      def ok(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      ok(ed.schema("src").dataType) && ok(ed.schema("dst").dataType) &&
        ok(ed.schema("w").dataType)
    }
    if (integral && !forceDataFrameLoop)
      return pageRankRdd(e, nodes, srcs, n, base, total, allReceive, iters)

    var pr = nodes.select(col("id"), lit(Total / n).as("pr"))
    (1 to iters).foreach { _ =>
      // the rank relation is |V| rows, tiny next to edges: AQE broadcasts
      // it per round (measured 2x faster than a FORCED broadcast hint,
      // whose eager driver-side build serializes the rounds); on a
      // cluster where |V| outgrows broadcast the same plan degrades
      // gracefully to a co-partitioned shuffle on the node key
      val contrib = e.join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("(pr * 85 * w) div (100 * tw)").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
      pr =
        if (total && allReceive)
          // single pr reference per round → LINEAR lineage; no per-round
          // materialization needed (matches the lean historical plan)
          contrib.select(col("dst").as("id"), (lit(base) + col("s")).as("pr"))
        else {
          val received = nodes
            .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
          val next =
            if (total)
              received.select(col("id"),
                (lit(base) + coalesce(col("s"), lit(0L))).as("pr"))
            else {
              // dangling mass D: ranks of nodes with no out-edges. pr is
              // referenced TWICE per round here (contributions + this
              // scalar) — without the mat() below the rank lineage would
              // DOUBLE each round and the final action would replay the
              // chain 2^iters times
              val dang = pr.join(srcs, pr("id") === srcs("src"), "left_anti")
                .agg(coalesce(sum("pr"), lit(0L)).as("dm"))
              received.crossJoin(broadcast(dang))
                .select(col("id"),
                  (lit(base) + coalesce(col("s"), lit(0L)) +
                    expr(s"(dm * 85) div (100 * $n)")).as("pr"))
            }
          // |V| rows; localCheckpoint (not persist) truncates the rank
          // lineage so the doubled per-round reference cannot grow the
          // plan tree exponentially across rounds
          next.localCheckpoint(eager = true)
        }
    }
    pr.select("id", "pr")
  }

  /** Personalized (topic-sensitive) PageRank, Haveliwala 2002: the
    * teleport mass lands on a SEED set instead of uniformly — the ranking
    * primitive behind "items related to THIS topic/basket" on the
    * co-purchase graph. Same exact integer fixed-point arithmetic as
    * [[pageRank]] (Total = 1e12 mass, 0.85 damping, positive-operand
    * floor division), so the DuckDB oracle unrolls the identical
    * recurrence: pr0 = Total//|S| on seeds else 0; each round every node
    * earns its in-mass and seeds additionally earn (15%·Total)//|S|.
    * Restricted to TOTAL graphs (every node has out-edges — any
    * symmetric edge union qualifies): no dangling scalar, one join + one
    * aggregate per round, rank relation |V| rows. Seeds outside the
    * graph hold no mass (intersected with the node set). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           wCol: String, seeds: DataFrame, seedIdCol: String,
                           iters: Int = 5,
                           forceDataFrameLoop: Boolean = false,
                           localMaxEdges: Long = 65536L): DataFrame = {
    require(iters >= 1 && iters <= 200)
    retireLastGeneration()
    val ed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).as("w"))
      .transform(mat)
    // small-graph driver gate — see [[pageRank]]; the seed relation rides
    // the same limit-probed collect (an over-cap seed set falls through)
    if (integralCol(seeds, seedIdCol))
      smallGraphEdges(ed, "src", "dst", Some("w"), localMaxEdges,
          forceDataFrameLoop).foreach { es =>
        val cap = math.max(0L, math.min(localMaxEdges,
          (Int.MaxValue - 1).toLong)).toInt
        val sdProbe = seeds.select(col(seedIdCol).cast("long").as("id"))
          .distinct().limit(cap + 1).collect()
        if (sdProbe.length <= cap)
          return personalizedPageRankLocal(ed.sparkSession, es,
            sdProbe.map(_.getLong(0)), ed.schema("src").dataType, iters)
      }
    val ow = ed.groupBy("src").agg(sum(col("w")).as("tw"))
    val e = ed.join(ow, "src").transform(mat)
    val nodes = ed.select(col("src").as("id"))
      .union(ed.select(col("dst").as("id")))
      .distinct()
      .transform(mat)
    val n = nodes.count()
    require(ow.count() == n,
      "personalizedPageRank requires a total graph (every node has " +
        "out-edges); pass the symmetric edge union")
    val sd = seeds.select(col(seedIdCol).as("id")).distinct()
      .join(nodes, "id").transform(mat)
    val nS = sd.count()
    require(nS > 0, "personalizedPageRank: empty seed set")
    val seedBase = sd.select(col("id"), lit(Base / nS).as("sb")).transform(mat)
    // every node receives a contribution row (true on any symmetric
    // union — the expected input shape): the per-round node left join is
    // provably a no-op, so the round reduces to join → aggregate → one
    // tiny seed join, pr referenced once → LINEAR lineage, zero
    // per-round driver actions (the same lean-plan reduction pageRank
    // applies on total all-receiving graphs)
    val allReceive = e.select("dst").distinct().count() == n
    // Integral ids/weights take the co-partitioned RDD round loop — same
    // integer recurrence (spec-proven bit-equal), edges hash-partitioned
    // by src ONCE, one shuffle per round (the dst re-aggregate), zero
    // per-round Catalyst planning. Non-integral inputs (and the parity
    // spec) keep the DataFrame loop below.
    val integral = {
      import org.apache.spark.sql.types._
      def ok(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      ok(ed.schema("src").dataType) && ok(ed.schema("dst").dataType) &&
        ok(ed.schema("w").dataType)
    }
    if (integral && !forceDataFrameLoop)
      return personalizedPageRankRdd(e, nodes, sd, n, nS, allReceive, iters)
    var pr = nodes
      .join(sd.select(col("id"), lit(Total / nS).as("p0")), Seq("id"), "left")
      .select(col("id"), coalesce(col("p0"), lit(0L)).as("pr"))
    (1 to iters).foreach { _ =>
      val contrib = e.join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("(pr * 85 * w) div (100 * tw)").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
      pr =
        if (allReceive)
          contrib
            .join(seedBase.withColumnRenamed("id", "dst"), Seq("dst"), "left")
            .select(col("dst").as("id"),
              (coalesce(col("sb"), lit(0L)) + col("s")).as("pr"))
        else {
          // keep ALL nodes in the relation: a node whose in-mass floors
          // to zero still appears (rank 0), like pageRank's output.
          // Doubled node-relation reference per round → truncate lineage.
          nodes
            .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
            .join(seedBase, Seq("id"), "left")
            .select(col("id"),
              (coalesce(col("sb"), lit(0L)) + coalesce(col("s"), lit(0L))).as("pr"))
            .localCheckpoint(eager = true)
        }
    }
    pr.select("id", "pr")
  }

  /** The personalized-PageRank round loop as RDDs over integral
    * ids/weights — same exact integer recurrence as the DataFrame loop
    * above (spec-proven bit-equal on all-receiving and
    * isolated-receiver total graphs), same machinery as [[pageRankRdd]]:
    * edges (with per-source total weight) hash-partition by src once and
    * persist, every round's rank join is co-partitioned → narrow, the
    * per-round shuffle is the |V|-row contribution re-aggregate only,
    * and the seed-teleport relation is a persisted co-partitioned RDD
    * joined narrowly each round. On an all-receiving graph (any
    * symmetric union) the rounds chain lazily into one linear-lineage
    * job — zero per-round driver actions and zero per-round Catalyst
    * planning (the q_components finding). */
  private def personalizedPageRankRdd(e: DataFrame, nodes: DataFrame,
                                      sd: DataFrame, n: Long, nS: Long,
                                      allReceive: Boolean,
                                      iters: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = e.sparkSession
    import spark.implicits._
    val idType = nodes.schema("id").dataType
    val p = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 5000L + 1L)).toInt
    val part = new HashPartitioner(p)
    val edges: RDD[(Long, (Long, Long, Long))] = e
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"), col("tw").cast("long"))
      .as[(Long, Long, Long, Long)].rdd
      .map { case (s, d, w, tw) => (s, (d, w, tw)) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val nodesR: RDD[(Long, Unit)] = nodes
      .select(col("id").cast("long")).as[Long].rdd
      .map((_, ())).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val seedBase = Base / nS
    val sbR: RDD[(Long, Long)] = sd
      .select(col("id").cast("long")).as[Long].rdd
      .map((_, seedBase)).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var pr: RDD[(Long, Long)] = nodesR.leftOuterJoin(sbR, part)
      .mapValues { case (_, s) => if (s.isDefined) Total / nS else 0L }
    var prevStore: RDD[_] = null
    (1 to iters).foreach { _ =>
      val contrib = edges.join(pr, part)
        .map { case (_, ((d, w, tw), prv)) =>
          (d, Math.multiplyExact(Math.multiplyExact(prv, 85L), w) /
            Math.multiplyExact(100L, tw))
        }
        .reduceByKey(part, (a, b) => Math.addExact(a, b)) // the ONE shuffle
      pr =
        if (allReceive)
          // every node receives → contrib's key set IS the node set; one
          // rank reference per round → lazy linear-lineage chain
          contrib.leftOuterJoin(sbR, part).mapValues { case (s, sb) =>
            Math.addExact(sb.getOrElse(0L), s)
          }
        else {
          // keep zero-rank nodes in the relation, like the DataFrame loop
          val stored = nodesR.leftOuterJoin(contrib, part)
            .leftOuterJoin(sbR, part)
            .mapValues { case ((_, s), sb) =>
              Math.addExact(sb.getOrElse(0L), s.getOrElse(0L))
            }
            .persist(StorageLevel.MEMORY_AND_DISK)
          if (prevStore != null) prevStore.unpersist(blocking = false)
          prevStore = stored
          stored
        }
    }
    val out = spark.createDataFrame(pr).toDF("id", "pr")
      .select(col("id").cast(idType).as("id"), col("pr"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    nodesR.unpersist(blocking = false)
    sbR.unpersist(blocking = false)
    if (prevStore != null) prevStore.unpersist(blocking = false)
    out
  }

  /** The PageRank round loop as RDDs over integral ids/weights — same
    * exact integer recurrence as the DataFrame loop (Math.multiplyExact/
    * addExact mirror ANSI overflow-throws; `div` operands are all
    * positive so `/` is the same floor), spec-proven bit-equal on the
    * total, dangling, and isolated-receiver shapes. What it buys:
    *  - edges (with per-source total weight) hash-partition by src ONCE
    *    and persist; every round's rank join is co-partitioned → narrow.
    *    The DataFrame loop relies on AQE broadcasting the |V|-row rank
    *    relation per round — fine while |V| broadcasts, but past that
    *    threshold it degrades to re-shuffling EDGES every round; here
    *    the per-round shuffle is the contribution re-aggregate (|V|-row)
    *    only, at any scale.
    *  - zero per-round Catalyst planning (the q_components finding).
    *  - on a total all-receiving graph the rounds chain lazily into one
    *    linear-lineage job, zero per-round actions; the dangling path
    *    pays its one scalar action per round exactly like the DataFrame
    *    loop's dangling-mass aggregate.
    */
  private def pageRankRdd(e: DataFrame, nodes: DataFrame, srcs: DataFrame,
                          n: Long, base: Long, total: Boolean,
                          allReceive: Boolean, iters: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = e.sparkSession
    import spark.implicits._
    val idType = nodes.schema("id").dataType
    val p = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 5000L + 1L)).toInt
    val part = new HashPartitioner(p)
    val edges: RDD[(Long, (Long, Long, Long))] = e
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"), col("tw").cast("long"))
      .as[(Long, Long, Long, Long)].rdd
      .map { case (s, d, w, tw) => (s, (d, w, tw)) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val nodesR: RDD[(Long, Unit)] = nodes
      .select(col("id").cast("long")).as[Long].rdd
      .map((_, ())).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // dangling-node SET is static graph structure: derive it once
    val dangR: Option[RDD[(Long, Unit)]] =
      if (total) None
      else Some(nodes
        .join(srcs, nodes("id") === srcs("src"), "left_anti")
        .select(col("id").cast("long")).as[Long].rdd
        .map((_, ())).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK))
    val lean = total && allReceive
    var pr: RDD[(Long, Long)] = nodesR.mapValues(_ => Total / n)
    var prevStore: RDD[_] = null
    (1 to iters).foreach { _ =>
      val contrib = edges.join(pr, part)
        .map { case (_, ((d, w, tw), prv)) =>
          (d, Math.multiplyExact(Math.multiplyExact(prv, 85L), w) /
            Math.multiplyExact(100L, tw))
        }
        .reduceByKey(part, (a, b) => Math.addExact(a, b)) // the ONE shuffle
      val next: RDD[(Long, Long)] =
        if (lean) contrib.mapValues(s => Math.addExact(base, s))
        else {
          val dangTerm: Long =
            if (total) 0L
            else {
              // one scalar action per round — same as the DataFrame
              // loop's dangling-mass aggregate; it also materializes the
              // previous round's persisted ranks
              val dm = pr.join(dangR.get, part).map(_._2._1)
                .fold(0L)(Math.addExact)
              Math.multiplyExact(dm, 85L) / Math.multiplyExact(100L, n)
            }
          nodesR.leftOuterJoin(contrib, part).mapValues { case (_, s) =>
            Math.addExact(Math.addExact(base, s.getOrElse(0L)), dangTerm)
          }
        }
      pr =
        if (lean) next // single rank reference per round → linear lineage
        else {
          val stored = next.persist(StorageLevel.MEMORY_AND_DISK)
          if (prevStore != null) prevStore.unpersist(blocking = false)
          prevStore = stored
          stored
        }
    }
    val out = spark.createDataFrame(pr).toDF("id", "pr")
      .select(col("id").cast(idType).as("id"), col("pr"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    nodesR.unpersist(blocking = false)
    dangR.foreach(_.unpersist(blocking = false))
    if (prevStore != null) prevStore.unpersist(blocking = false)
    out
  }

  /** [[pageRank]] run TO ITS EXACT INTEGER FIXED POINT: because ranks
    * are 64-bit integers in 1e-12 fixed point, the per-round map is a
    * deterministic integer function — when a check window reproduces its
    * input exactly (L1 delta 0), every later round does too, so the stop
    * is DETECTED, not approximated. Returns (id, pr, n_iters) where
    * n_iters is the first CHECKED round count whose ranks equal the
    * previous check's.
    *
    * Round count and batching: the L1 imbalance contracts by the damping
    * factor 0.85 per round, so draining ~10¹² initial units to zero
    * takes ≈ log(10¹²)/log(1/0.85) ≈ 170 rounds — checking (and
    * checkpointing) every round would pay ~170 driver barriers for a
    * tiny per-round join. On a TOTAL all-receiving graph (e.g. any
    * symmetric one) each round references the rank relation exactly
    * once, so `checkEvery` rounds chain into ONE linear-lineage job
    * between delta checks: the loop runs ~11 checkpoint+delta cycles
    * instead of 170. Convergence is then confirmed at a multiple of
    * `checkEvery` (the deterministic check schedule the oracle replays);
    * a graph with dangling nodes references the rank relation twice per
    * round (contributions + dangling scalar), so it checks — and
    * truncates lineage — every round. `maxIters` guards a recurrence
    * that cycles instead of fixing (floor division can in principle
    * oscillate): the operator then fails loudly rather than returning a
    * non-fixed-point.
    *
    * Small-graph gate: running ~170 synchronous rounds through the
    * cluster scheduler on a graph that FITS ON THE DRIVER is pure
    * fixed-overhead (measured ~20 s for a 2,350-node graph at ~0.1 s a
    * round) — so below `localMaxNodes` nodes (and 8× that edges, both
    * known from counts the distributed path needs anyway) the identical
    * integer recurrence, check schedule and stop rule run in a driver
    * array loop instead: same Long arithmetic, bit-for-bit the same
    * (pr, n_iters) (spec-proven against the forced-distributed path).
    * This is the [[graft.ops.Dedup]] thresholded-union-find pattern: the
    * distributed loop IS the 100 TB path; the local solve removes the
    * per-round scheduler tax exactly when the data says it is safe.
    * `localMaxNodes = 0` forces the distributed path.
    */
  def pageRankConverged(edges: DataFrame, srcCol: String, dstCol: String,
                        wCol: String, maxIters: Int = 320,
                        checkEvery: Int = 16,
                        localMaxNodes: Int = 65536,
                        forceDataFrameLoop: Boolean = false): DataFrame = {
    require(maxIters >= 1 && checkEvery >= 1)
    retireLastGeneration()
    val ed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).as("w"))
      .transform(mat)
    val ow = ed.groupBy("src").agg(sum(col("w")).as("tw"))
    val e = ed.join(ow, "src").transform(mat)
    val nodes = ed.select(col("src").as("id"))
      .union(ed.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = true)
    val srcs = ow.select("src")
    val n = nodes.count()
    val integralIds = {
      import org.apache.spark.sql.types._
      ed.schema.take(3).forall(f => f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    if (integralIds && n <= localMaxNodes && e.count() <= 8L * localMaxNodes)
      return pageRankConvergedLocal(e, nodes, n, maxIters, checkEvery)
    val base = Base / n
    // same structure probes as [[pageRank]]: on a total all-receiving
    // graph the general recurrence reduces bit-for-bit to the lean form
    val total = ow.count() == n
    val lean = total && e.select("dst").distinct().count() == n
    // ABOVE the driver gate, integral inputs run the RDD round loop —
    // the same once-partitioned edge relation and per-window check
    // schedule as [[pageRankRdd]] (spec-proven bit-equal to this
    // DataFrame loop, which stays the non-integral fallback and the
    // documented oracle shape)
    if (integralIds && !forceDataFrameLoop)
      return pageRankConvergedRdd(e, nodes, srcs, n, total, lean,
        maxIters, checkEvery)
    val step = if (lean) checkEvery else 1
    var pr = nodes.select(col("id"), lit(Total / n).as("pr"))
      .localCheckpoint(eager = true)
    var iters = 0
    var delta = -1L
    while (delta != 0L && iters < maxIters) {
      var cur = pr
      for (_ <- 1 to step) {
        val contrib = e.join(cur.withColumnRenamed("id", "src"), "src")
          .select(col("dst"), expr("(pr * 85 * w) div (100 * tw)").as("c"))
          .groupBy("dst")
          .agg(sum("c").as("s"))
        cur =
          if (lean)
            contrib.select(col("dst").as("id"), (lit(base) + col("s")).as("pr"))
          else {
            val dang = cur.join(srcs, cur("id") === srcs("src"), "left_anti")
              .agg(coalesce(sum("pr"), lit(0L)).as("dm"))
            nodes
              .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
              .crossJoin(broadcast(dang))
              .select(col("id"),
                (lit(base) + coalesce(col("s"), lit(0L)) +
                  expr(s"(dm * 85) div (100 * $n)")).as("pr"))
          }
      }
      val next = cur.localCheckpoint(eager = true)
      delta = next.join(pr.select(col("id"), col("pr").as("prev")), "id")
        .agg(coalesce(sum(abs(col("pr") - col("prev"))), lit(0L)))
        .head().getLong(0)
      iters += step
      pr = next
    }
    require(delta == 0L,
      s"pagerank did not reach its integer fixed point within $maxIters rounds")
    pr.select(col("id"), col("pr"), lit(iters.toLong).as("n_iters"))
  }

  /** [[pageRankConverged]]'s round loop as RDDs — the [[pageRankRdd]]
    * design (edges hash-partitioned by src once, narrow per-round rank
    * join, one |V|-row shuffle per round, zero per-round planning) with
    * the converged loop's check schedule on top: on a lean graph
    * `checkEvery` rounds chain lazily between L1-delta actions, so a
    * ~170-round drain costs ~11 driver barriers; a dangling graph checks
    * every round exactly like the DataFrame loop. Bit-equal to both the
    * DataFrame loop and the driver-gate solve (spec-proven). */
  private def pageRankConvergedRdd(e: DataFrame, nodes: DataFrame,
                                   srcs: DataFrame, n: Long, total: Boolean,
                                   lean: Boolean, maxIters: Int,
                                   checkEvery: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = e.sparkSession
    import spark.implicits._
    val idType = nodes.schema("id").dataType
    val base = Base / n
    val step = if (lean) checkEvery else 1
    val p = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 5000L + 1L)).toInt
    val part = new HashPartitioner(p)
    val edges: RDD[(Long, (Long, Long, Long))] = e
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"), col("tw").cast("long"))
      .as[(Long, Long, Long, Long)].rdd
      .map { case (s, d, w, tw) => (s, (d, w, tw)) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val nodesR: RDD[(Long, Unit)] = nodes
      .select(col("id").cast("long")).as[Long].rdd
      .map((_, ())).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val dangR: Option[RDD[(Long, Unit)]] =
      if (total) None
      else Some(nodes
        .join(srcs, nodes("id") === srcs("src"), "left_anti")
        .select(col("id").cast("long")).as[Long].rdd
        .map((_, ())).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK))
    def round(prv: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      val contrib = edges.join(prv, part)
        .map { case (_, ((d, w, tw), r)) =>
          (d, Math.multiplyExact(Math.multiplyExact(r, 85L), w) /
            Math.multiplyExact(100L, tw))
        }
        .reduceByKey(part, (a, b) => Math.addExact(a, b))
      if (lean) contrib.mapValues(s => Math.addExact(base, s))
      else {
        val dangTerm: Long =
          if (total) 0L
          else {
            val dm = prv.join(dangR.get, part).map(_._2._1)
              .fold(0L)(Math.addExact)
            Math.multiplyExact(dm, 85L) / Math.multiplyExact(100L, n)
          }
        nodesR.leftOuterJoin(contrib, part).mapValues { case (_, s) =>
          Math.addExact(Math.addExact(base, s.getOrElse(0L)), dangTerm)
        }
      }
    }
    var pr: RDD[(Long, Long)] = nodesR.mapValues(_ => Total / n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iters = 0
    var delta = -1L
    val retired = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]
    while (delta != 0L && iters < maxIters) {
      var cur = pr
      for (_ <- 1 to step) cur = round(cur)
      val next = cur.persist(StorageLevel.MEMORY_AND_DISK)
      // ONE action per window: the L1 delta between check points (it
      // also materializes the window's persisted ranks)
      delta = next.join(pr, part)
        .map { case (_, (a, b)) => Math.abs(a - b) }
        .fold(0L)(Math.addExact)
      iters += step
      retired += pr
      pr = next
      // the dangling path's per-round scalar action reads the PREVIOUS
      // window's ranks mid-chain, so retire caches one window late
      while (retired.length > 2) retired.remove(0).unpersist(blocking = false)
    }
    require(delta == 0L,
      s"pagerank did not reach its integer fixed point within $maxIters rounds")
    val out = spark.createDataFrame(pr).toDF("id", "pr")
      .select(col("id").cast(idType).as("id"), col("pr"),
        lit(iters.toLong).as("n_iters"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    nodesR.unpersist(blocking = false)
    dangR.foreach(_.unpersist(blocking = false))
    retired.foreach(_.unpersist(blocking = false))
    pr.unpersist(blocking = false)
    out
  }

  /** Driver-array execution of [[pageRankConverged]]'s recurrence for
    * graphs under the small-graph gate: the SAME Long arithmetic
    * (overflow-checked like ANSI mode, not silently wrapping), the same
    * lean/dangling branches, the same check schedule and stop rule — so
    * (pr, n_iters) is bit-for-bit what the distributed loop returns
    * (spec-proven by forcing `localMaxNodes = 0`). */
  private def pageRankConvergedLocal(e: DataFrame, nodes: DataFrame, n: Long,
                                     maxIters: Int, checkEvery: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val ids = nodes.select(col("id").cast("long")).as[Long].collect().sorted
    val idx = ids.zipWithIndex.toMap
    val es = e.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"), col("tw").cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val nn = ids.length
    val src = new Array[Int](es.length); val dst = new Array[Int](es.length)
    val w = new Array[Long](es.length); val tw = new Array[Long](es.length)
    val outdeg = new Array[Int](nn); val indeg = new Array[Int](nn)
    var i = 0
    while (i < es.length) {
      src(i) = idx(es(i)._1); dst(i) = idx(es(i)._2)
      w(i) = es(i)._3; tw(i) = es(i)._4
      outdeg(src(i)) += 1; indeg(dst(i)) += 1
      i += 1
    }
    // same structure probes as the distributed path: all nodes emit AND
    // all nodes receive → the dangling branch vanishes and delta checks
    // batch `checkEvery` rounds
    val lean = outdeg.forall(_ > 0) && indeg.forall(_ > 0)
    val step = if (lean) checkEvery else 1
    val base = Base / n
    var pr = Array.fill(nn)(Total / n)
    var iters = 0
    var delta = -1L
    while (delta != 0L && iters < maxIters) {
      val prev = pr
      var r = 0
      while (r < step) {
        val s = new Array[Long](nn)
        var j = 0
        while (j < src.length) {
          s(dst(j)) += Math.multiplyExact(Math.multiplyExact(pr(src(j)), 85L),
            w(j)) / Math.multiplyExact(100L, tw(j))
          j += 1
        }
        val next = new Array[Long](nn)
        if (lean) {
          var v = 0
          while (v < nn) { next(v) = base + s(v); v += 1 }
        } else {
          var dm = 0L
          var v = 0
          while (v < nn) { if (outdeg(v) == 0) dm += pr(v); v += 1 }
          val dshare = Math.multiplyExact(dm, 85L) / (100L * n)
          v = 0
          while (v < nn) { next(v) = base + s(v) + dshare; v += 1 }
        }
        pr = next
        r += 1
      }
      delta = 0L
      var v = 0
      while (v < nn) { delta += math.abs(pr(v) - prev(v)); v += 1 }
      iters += step
    }
    require(delta == 0L,
      s"pagerank did not reach its integer fixed point within $maxIters rounds")
    spark.createDataFrame(ids.indices.map(v => (ids(v), pr(v), iters.toLong)))
      .toDF("id", "pr", "n_iters")
  }

  /** Small-graph gate probe shared by the fixed-iteration iterative ops:
    * when the (already-materialized) edge relation has integral id/weight
    * types and at most `localMaxEdges` rows, collect it as longs for a
    * driver-array solve; otherwise None (distributed path). ONE job — a
    * `limit(cap + 1)` collect, never a separate count — decides; the cap
    * is clamped below Int.MaxValue so an oversized argument can never
    * wrap the limit into a 1-row probe (the bpeTrain lesson). */
  private def integralCol(df: DataFrame, c: String): Boolean = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  private def smallGraphEdges(ed: DataFrame, srcCol: String, dstCol: String,
                              wCol: Option[String], localMaxEdges: Long,
                              force: Boolean): Option[Array[(Long, Long, Long)]] = {
    if (force || localMaxEdges <= 0L) return None
    val integral = integralCol(ed, srcCol) && integralCol(ed, dstCol) &&
      wCol.forall(w => integralCol(ed, w))
    if (!integral) return None
    val cap = math.max(0L, math.min(localMaxEdges, (Int.MaxValue - 1).toLong)).toInt
    val probe = ed.select(col(srcCol).cast("long"), col(dstCol).cast("long"),
        wCol.fold(lit(1L))(w => col(w).cast("long")))
      .limit(cap + 1).collect()
    if (probe.length > cap) None
    else Some(probe.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  /** Index a collected edge list: sorted distinct node ids, id→index map,
    * and the edges re-expressed over indices. */
  private def indexEdges(es: Array[(Long, Long, Long)])
      : (Array[Long], Array[Int], Array[Int], Array[Long]) = {
    val ids = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val src = new Array[Int](es.length)
    val dst = new Array[Int](es.length)
    val w = new Array[Long](es.length)
    var j = 0
    while (j < es.length) {
      src(j) = idx(es(j)._1); dst(j) = idx(es(j)._2); w(j) = es(j)._3
      j += 1
    }
    (ids, src, dst, w)
  }

  /** Driver-array execution of [[pageRank]]'s FIXED-ITERATION recurrence
    * for graphs under the small-graph gate: the same Long arithmetic
    * (overflow-checked like ANSI), the same base/contribution/dangling
    * terms, so (id, pr) is bit-for-bit what the distributed loops return
    * (spec-proven by forcing `localMaxEdges = 0` / the DataFrame loop). */
  private def pageRankLocalFixed(spark: org.apache.spark.sql.SparkSession,
                                 es: Array[(Long, Long, Long)],
                                 idType: org.apache.spark.sql.types.DataType,
                                 iters: Int): DataFrame = {
    val (ids, src, dst, w) = indexEdges(es)
    val nn = ids.length
    val n = nn.toLong
    val tw = new Array[Long](nn)
    val outdeg = new Array[Int](nn)
    var j = 0
    while (j < es.length) {
      tw(src(j)) = Math.addExact(tw(src(j)), w(j))
      outdeg(src(j)) += 1
      j += 1
    }
    val total = outdeg.forall(_ > 0)
    val base = Base / n
    var pr = Array.fill(nn)(Total / n)
    var r = 0
    while (r < iters) {
      val s = new Array[Long](nn)
      j = 0
      while (j < src.length) {
        s(dst(j)) = Math.addExact(s(dst(j)),
          Math.multiplyExact(Math.multiplyExact(pr(src(j)), 85L), w(j)) /
            Math.multiplyExact(100L, tw(src(j))))
        j += 1
      }
      val dshare =
        if (total) 0L
        else {
          var dm = 0L
          var v = 0
          while (v < nn) {
            if (outdeg(v) == 0) dm = Math.addExact(dm, pr(v)); v += 1
          }
          Math.multiplyExact(dm, 85L) / Math.multiplyExact(100L, n)
        }
      val next = new Array[Long](nn)
      var v = 0
      while (v < nn) {
        next(v) = Math.addExact(Math.addExact(base, s(v)), dshare); v += 1
      }
      pr = next
      r += 1
    }
    spark.createDataFrame(ids.indices.map(v => (ids(v), pr(v))))
      .toDF("id", "pr")
      .select(col("id").cast(idType).as("id"), col("pr"))
  }

  /** Driver-array execution of [[personalizedPageRank]]'s recurrence under
    * the small-graph gate — same Long arithmetic, same seed-teleport and
    * total-graph contract, bit-equal to the distributed loops
    * (spec-proven by forcing `localMaxEdges = 0`). */
  private def personalizedPageRankLocal(
      spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long, Long)], seedIds: Array[Long],
      idType: org.apache.spark.sql.types.DataType, iters: Int): DataFrame = {
    val (ids, src, dst, w) = indexEdges(es)
    val nn = ids.length
    val tw = new Array[Long](nn)
    val outdeg = new Array[Int](nn)
    var j = 0
    while (j < es.length) {
      tw(src(j)) = Math.addExact(tw(src(j)), w(j))
      outdeg(src(j)) += 1
      j += 1
    }
    require(outdeg.forall(_ > 0),
      "personalizedPageRank requires a total graph (every node has " +
        "out-edges); pass the symmetric edge union")
    // seeds outside the graph hold no mass — intersect with the node set
    val idSet = ids.zipWithIndex.toMap
    val seedIdx = seedIds.flatMap(idSet.get).distinct
    val nS = seedIdx.length.toLong
    require(nS > 0, "personalizedPageRank: empty seed set")
    val isSeed = new Array[Boolean](nn)
    seedIdx.foreach(isSeed(_) = true)
    val seedBase = Base / nS
    var pr = Array.tabulate(nn)(v => if (isSeed(v)) Total / nS else 0L)
    var r = 0
    while (r < iters) {
      val s = new Array[Long](nn)
      j = 0
      while (j < src.length) {
        s(dst(j)) = Math.addExact(s(dst(j)),
          Math.multiplyExact(Math.multiplyExact(pr(src(j)), 85L), w(j)) /
            Math.multiplyExact(100L, tw(src(j))))
        j += 1
      }
      val next = new Array[Long](nn)
      var v = 0
      while (v < nn) {
        next(v) = Math.addExact(if (isSeed(v)) seedBase else 0L, s(v)); v += 1
      }
      pr = next
      r += 1
    }
    spark.createDataFrame(ids.indices.map(v => (ids(v), pr(v))))
      .toDF("id", "pr")
      .select(col("id").cast(idType).as("id"), col("pr"))
  }

  /** Per-node triangle counts over an UNDIRECTED simple graph given as
    * deduplicated pairs with `a < b`. Returns (id, n_tri).
    *
    * Scale: the naive wedge join (edge ⋈ edge on the shared endpoint)
    * explodes quadratically on hub nodes — a power-law graph's hottest
    * key generates deg² wedge rows. The standard fix (Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW'11) is
    * degree orientation: direct every edge from its (degree, id)-smaller
    * endpoint to the larger, making every out-degree O(√m), so wedge
    * generation is Σ outdeg² ≤ m·√m instead of Σ deg². Each triangle then
    * has exactly ONE wedge at its (degree, id)-minimal corner plus one
    * closing oriented edge — counted once, no post-dedup. The degree
    * table is |V| rows (broadcast); the wedge→edge match is an equi-join
    * on the (v1, v2) pair key, shuffled once.
    */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    retireLastGeneration()
    // materialize the (possibly expensive) edge derivation ONCE: und feeds
    // both the degree table and the orientation, and oriented feeds three
    // joins — without materialization the upstream pair-generation lineage
    // replays five times (verified via .explain)
    val und = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .transform(mat)
    val deg = und.groupBy("u").agg(count(lit(1)).as("d"))
      .select(col("u").as("n"), col("d"))
    // orient u -> v iff (d(u), u) < (d(v), v): a strict total order, so
    // each undirected edge survives exactly once. No forced broadcast on
    // the |V|-row degree table: AQE broadcasts it when it fits and
    // degrades gracefully to a shuffle join when |V| outgrows the
    // threshold — a forced hint would OOM the driver on a big graph.
    val oriented = und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .filter(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"), col("dv"))
      .transform(mat)
    // wedges at the minimal corner: unordered out-neighbor pairs, emitted
    // in the same (degree, id) order the closing edge is oriented in
    val e1 = oriented.select(col("u").as("w_u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u").as("w_u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, "w_u")
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("w_u"), col("x"), col("y"))
    val tri = wedges.join(
        oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("w_u").as("a"), col("x").as("b"), col("y").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** LOCAL clustering coefficient (Watts & Strogatz 1998): per node,
    * cc(v) = 2·t(v) / (deg(v)·(deg(v)−1)) — how close v's neighbourhood
    * is to a clique, the node-level density signal the global triangle
    * census can't give (a spam-ring member scores ~1, a broadcast hub
    * ~0 at the same degree). Triangle counts ride [[triangleCounts]]'
    * degree-oriented enumeration (wedge work ≤ m·√m, never Σ deg²);
    * degrees are one node-sized aggregate; the ratio is the usual
    * 1e-12 integer fixed point with a DECIMAL(38,0) intermediate
    * (2·t·Total overflows a long at web-graph triangle counts). Nodes
    * with deg < 2 have no defined coefficient and are excluded.
    * Input: deduplicated a < b pairs. Returns (id, deg, n_tri, cc_fp). */
  def localClustering(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val tri = triangleCounts(pairs, aCol, bCol)
    val deg = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
    deg.join(tri, Seq("id"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("cc_fp", expr(
        s"(cast(n_tri as decimal(38,0)) * 2 * ${Total}L) " +
          "div (deg * (deg - 1))").cast("long"))
      .select("id", "deg", "n_tri", "cc_fp")
  }

  /** Bounded k-core peeling: `rounds` synchronous rounds of "drop every
    * node with degree < k, then drop dangling edges", reporting
    * (round, n_nodes, n_edges) after each. Fixed round count (like
    * [[pageRank]]'s fixed iterations) keeps the result deterministic and
    * CTE-unrollable by an oracle; at convergence the survivor set is the
    * k-core — the dense-cluster skeleton a spam/ring-detection stage keys
    * on. Each round is one degree aggregation plus two semi-joins, all on
    * the node key, so rounds re-use one co-partitioning; the edge relation
    * is cached per round because three consumers (stats, degree, next
    * round) would otherwise replay the whole peel lineage.
    */
  def kCorePeel(pairs: DataFrame, aCol: String, bCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 20)
    retireLastGeneration()
    // per-round state uses eager localCheckpoint, NOT persist: each round
    // references e THREE times (degree filter + both semi-join sides), so
    // a persist — which caches execution but keeps the LOGICAL lineage —
    // grows the plan tree 3x per round, and Spark's per-action plan
    // stringification (SQL listener) goes exponential with the round
    // count (observed: an 11-round peel hung in generateTreeString).
    // Checkpointing truncates the lineage each round.
    var e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(eager = true)
    val stats = (1 to rounds).map { r =>
      val keep = e.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u"))
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(eager = true)
      e.agg(countDistinct("u").as("n_nodes"),
          (count(lit(1)) / 2).cast("long").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    }
    stats.reduce(_ union _)
  }

  /** k-TRUSS peel (Cohen, NSA TR 2008 — the triangle-support analogue
    * of the degree k-core): each round computes every surviving edge's
    * SUPPORT (triangles it closes within the current edge set) and
    * drops edges with support < k−2; the fixed point is the k-truss,
    * the standard community-core denser than the k-core. Fixed-round
    * contract like [[kCorePeel]]: `rounds` peels, per-round
    * (round, n_nodes, n_edges) — partial progress is well-defined, so
    * the oracle unrolls the identical rounds whether or not the graph
    * has converged.
    *
    * Scale shape: support rides the SAME degree orientation as
    * [[triangleCounts]] (Suri & Vassilvitskii WWW'11) — every edge is
    * directed from its (degree, id)-smaller endpoint, so wedge
    * generation is Σ outdeg² ≤ m·√m instead of the Σ deg² a raw
    * symmetric self-join pays (a power-law hub of degree h would emit h²
    * wedge rows per round under the naive join; oriented, its out-degree
    * is O(√m) regardless of h — no extra hub cap needed, the bound is
    * structural). The ranks come from the INITIAL degrees, computed ONCE
    * and carried through the peels as edge annotations: any fixed total
    * order enumerates each triangle exactly once at its rank-minimal
    * corner, peeling only removes edges so per-round out-degrees never
    * exceed their initial O(√m₀) bound, and per round the orientation is
    * then a pure PROJECTION of the checkpointed edge set — no degree
    * re-aggregation, no rank re-join, no second lineage fence. Each
    * surviving triangle contributes one support count to each of its
    * three edges via a canonical (least, greatest) key explode; support
    * totals are orientation-invariant, so the result is identical to the
    * unoriented join's. Input contract: deduplicated `a < b` pairs
    * (route dirty lists through [[normalize]]) — the canonical support
    * keys join back on exactly that form. Per-round eager
    * localCheckpoint truncates lineage (the peel-loop lesson).
    *
    * Small-graph driver gate (the [[localUnionFindLabels]] / textRank
    * precedent): the output is per-round COUNTS, and a ≤`localMaxEdges`
    * integral edge list peels in milliseconds of driver set-intersection
    * against ~20 distributed jobs of round scaffolding (measured: the
    * 3.6k-edge sf0.1 co-purchase graph spent 3-4 s on scheduling alone).
    * Spec-proven bit-equal to the distributed loop; `localMaxEdges = 0`
    * forces the distributed path (the scale path, and the one the hub
    * fixture pins the wedge bound on). */
  def kTruss(pairs: DataFrame, aCol: String, bCol: String,
             k: Int, rounds: Int, localMaxEdges: Long = 16384L): DataFrame = {
    require(k >= 3 && rounds >= 1 && rounds <= 16)
    retireLastGeneration()
    val e0 = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    // clamp BEFORE toInt (the bpeTrain Int-wrap lesson)
    val cap = math.max(0L, math.min(localMaxEdges, (Int.MaxValue - 1).toLong))
    val integral = {
      import org.apache.spark.sql.types._
      e0.schema.forall(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    if (cap > 0 && integral && e0.limit(cap.toInt + 1).count() <= cap)
      return localTrussStats(e0, k, rounds)
    val deg = e0.select(col("a").as("u")).union(e0.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    var e = e0
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .select("a", "b", "da", "db")
      .localCheckpoint(eager = true)
    val stats = (1 to rounds).map { r =>
      // (initial degree, id)-orientation as a projection of the fenced
      // edge set: u = rank-smaller endpoint, dv = the head's rank degree
      val fwd = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = e.select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv"))
      val e1 = oriented.select(col("u").as("w_u"), col("v").as("x"), col("dv").as("dx"))
      val e2 = oriented.select(col("u").as("w_u"), col("v").as("y"), col("dv").as("dy"))
      val wedges = e1.join(e2, "w_u")
        .filter(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")))
        .select(col("w_u"), col("x"), col("y"))
      val tri = wedges.join(
        oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      val sup = tri.select(explode(array(
          struct(least(col("w_u"), col("x")).as("sa"),
            greatest(col("w_u"), col("x")).as("sb")),
          struct(least(col("w_u"), col("y")).as("sa"),
            greatest(col("w_u"), col("y")).as("sb")),
          struct(least(col("x"), col("y")).as("sa"),
            greatest(col("x"), col("y")).as("sb")))).as("ek"))
        .select(col("ek.sa").as("a"), col("ek.sb").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
      // inner join: an edge closing zero triangles has no support row and
      // must drop — k >= 3 makes the threshold >= 1, so that IS the filter.
      // The static rank annotations ride along into the next round.
      e = e.join(sup, Seq("a", "b"))
        .filter(col("sup") >= k - 2)
        .select("a", "b", "da", "db")
        .localCheckpoint(eager = true)
      e.select(explode(array(col("a"), col("b"))).as("u"))
        .agg(countDistinct("u").as("n_nodes"),
          (count(lit(1)) / 2).cast("long").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    }
    stats.reduce(_ union _)
  }

  /** Driver truss peel over a gate-checked-small integral edge list —
    * the same per-round recurrence as the distributed loop (support =
    * shared-neighbour count within the surviving edge set, drop
    * support < k−2), counts only. Adjacency sets rebuild per round from
    * the surviving edges, exactly like the distributed rounds re-derive
    * their wedges. */
  private def localTrussStats(e0: DataFrame, k: Int,
                              rounds: Int): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    var edges = e0.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].collect().toSeq
    val stats = (1 to rounds).map { r =>
      val adj = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.HashSet[Long]]
      edges.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a
      }
      edges = edges.filter { case (a, b) =>
        val (s, t) =
          if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
        s.count(t.contains) >= k - 2
      }
      val nodes = edges.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
      (r, nodes.size.toLong, edges.size.toLong)
    }
    spark.createDataFrame(stats).toDF("round", "n_nodes", "n_edges")
  }

  /** Connected components by MIN-LABEL PROPAGATION to the fixed point:
    * every node starts labeled with its own id; each round a node takes
    * the minimum label among itself and its neighbors; at the fixed point
    * each component carries its minimum member id as the component label.
    * Returns the component-size histogram (csize, n_components) — the
    * stable, layout-invariant summary (labels themselves are ids, so the
    * full labeling is deterministic too).
    *
    * Convergence detection: labels only ever DECREASE, so the label sum
    * is strictly decreasing until the fixed point — one scalar per round
    * (the only driver state, like [[kCoreConverged]]). Rounds are
    * O(component diameter); each is one edge⋈label join + one min
    * re-aggregate on the node key, with per-round eager localCheckpoint
    * truncating the lineage (the plan-tree lesson of the peel loops).
    * Dedup.nearDupClusters uses the same propagation distributed shape
    * for its cluster labels; this is the general graph-op form over an
    * explicit edge table.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 60): DataFrame = {
    require(maxRounds >= 1)
    retireLastGeneration()
    val e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(eager = true)
    var lbl = e.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("l"))
      .localCheckpoint(eager = true)
    // decimal(38,0) sum: a billion-node graph with 64-bit ids would
    // overflow a BIGINT label sum
    def sig(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("l").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSig = sig(lbl)
    var r = 0
    var converged = false
    while (!converged && r < maxRounds) {
      val next = lbl
        .unionByName(e.join(lbl.withColumnRenamed("id", "u"), "u")
          .select(col("v").as("id"), col("l")))
        .groupBy("id").agg(min("l").as("l"))
        .localCheckpoint(eager = true)
      val s = sig(next)
      r += 1
      converged = s.compareTo(prevSig) == 0
      prevSig = s
      lbl = next
    }
    require(converged, s"components did not converge within $maxRounds rounds")
    lbl.groupBy("l").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_components"))
  }

  /** Connected components in LOGARITHMIC rounds by alternating
    * large-star / small-star contraction (Kiveris, Lattanzi, Mirrokni,
    * Rastogi, Vassilvitskii — "Connected Components in MapReduce and
    * Beyond", SoCC'14): [[connectedComponents]]' min-label propagation
    * needs O(component diameter) synchronous rounds — thousands on a
    * path-like or crawl-chain graph at 100 TB, each with a checkpoint
    * barrier — while star contraction halves tree heights every
    * alternation, converging in O(log n) rounds on ANY shape (the spec
    * drives a 10k-node chain and bounds the phase counter by
    * ~2·log₂ n). Same building blocks (join + min-aggregate), same
    * result: at the fixed point the edge set is a STAR FOREST — every
    * node linked directly to its component's minimum id — so the
    * labeling, and hence the (csize, n_components) histogram, is
    * bit-identical to min-label propagation (which stays as the
    * oracle-replayable shape).
    *
    * Phases over the canonical `u < v` edge set E:
    *  - large-star: per node u, every neighbor v > u re-attaches to
    *    m(u) = min(Γ(u) ∪ {u}) — one neighborhood min + one join.
    *  - small-star: per node v, its smaller neighbors (and v itself)
    *    re-attach to m⁻(v) = min of the smaller neighborhood — on the
    *    canonical orientation that is one groupBy("v").min("u") + join.
    * Both emit canonical pairs (the attach target is always the strict
    * minimum of its group); convergence = the edge SET is unchanged by a
    * full alternation, tested with a count + anti-join (two scalar jobs
    * per phase, the only driver state). Per-phase eager localCheckpoint
    * truncates lineage exactly as in the other fixed-point loops.
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
                              maxPhases: Int = 60): DataFrame =
    connectedComponentsStarWithPhases(pairs, aCol, bCol, maxPhases)._1

  /** [[connectedComponentsStar]] plus the executed phase count (exposed
    * for the round-bound spec; a phase = one large-star or one
    * small-star application). */
  def connectedComponentsStarWithPhases(pairs: DataFrame, aCol: String,
                                        bCol: String, maxPhases: Int = 60)
      : (DataFrame, Int) = {
    val (lbl, phases) = starComponentLabels(pairs, aCol, bCol, maxPhases)
    val hist = lbl.groupBy("l").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_components"))
    (hist, phases)
  }

  /** The node → component-min-id LABELING behind
    * [[connectedComponentsStar]] (columns (id, l)), plus the phase count
    * — the component MV that [[incrementalComponents]] maintains under
    * edge arrivals.
    *
    * `localMaxEdges > 0` arms the small-graph gate: when the CANONICAL
    * edge count (known from the count the loop needs anyway) and node
    * count fit the bound and ids are integral, a driver union-find
    * produces the identical min-id labeling (union always attaches the
    * larger root under the smaller, so every root IS its component's
    * minimum — spec-proven equal to the distributed labels) with zero
    * phases of scheduler cost. Default OFF (0): `q_components` runs the
    * log-round star path unconditionally; the gate exists for callers
    * like [[incrementalComponents]] whose label graph is Δ-sized by
    * construction. */
  def starComponentLabels(pairs: DataFrame, aCol: String, bCol: String,
                          maxPhases: Int = 60,
                          localMaxEdges: Long = 0): (DataFrame, Int) = {
    require(maxPhases >= 2)
    retireLastGeneration()
    val raw = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    // node universe: EVERY endpoint, so self-loop-only nodes still report
    // as singleton components (same universe as min-label propagation)
    // LAZY local checkpoints: materialization rides the first job that
    // reads them (the count below for e; the gate count or the final
    // label join for nodes), instead of paying a dedicated
    // checkpoint-materialization job each — on a toy graph the loop cost
    // is driver jobs, not data.
    val nodes = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id"))).distinct()
      .localCheckpoint(eager = false)
    var e = raw.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var n = e.count()
    if (localMaxEdges > 0 && n <= localMaxEdges &&
        nodes.count() <= 2 * localMaxEdges + 2 && {
          import org.apache.spark.sql.types._
          raw.schema.forall(_.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          })
        })
      return (localUnionFindLabels(e, nodes), 0)
    val integral = {
      import org.apache.spark.sql.types._
      raw.schema.forall(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    if (integral) {
      // Integral ids take the RDD inner loop (below): same phases, same
      // edge sets, same convergence test — but zero per-phase Catalyst
      // work. Non-integral ids (string keys etc.) keep the DataFrame
      // loop that follows.
      val (star, phases) = starLoopRdd(e, n, maxPhases)
      val lbl = nodes
        .join(star.select(col("v").as("id"), col("u").as("l")), Seq("id"), "left")
        .select(col("id"), coalesce(col("l"), col("id")).as("l"))
      return (lbl, phases)
    }
    var phases = 0
    // ONE no-op phase does not certify the fixed point: {(1,3),(2,3)} is
    // large-star-invariant but not a star forest (3 has two parents), and
    // a path {(1,2),(2,3)} is small-star-invariant — only a set unchanged
    // by BOTH operators in a row is a star forest (SoCC'14 §3). So the
    // stop condition is two consecutive no-op phases.
    var noopStreak = if (n == 0L) 2 else 0
    while (noopStreak < 2 && phases < maxPhases) {
      val next =
        if (phases % 2 == 0) { // large-star
          val nbr = e.unionByName(
            e.select(col("v").as("u"), col("u").as("v")))
          val m = nbr.groupBy("u")
            .agg(least(min(col("v")), first(col("u"))).as("m"))
          nbr.join(m, "u").filter(col("v") > col("u"))
            .select(col("m").as("u"), col("v")) // m ≤ u < v: canonical
            .distinct()
        } else { // small-star on the canonical orientation
          val m = e.groupBy("v").agg(min(col("u")).as("m"))
          val withM = e.join(m, "v")
          withM.filter(col("u") =!= col("m"))
            .select(col("m").as("u"), col("u").as("v")) // m < u: canonical
            .unionByName(m.select(col("m").as("u"), col("v"))) // m < v
            .distinct()
        }
      // ONE driver action per phase (was three: an eager-checkpoint
      // materialization job, a count, and an anti-join isEmpty): the
      // lazy local checkpoint is persisted as a side effect of the stats
      // job, which computes the new cardinality and the subset test in a
      // single pass. Both edge sets are distinct, so
      // chk ⊆ e ∧ |chk| = |e| ⟺ chk = e — exactly the old
      // count + anti-join fixed-point test, with no probabilistic
      // shortcut (counts alone would NOT certify set equality).
      val chk = next.localCheckpoint(eager = false)
      val st = chk
        .join(e.select(col("u"), col("v"), lit(1).as("_old")),
          Seq("u", "v"), "left")
        .agg(count(lit(1)).as("n"), count(col("_old")).as("n_old"))
        .head()
      val nNext = st.getLong(0)
      phases += 1
      val same = nNext == n && st.getLong(1) == nNext
      noopStreak = if (same) noopStreak + 1 else 0
      n = nNext
      e = chk
    }
    require(noopStreak >= 2,
      s"star contraction did not converge within $maxPhases phases")
    // star forest → labels: each non-root appears exactly once as v with
    // its root as u; roots and singletons label themselves
    val lbl = nodes
      .join(e.select(col("v").as("id"), col("u").as("l")), Seq("id"), "left")
      .select(col("id"), coalesce(col("l"), col("id")).as("l"))
    (lbl, phases)
  }

  /** The star-contraction inner loop as a raw RDD fixed point, for
    * integral node ids. The DataFrame loop is semantically right but
    * pays ~0.3 s of driver-side Catalyst analysis/optimization/codegen
    * PER PHASE (measured at sf0.1) — an O(phases) driver serial cost
    * that AQE cannot amortize because every phase is a new plan. The
    * RDD formulation removes the planner from the loop entirely and
    * adds a structural win the SQL planner cannot express across
    * iterations: one explicit `HashPartitioner` shared by every phase
    * makes `reduceByKey` → `join` co-partitioned (narrow, no second
    * shuffle), and the dedup + convergence test ride ONE cogroup whose
    * old-edge side is already partitioned — two shuffles and one driver
    * action per phase, at any scale. This is the documented RDD
    * exception (iterative fixed point with partitioner reuse), not a
    * bypass: phase semantics, edge sets, and the two-consecutive-no-op
    * stop are identical to the DataFrame loop, and the chain spec's
    * phase bound covers both paths.
    *
    * Input `e`: the canonical (u < v, distinct, self-loop-free) edge
    * set with `n0` rows. Returns the star-forest edges (cast back to
    * the original id type) eagerly materialized, plus the phase count.
    */
  private def starLoopRdd(e: DataFrame, n0: Long, maxPhases: Int)
      : (DataFrame, Int) = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = e.sparkSession
    import spark.implicits._
    val idType = e.schema("u").dataType
    // ≥ ~5k edges per task to amortize task launch on small graphs; cap
    // at cluster parallelism (which scales with executors at 100 TB)
    val p = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n0 / 5000L + 1L)).toInt
    val part = new HashPartitioner(p)
    // state: the canonical edge set, keyed BY THE PAIR and hash-partitioned
    // by `part` so each phase's cogroup is narrow on the old-edge side
    var cur: RDD[((Long, Long), Byte)] =
      e.select(col("u").cast("long"), col("v").cast("long"))
        .as[(Long, Long)].rdd.map(x => (x, 1: Byte)).partitionBy(part)
    var curStore: RDD[_] = null // the persisted RDD backing `cur`
    var n = n0
    var phases = 0
    var noopStreak = if (n == 0L) 2 else 0
    while (noopStreak < 2 && phases < maxPhases) {
      val keyed: RDD[(Long, Long)] =
        if (phases % 2 == 0) // large-star: every node sees all neighbors
          cur.flatMap { case ((u, v), _) => Iterator((u, v), (v, u)) }
        else // small-star: larger endpoint sees its smaller neighbors
          cur.map { case ((u, v), _) => (v, u) }
      val kp = keyed.partitionBy(part) // the ONE data shuffle of the phase
      val m = kp.reduceByKey(part, // co-partitioned: narrow
        (a: Long, b: Long) => math.min(a, b))
      val next: RDD[(Long, Long)] =
        if (phases % 2 == 0) {
          val mm = m.mapPartitions( // m(u) = min(Γ(u) ∪ {u})
            _.map { case (u, mn) => (u, math.min(mn, u)) },
            preservesPartitioning = true)
          kp.join(mm, part).flatMap { case (u, (v, mu)) =>
            if (v > u) Iterator((mu, v)) else Iterator.empty // m ≤ u < v
          }
        } else {
          kp.join(m, part).flatMap { case (v, (u, mv)) =>
            if (u != mv) Iterator((mv, u)) else Iterator.empty // m < u
          } ++ m.map { case (v, mv) => (mv, v) } // m < v
        }
      // dedup + convergence stats in one cogroup (next side shuffles,
      // cur side is narrow) and ONE driver action; value = was the pair
      // already in the old set. chk ⊆ old ∧ |chk| = |old| ⟺ chk = old —
      // the same exact set-equality test as the DataFrame loop.
      val chk = next.map(x => (x, 1: Byte)).cogroup(cur, part)
        .mapPartitions(_.flatMap { case (k, (a, b)) =>
          if (a.nonEmpty) Iterator((k, if (b.nonEmpty) (1: Byte) else (0: Byte)))
          else Iterator.empty
        }, preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (nNext, nOld) = chk
        .mapPartitions(it => {
          var c = 0L; var o = 0L
          it.foreach { case (_, old) => c += 1; o += old }
          Iterator((c, o))
        })
        .fold((0L, 0L)) { case ((a1, b1), (a2, b2)) => (a1 + a2, b1 + b2) }
      phases += 1
      val same = nNext == n && nOld == nNext
      noopStreak = if (same) noopStreak + 1 else 0
      n = nNext
      cur = chk.mapPartitions(
        _.map { case (k, _) => (k, 1: Byte) }, preservesPartitioning = true)
      if (curStore != null) curStore.unpersist(blocking = false)
      curStore = chk
    }
    require(noopStreak >= 2,
      s"star contraction did not converge within $maxPhases phases")
    // materialize the star forest as a DataFrame BEFORE dropping the RDD
    // cache (node-sized, exactly what the old loop checkpointed per phase)
    val star = spark.createDataFrame(cur.map(_._1)).toDF("u", "v")
      .select(col("u").cast(idType).as("u"), col("v").cast(idType).as("v"))
      .localCheckpoint(eager = true)
    if (curStore != null) curStore.unpersist(blocking = false)
    (star, phases)
  }

  /** Driver union-find over a gate-checked-small canonical edge set —
    * min-id labels by construction: roots start as themselves and every
    * union attaches the LARGER root under the smaller, so a component's
    * root is always its minimum id. */
  private def localUnionFindLabels(e: DataFrame, nodes: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val ids = nodes.select(col("id").cast("long")).as[Long].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    ids.foreach(p => parent(p) = p)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    e.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    spark.createDataFrame(ids.toSeq.map(p => (p, find(p)))).toDF("id", "l")
  }

  /** INCREMENTAL component maintenance — the [[Incremental]] MV-delta
    * pattern applied to graph state: given the CURRENT labeling
    * (id → component min-id, e.g. a prior [[starComponentLabels]] run)
    * and a batch of NEW edges, produce the updated labeling WITHOUT
    * re-traversing the old edge set. Append-only edges can only MERGE
    * components, so the whole delta reduces to connected components of
    * the LABEL graph: each new edge contributes the pair
    * (label(a), label(b)) — endpoints never seen before label
    * themselves — and star contraction over that ≤|Δ|-edge label-level
    * graph yields the label → merged-min-label map, applied back to the
    * labeling with one join. Labels stay canonical (component min id),
    * so batches COMPOSE: applying deltas one at a time equals the full
    * recompute bit-for-bit (spec-proven). Cost O(|labels| + |Δ|·log):
    * the old edges are never touched — at 100 TB the MV (one row per
    * node) and the day's arrivals are the only inputs.
    */
  def incrementalComponents(labels: DataFrame, idCol: String, lblCol: String,
                            newEdges: DataFrame, aCol: String, bCol: String,
                            localMaxEdges: Long = 65536): DataFrame = {
    val lab = labels.select(col(idCol).as("id"), col(lblCol).as("l"))
    // Δ-sized; fenced FIRST so neither the normalize nor the new-node
    // probe below replays the caller's delta lineage (clusterAppend feeds
    // this a verified-pair pipeline — without this fence the screen ran
    // twice, once for the edge fold and once for the node universe)
    val rawNe = newEdges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(eager = true)
    val ne = normalize(rawNe, "a", "b")
      .localCheckpoint(eager = true) // read 3x below; Δ-sized
    val la = lab.select(col("id").as("a"), col("l").as("la"))
    val lb = lab.select(col("id").as("b"), col("l").as("lb"))
    val lifted = ne.join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("x"),
        coalesce(col("lb"), col("b")).as("y"))
    // unseen endpoints join the MV as their own singleton components —
    // taken from the RAW delta (nulls dropped) so a self-loop-only new
    // node still reports, matching [[starComponentLabels]]' universe
    val newNodes = rawNe.select(col("a").as("id"))
      .union(rawNe.select(col("b").as("id")))
      .filter(col("id").isNotNull).distinct()
      .join(lab, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("l"))
    val all = lab.unionByName(newNodes)
    val merges = lifted.filter(col("x") =!= col("y"))
    if (merges.isEmpty) return all
    // label-graph components: Δ-sized by construction, so the driver
    // union-find usually takes it; above the gate the log-round star
    // contraction runs distributed
    val m = starComponentLabels(merges, "x", "y", localMaxEdges = localMaxEdges)._1
      .select(col("id").as("l"), col("l").as("l2"))
    all.join(m, Seq("l"), "left")
      .select(col("id"), coalesce(col("l2"), col("l")).as("l"))
  }

  /** k-core peeling TO CONVERGENCE: rounds of "drop nodes with degree < k,
    * then dangling edges" until the survivor edge set is stable — the
    * exact k-core, making the operator's name precise (the bounded
    * [[kCorePeel]] stays for round-by-round stats and CTE oracles).
    * Returns ONE row (n_rounds, n_nodes, n_edges) where n_rounds is the
    * first no-op round (the round whose peel removed nothing).
    *
    * The edge set shrinks monotonically, so an unchanged EDGE COUNT means
    * an unchanged edge set — the convergence test is a per-round scalar
    * count (the only driver-side state; convergence detection inherently
    * needs a driver decision). Each round is the same one degree
    * aggregation + two node-key semi-joins as the bounded form;
    * `maxRounds` guards the loop (termination is guaranteed anyway: every
    * non-final round removes at least one edge).
    */
  def kCoreConverged(pairs: DataFrame, aCol: String, bCol: String,
                     k: Int, maxRounds: Int = 40): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    retireLastGeneration()
    // eager localCheckpoint per round for the same lineage-truncation
    // reason as [[kCorePeel]] — at the fixed point this loop may run many
    // rounds, and a persist-only chain's plan tree grows 3^rounds
    var e = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(eager = true)
    var prev = e.count()
    var r = 0
    // no empty-graph shortcut: round 1 is then a no-op round and r = 1,
    // matching the oracle's "first r with count(r) == count(r-1)" rule
    var converged = false
    while (!converged && r < maxRounds) {
      val keep = e.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u"))
      val next = e.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(eager = true)
      val cnt = next.count()
      r += 1
      converged = cnt == prev
      prev = cnt
      e = next
    }
    require(converged, s"k-core did not converge within $maxRounds rounds")
    e.agg(countDistinct("u").as("n_nodes"),
        (count(lit(1)) / 2).cast("long").as("n_edges"))
      .select(lit(r.toLong).as("n_rounds"), col("n_nodes"), col("n_edges"))
  }

  /** HITS (Kleinberg, JACM 1999) hubs & authorities over a directed edge
    * list, in exact integer fixed point. Per round: each authority earns
    * the sum of its in-neighbours' hub mass, authorities are L1-normalized
    * back to Total (1e12) by `(a·Total) div ΣA` (the product needs 128-bit
    * intermediates — DECIMAL(38,0) here, HUGEINT in the DuckDB oracle),
    * then hubs symmetrically from the normalized authorities. Floor
    * division with positive operands throughout, so the scores are
    * bit-identical across layouts and engines. Returns one row per node
    * with both scores (0 for the side a node never plays — e.g. on a
    * bipartite customer→part graph customers are pure hubs).
    *
    * Scale: the edge relation is materialized once and each round is TWO
    * (join + re-aggregate) passes on the src/dst keys plus two 1-row
    * broadcast normalization scalars — same per-round shuffle shape as
    * [[pageRank]]. Score relations are |V| rows; the raw aggregate is
    * persisted before its normalization sum (double reference: values +
    * Σ) and each NORMALIZED relation is localCheckpoint'ed — each l1norm
    * references its input twice, so without the per-round lineage fence
    * the plan TREE (not the work) would quadruple per round and plan
    * stringification alone goes super-linear by round 3 (observed: a
    * bench run pinned at 100% CPU inside generateTreeString). Null
    * endpoints / self-loops / duplicate links should be fronted by
    * [[normalizeDirected]] as usual. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 3, forceDataFrameLoop: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20)
    retireLastGeneration()
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // Integral ids take the co-partitioned RDD round loop (below): same
    // integer recurrence (BigInt replays the DECIMAL(38,0) normalize
    // exactly), but edges hash-partition by each endpoint ONCE and every
    // round is two narrow joins + two key re-aggregates — no per-round
    // Catalyst planning, no per-round lineage fences (RDD actions never
    // stringify a SQL plan). Non-integral ids keep the DataFrame loop
    // (also forced by specs for the parity proof). The branch decides on
    // schema alone so the RDD path never pays the DataFrame-side setup
    // (round-13 trim: the mat(e) columnar persist, the distinct-hubs
    // shuffle + persist and their two count jobs existed only to feed
    // THIS loop's initialization — hitsRdd derives both from its own
    // decoded edge RDD).
    val integral = {
      import org.apache.spark.sql.types._
      def ok(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      ok(e0.schema("src").dataType) && ok(e0.schema("dst").dataType)
    }
    if (integral && !forceDataFrameLoop) return hitsRdd(e0, iters)
    val e = e0.transform(mat)
    val hubs = e.select(col("src").as("id")).distinct().transform(mat)
    val nh = hubs.count()
    require(nh > 0, "hits: empty edge relation — no hub nodes to score")
    // 128-bit normalize: x in [0, S], S ≤ Total·maxdeg, x·Total ≤ ~1e28.
    // s1 > 0 is structural: scores enter ≥ Total/nh > 0 on every hub and
    // L1 mass only moves along edges, so the sum stays positive (the RDD
    // twin asserts the same invariant at runtime).
    def l1norm(scores: DataFrame, c: String): DataFrame = {
      val s = scores.agg(sum(col(c)).cast("decimal(38,0)").as("s1"))
      scores.crossJoin(broadcast(s))
        .select(col("id"),
          expr(s"(cast($c as decimal(38,0)) * ${Total}L) div s1").as(c))
    }
    var h = hubs.select(col("id"), lit(Total / nh).as("h"))
    var a: DataFrame = null
    (1 to iters).foreach { _ =>
      a = l1norm(
        e.join(h.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum("h").as("a"))
          .transform(mat), "a")
      // ONE lineage fence per round, on h: a's un-fenced plan (a persisted
      // aggregate over the checkpointed previous h, referenced twice by
      // its own normalization) bounds the round's tree at depth ~4×e-plan
      // — constant per round, so only h needs the truncation that keeps
      // the loop's plan from compounding (see the Scaladoc above)
      h = l1norm(
        e.join(a.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(sum("a").as("h"))
          .transform(mat), "h")
        .localCheckpoint(eager = true)
    }
    h.join(a, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("h"), lit(0L)).as("hub_fp"),
        coalesce(col("a"), lit(0L)).as("auth_fp"))
  }

  /** The HITS round loop as RDDs over integral ids — spec-proven
    * bit-equal to the DataFrame loop. Same recurrence: raw score = key
    * re-aggregate of the opposite score over edges; normalize = (x ·
    * Total) div Σx with the 128-bit intermediate replayed in BigInt
    * (operands nonnegative, so BigInt `/` is the same floor as DECIMAL's
    * `div`). What it buys over the DataFrame loop (the q_components /
    * q_pagerank finding): the edge relation hash-partitions by EACH
    * endpoint once (one src-keyed copy, one dst-keyed copy, both
    * persisted); every round's score join is then co-partitioned →
    * narrow, the only shuffles are the two per-round re-aggregates, and
    * there is no per-round Catalyst planning or plan-stringification tax
    * (the DataFrame loop needs a lineage fence per round just to keep
    * generateTreeString from going super-linear). Per-round driver
    * actions: the two Σx normalization scalars — exactly the two 1-row
    * aggregates the DataFrame loop broadcasts. */
  private def hitsRdd(e: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = e.sparkSession
    import spark.implicits._
    // the full_outer of hub and authority ids in the DataFrame loop
    // coerces the two endpoint types; mirror it via the union schema
    val outType = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).schema("id").dataType
    // ONE decode pass feeds everything: the edge DataFrame is decoded to
    // a pair RDD once and persisted; the edge count (for the
    // partitioner), the hub count and both partitioned copies all derive
    // from it. Round-13 trim — previously the caller ALSO columnar-
    // persisted the edge DataFrame and shuffled+persisted a distinct-hubs
    // DataFrame just to count it (two extra jobs and two extra cached
    // relations feeding only this initialization).
    // Retire-after-setup: this staging copy exists only to feed the edge
    // count and bySrc's shuffle — held through the round loop it is a
    // THIRD object-heap copy of the edge list alongside bySrc/byDst, and
    // the 10× rehearsal GC-thrashed on exactly that (22–29 s vs 8.6 s
    // iters=3; the README's abandoned 100× HITS run failed the same
    // way), so it is unpersisted the moment bySrc materializes. Level is
    // the plain deserialized MEMORY_AND_DISK: a _SER level A/B'd ~0.2 s
    // slower at sf0.1 (Java-serializing 590k tuples on a copy that
    // lives for two reads buys nothing).
    val rows: RDD[(Long, Long)] = e
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // partitions sized by the EDGE relation, not the node count: every
    // per-round join and re-aggregate scans the |E|-row bySrc/byDst
    // copies, so a node-count rule starves the loop on dense graphs
    // (the sf0.1 purchase bipartite graph: 590k edges / 15k hubs → 4
    // partitions = 4 of 32 cores; edge-sized it uses 13). ~50k edges per
    // partition amortizes task overhead at fixture scale and caps at
    // defaultParallelism for any larger graph. (|E| ≥ |hubs| always, so
    // the edge rule alone keeps per-partition round work — O((|E| +
    // |V|)/p) — within 2× of the old max(edge, node) sizing while
    // letting the hub count come from the already-partitioned RDD below
    // instead of its own DataFrame job.)
    val m = rows.count()
    val p = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, m / 50000L + 1L)).toInt
    val part = new HashPartitioner(p)
    val bySrc: RDD[(Long, Long)] = rows
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // the dst-keyed copy swaps the ALREADY-DESERIALIZED src-keyed rows
    // instead of running the DataFrame→RDD conversion a second time —
    // one row-decode pass over |E| saved; the partitionBy shuffle is the
    // same either way
    val byDst: RDD[(Long, Long)] = bySrc
      .map(_.swap)
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val tot = Total
    // (x · Total) div s1 in BigInt == the DataFrame loop's DECIMAL(38,0)
    // path bit-for-bit: x ≥ 0, s1 > 0, both divisions floor
    def l1norm(raw: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      val s1 = raw.map(kv => BigInt(kv._2)).fold(BigInt(0))(_ + _)
      require(s1 > 0, "hits: L1 mass vanished — degenerate normalization")
      raw.mapValues(v => ((BigInt(v) * tot) / s1).toLong)
    }
    // distinct hub keys without an extra shuffle: bySrc is already
    // hash-partitioned by src, so the key-collapse is partition-local;
    // the hub count rides the same persisted RDD (replacing the caller's
    // distinct-DataFrame job)
    val hubKeys: RDD[(Long, Unit)] = bySrc.mapValues(_ => ())
      .reduceByKey(part, (u, _) => u)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nh = hubKeys.count()
    // bySrc (and hubKeys) materialized inside that count; byDst derives
    // from bySrc, so the staging copy is dead — release it before the
    // round loop rather than holding three edge copies through it
    rows.unpersist(blocking = false)
    if (nh == 0) { // release before refusing — nothing retires these later
      bySrc.unpersist(blocking = false)
      hubKeys.unpersist(blocking = false)
    }
    require(nh > 0, "hits: empty edge relation — no hub nodes to score")
    var h: RDD[(Long, Long)] = hubKeys.mapValues(_ => tot / nh)
    var a: RDD[(Long, Long)] = null
    val stored = scala.collection.mutable.Buffer[RDD[_]]()
    (1 to iters).foreach { _ =>
      val aRaw = bySrc.join(h, part)
        .map { case (_, (dst, hv)) => (dst, hv) }
        .reduceByKey(part, (x, y) => Math.addExact(x, y))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stored += aRaw
      a = l1norm(aRaw) // narrow over the persisted raw; stays partitioned
      val hRaw = byDst.join(a, part)
        .map { case (_, (src, av)) => (src, av) }
        .reduceByKey(part, (x, y) => Math.addExact(x, y))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stored += hRaw
      h = l1norm(hRaw)
    }
    val res = h.fullOuterJoin(a, part).map { case (id, (hv, av)) =>
      (id, hv.getOrElse(0L), av.getOrElse(0L))
    }
    val out = spark.createDataFrame(res).toDF("id", "hub_fp", "auth_fp")
      .select(col("id").cast(outType).as("id"), col("hub_fp"), col("auth_fp"))
      .localCheckpoint(eager = true)
    hubKeys.unpersist(blocking = false)
    bySrc.unpersist(blocking = false)
    byDst.unpersist(blocking = false)
    stored.foreach(_.unpersist(blocking = false))
    out
  }

  /** Multi-source shortest paths by synchronous Bellman–Ford rounds over
    * positive integer edge weights: dist₀ = 0 on the seed set; each round
    * every edge relaxes once — dist'(v) = min(dist(v), min over in-edges
    * (u,v,w) of dist(u)+w) — so after K rounds every ≤K-hop shortest path
    * is exact (fixed K keeps the recurrence a pure unrollable function;
    * pair with small-diameter graphs or raise `rounds`). Unreached nodes
    * are absent, not ∞.
    *
    * Scale: the round is ONE union + ONE min-aggregate — the previous
    * distance relation is referenced exactly once (the relaxed candidates
    * are unioned with the carried distances BEFORE the min, instead of a
    * full-outer join that would reference it twice), so the K rounds
    * chain into a single linear-lineage lazy plan with zero per-round
    * driver actions and no lineage fences. Per round the shuffle is the
    * |reached|-row min re-aggregate; edges are materialized once.
    * Math.addExact semantics via ANSI long addition (overflow throws,
    * never wraps). Returns (id, dist). */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, seeds: DataFrame, seedIdCol: String,
                    rounds: Int = 6,
                    forceDataFrameLoop: Boolean = false,
                    localMaxEdges: Long = 65536L): DataFrame = {
    require(rounds >= 1 && rounds <= 64)
    retireLastGeneration()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("w") >= 0L)
      .transform(mat)
    val sd = seeds.select(col(seedIdCol).as("id")).distinct()
    // small-graph driver gate — see [[pageRank]]; the relaxation rounds
    // run as a driver array loop, bit-equal to both distributed loops
    // (spec-proven by forcing `localMaxEdges = 0`)
    if (integralCol(sd, "id"))
      smallGraphEdges(e, "src", "dst", Some("w"), localMaxEdges,
          forceDataFrameLoop).foreach { es =>
        val cap = math.max(0L, math.min(localMaxEdges,
          (Int.MaxValue - 1).toLong)).toInt
        val sdProbe = sd.select(col("id").cast("long"))
          .limit(cap + 1).collect()
        if (sdProbe.length <= cap) {
          val outType = sd.select(col("id"))
            .union(e.select(col("dst").as("id"))).schema("id").dataType
          return shortestPathsLocal(e.sparkSession, es,
            sdProbe.map(_.getLong(0)), outType, rounds)
        }
      }
    // Integral ids take the co-partitioned RDD round loop (the
    // pageRank/HITS pattern): edges hash-partitioned once, the per-round
    // shuffle is the min re-aggregate only, zero per-round Catalyst
    // planning. Non-integral ids (and the parity spec) keep the
    // DataFrame loop.
    val integral = {
      import org.apache.spark.sql.types._
      def ok(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      ok(e.schema("src").dataType) && ok(e.schema("dst").dataType) &&
        ok(sd.schema("id").dataType)
    }
    if (integral && !forceDataFrameLoop) return shortestPathsRdd(e, sd, rounds)
    var dist = sd.select(col("id"), lit(0L).as("d"))
    (1 to rounds).foreach { _ =>
      dist = dist
        .union(e.join(dist.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("d") + col("w")).as("d")))
        .groupBy("id").agg(min(col("d")).as("d"))
    }
    dist
  }

  /** The Bellman–Ford round loop as RDDs over integral ids — spec-proven
    * bit-equal to the DataFrame loop (ANSI long addition ≙
    * Math.addExact). Edges hash-partition once and persist; every
    * round's distance join is co-partitioned → narrow; the per-round
    * shuffle is the union's min re-aggregate; the rounds chain lazily
    * into ONE job with zero per-round driver actions or Catalyst
    * planning. */
  private def shortestPathsRdd(e: DataFrame, sd: DataFrame,
                               rounds: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = e.sparkSession
    import spark.implicits._
    // the DataFrame loop's union(seeds, relaxed dst) coerces types;
    // mirror it via the union schema
    val outType = sd.select(col("id"))
      .union(e.select(col("dst").as("id"))).schema("id").dataType
    val p = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, 8))
    val part = new HashPartitioner(p)
    val edges: RDD[(Long, (Long, Long))] = e
      .select(col("src").cast("long"), col("dst").cast("long"), col("w"))
      .as[(Long, Long, Long)].rdd
      .map { case (s, d, w) => (s, (d, w)) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var dist: RDD[(Long, Long)] = sd.select(col("id").cast("long")).as[Long]
      .rdd.map((_, 0L)).partitionBy(part)
    (1 to rounds).foreach { _ =>
      val relaxed = edges.join(dist, part)
        .map { case (_, ((d, w), dd)) => (d, Math.addExact(dd, w)) }
      dist = dist.union(relaxed)
        .reduceByKey(part, (a, b) => math.min(a, b)) // the ONE shuffle
    }
    val out = spark.createDataFrame(dist).toDF("id", "d")
      .select(col("id").cast(outType).as("id"), col("d"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    out
  }

  /** Driver-array execution of the synchronous Bellman–Ford rounds under
    * the small-graph gate — same min-plus Long arithmetic (overflow-
    * checked like ANSI), same seed set semantics (seeds outside the graph
    * keep distance 0), bit-equal to the distributed loops (spec-proven by
    * forcing `localMaxEdges = 0`). */
  private def shortestPathsLocal(spark: org.apache.spark.sql.SparkSession,
                                 es: Array[(Long, Long, Long)],
                                 seedIds: Array[Long],
                                 outType: org.apache.spark.sql.types.DataType,
                                 rounds: Int): DataFrame = {
    val dist = scala.collection.mutable.HashMap.empty[Long, Long]
    seedIds.foreach(dist(_) = 0L)
    var r = 0
    while (r < rounds) {
      val relaxed = scala.collection.mutable.HashMap.empty[Long, Long]
      var j = 0
      while (j < es.length) {
        val (s, d, w) = es(j)
        dist.get(s).foreach { ds =>
          val cand = Math.addExact(ds, w)
          if (relaxed.get(d).forall(cand < _)) relaxed(d) = cand
        }
        j += 1
      }
      relaxed.foreach { case (d, v) =>
        if (dist.get(d).forall(v < _)) dist(d) = v
      }
      r += 1
    }
    spark.createDataFrame(dist.toSeq.sortBy(_._1)).toDF("id", "d")
      .select(col("id").cast(outType).as("id"), col("d"))
  }

  /** Driver-array execution of the synchronous LPA rounds under the
    * small-graph gate — the identical adopt-most-frequent-tie-smallest
    * rule over the previous round's labels, bit-equal to the distributed
    * loop (spec-proven by forcing `localMaxEdges = 0`). */
  private def labelPropagationLocal(spark: org.apache.spark.sql.SparkSession,
                                    es: Array[(Long, Long, Long)],
                                    idType: org.apache.spark.sql.types.DataType,
                                    iters: Int): DataFrame = {
    val (ids, src, dst, _) = indexEdges(es)
    val nn = ids.length
    // symmetric adjacency as index lists
    val deg = new Array[Int](nn)
    var j = 0
    while (j < es.length) { deg(src(j)) += 1; deg(dst(j)) += 1; j += 1 }
    val off = new Array[Int](nn + 1)
    var v = 0
    while (v < nn) { off(v + 1) = off(v) + deg(v); v += 1 }
    val adj = new Array[Int](off(nn))
    val fill = off.clone()
    j = 0
    while (j < es.length) {
      adj(fill(src(j))) = dst(j); fill(src(j)) += 1
      adj(fill(dst(j))) = src(j); fill(dst(j)) += 1
      j += 1
    }
    var lab = Array.tabulate(nn)(v => ids(v))
    var r = 0
    while (r < iters) {
      val next = new Array[Long](nn)
      v = 0
      while (v < nn) {
        val counts = scala.collection.mutable.HashMap.empty[Long, Long]
        var k = off(v)
        while (k < off(v + 1)) {
          val l = lab(adj(k))
          counts(l) = counts.getOrElse(l, 0L) + 1L
          k += 1
        }
        // most frequent, ties to the smallest label — min over (-c, l)
        var bestL = 0L; var bestC = -1L
        counts.foreach { case (l, c) =>
          if (c > bestC || (c == bestC && l < bestL)) { bestL = l; bestC = c }
        }
        next(v) = bestL
        v += 1
      }
      lab = next
      r += 1
    }
    spark.createDataFrame(ids.indices.map(v => (ids(v), lab(v))))
      .toDF("id", "l")
      .select(col("id").cast(idType).as("id"), col("l").cast(idType).as("l"))
  }

  /** Driver-array execution of the deterministic walk recurrence under
    * the small-graph gate: each transition is the identical
    * argmin-md5("seed_walk_step_candidate") the distributed loop computes
    * (lowercase-hex MD5 of the UTF-8 bytes, compared as ASCII — the same
    * order Spark's `md5`/`min_by` impose), so the corpus is bit-equal
    * (spec-proven by forcing `localMaxEdges = 0`). */
  private def randomWalksLocal(spark: org.apache.spark.sql.SparkSession,
                               es: Array[(Long, Long, Long)],
                               seedIds: Array[Long],
                               seedType: org.apache.spark.sql.types.DataType,
                               nodeType: org.apache.spark.sql.types.DataType,
                               walksPerSeed: Int, steps: Int): DataFrame = {
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    es.foreach { case (a, b, _) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(32)
      d.foreach(b => sb.append(String.format("%02x", Byte.box(b))))
      sb.toString
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (seed <- seedIds; walk <- 1 to walksPerSeed) {
      var node = seed
      var t = 1
      var alive = true
      while (alive && t <= steps) {
        adj.get(node) match {
          case Some(nbrs) =>
            var best: Long = 0L; var bestH: String = null
            nbrs.foreach { c =>
              val h = md5hex(s"${seed}_${walk}_${t}_$c")
              if (bestH == null || h.compareTo(bestH) < 0) { best = c; bestH = h }
            }
            rows += ((seed, walk.toLong, t.toLong, best))
            node = best
          case None => alive = false // isolated/non-graph seed: walk stops
        }
        t += 1
      }
    }
    spark.createDataFrame(rows.toSeq).toDF("seed", "walk", "step", "node")
      .select(col("seed").cast(seedType).as("seed"), col("walk"),
        col("step"), col("node").cast(nodeType).as("node"))
  }

  /** DETERMINISTIC random-walk corpus over an undirected graph — the
    * graph → sequence-corpus step that sampling-based graph embeddings
    * train on (DeepWalk, Perozzi 2014; node2vec's p=q=1 case): from every
    * seed, `walksPerSeed` walks of `steps` uniform-neighbour steps. The
    * "randomness" is a pure hash function of (seed, walk index, step,
    * candidate): next(u) = argmin over neighbours v of
    * md5(seed‖walk‖step‖v) — layout-invariant, replayable bit-for-bit by
    * an external engine (the A-ES weighted-sampling trick applied to
    * walk transitions), and statistically uniform per step because md5
    * order on distinct inputs is. A walk that reaches an isolated node
    * stops (inner join); step rows accumulate per round.
    *
    * Scale: per step ONE co-partitioned join of the walk-front relation
    * (|seeds|·walksPerSeed rows) against the symmetric edge list
    * (materialized once), then one map-side-combinable argmin aggregate
    * per walk; per-step candidate volume is Σ deg(front) — bounded by
    * walksPerSeed · max-degree, never |V|² — and the rounds chain into
    * one lazy plan with zero per-round driver actions. Returns
    * (seed, walk, step, node), steps 1..`steps`. */
  def randomWalks(pairs: DataFrame, aCol: String, bCol: String,
                  seeds: DataFrame, seedIdCol: String,
                  walksPerSeed: Int = 3, steps: Int = 5,
                  localMaxEdges: Long = 65536L): DataFrame = {
    require(walksPerSeed >= 1 && walksPerSeed <= 64)
    require(steps >= 1 && steps <= 32)
    retireLastGeneration()
    val e = normalize(pairs, aCol, bCol)
    // small-graph driver gate — see [[pageRank]]; each hop's argmin-md5
    // transition replays on the driver with the identical hash input
    // string, bit-equal to the distributed loop (spec-proven by forcing
    // `localMaxEdges = 0`)
    if (integralCol(seeds, seedIdCol))
      smallGraphEdges(e, aCol, bCol, None, localMaxEdges, force = false)
        .foreach { es =>
          val cap = math.max(0L, math.min(localMaxEdges,
            (Int.MaxValue - 1).toLong)).toInt
          val sdProbe = seeds.select(col(seedIdCol).cast("long").as("id"))
            .distinct().limit(cap + 1).collect()
          if (sdProbe.length <= cap)
            return randomWalksLocal(e.sparkSession, es,
              sdProbe.map(_.getLong(0)).sorted,
              seeds.schema(seedIdCol).dataType, e.schema(aCol).dataType,
              walksPerSeed, steps)
        }
    val sym = e.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(e.select(col(bCol).as("src"), col(aCol).as("dst")))
      .transform(mat)
    var front = seeds.select(col(seedIdCol).as("seed")).distinct()
      .select(col("seed"),
        explode(expr(s"sequence(1, $walksPerSeed)")).as("walk"),
        col("seed").as("node"))
    val arms = (1 to steps).map { t =>
      front = front
        .join(sym.withColumnRenamed("src", "node"), "node")
        .withColumn("h", md5(concat_ws("_",
          col("seed"), col("walk"), lit(t), col("dst"))))
        .groupBy("seed", "walk")
        .agg(min_by(col("dst"), col("h")).as("node"))
      front.withColumn("step", lit(t.toLong))
    }
    arms.reduce(_.unionByName(_))
      .select(col("seed"), col("walk").cast("long").as("walk"),
        col("step"), col("node"))
  }

  /** Synchronous label-propagation community detection (Raghavan, Albert
    * & Kumara, Phys. Rev. E 2007), made DETERMINISTIC: every node starts
    * as its own label; each round every node simultaneously adopts the
    * label that is most frequent among its NEIGHBOURS' current labels,
    * ties broken by the smallest label — the rule is a pure function of
    * the previous round's labels, so the result is layout-invariant and
    * an external engine replays it round for round (the classic
    * formulation breaks ties randomly and updates asynchronously, which
    * is unreproducible by design; fixed `iters` also sidesteps the
    * bipartite oscillation non-termination). Complements the components
    * family: CC finds CONNECTIVITY classes, LPA finds DENSITY classes —
    * communities inside one connected component.
    *
    * Scale: per round one co-partitioned join of the symmetric edge list
    * (materialized once) against the |V|-row label relation, then two
    * key aggregates ((node, label) counts → per-node argmax via min_by,
    * both map-side combinable); the label relation is referenced once
    * per round, so the rounds chain into one linear-lineage lazy plan —
    * zero per-round driver actions. Input: undirected pairs, routed
    * through [[normalize]] (loops/dups/orientations collapsed).
    * Returns (id, l). */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       iters: Int = 4,
                       localMaxEdges: Long = 65536L): DataFrame = {
    require(iters >= 1 && iters <= 20)
    retireLastGeneration()
    val e = normalize(pairs, aCol, bCol)
    // small-graph driver gate — see [[pageRank]]; the synchronous
    // adopt-most-frequent rounds run as a driver array loop, bit-equal
    // to the distributed loop (spec-proven by forcing `localMaxEdges = 0`)
    smallGraphEdges(e, aCol, bCol, None, localMaxEdges, force = false)
      .foreach { es =>
        return labelPropagationLocal(e.sparkSession, es,
          e.schema(aCol).dataType, iters)
      }
    val sym = e.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(e.select(col(bCol).as("src"), col(aCol).as("dst")))
      .transform(mat)
    var lab = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("l"))
    (1 to iters).foreach { _ =>
      lab = sym.join(lab.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("l"))
        .groupBy("id", "l").agg(count(lit(1)).as("c"))
        .groupBy("id")
        .agg(min_by(col("l"),
          struct((-col("c")).as("nc"), col("l").as("lt"))).as("l"))
    }
    lab
  }

  /** Link prediction by the Resource-Allocation index (Zhou, Lü &
    * Zhang, EPJ B 2009): for a non-adjacent pair (x, y), RA = Σ over
    * common neighbours z of 1/deg(z) — here Total div deg(z) in 1e-12
    * integer fixed point, so scores replay exactly in the oracle. The
    * wedge enumeration joins the symmetric edge list with itself on the
    * shared endpoint; its cost is Σ_z deg(z)², so wedges through
    * super-hubs (deg > `maxDeg`) are excluded BEFORE the join — the
    * standard hub cap (a hub's 1/deg contribution is negligible anyway;
    * the oracle applies the identical cap, so this is part of the
    * operator's contract, not an approximation of it). Existing edges are
    * removed by an anti-join on the canonical pair. Input must be
    * [[normalize]]d (deduplicated a < b pairs). Returns (item_a, item_b,
    * n_common, ra_fp) for non-adjacent pairs with ≥ 1 common neighbour.
    */
  def linkPredictRA(pairs: DataFrame, aCol: String, bCol: String,
                    maxDeg: Long = 1024L): DataFrame = {
    require(maxDeg >= 1)
    retireLastGeneration()
    val sym = pairs.select(col(aCol).as("z"), col(bCol).as("x"))
      .union(pairs.select(col(bCol).as("z"), col(aCol).as("x")))
      .transform(mat)
    val deg = sym.groupBy("z").agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxDeg)
    // attach the degree to each wedge leg once; wedge = self-join on z
    val legs = sym.join(deg, "z").transform(mat)
    val l1 = legs.select(col("z"), col("x"), col("d"))
    val l2 = legs.select(col("z"), col("x").as("y"))
    val cand = l1.join(l2, "z").filter(col("x") < col("y"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("n_common"),
        sum(expr(s"${Total}L div d")).as("ra_fp"))
    cand.join(pairs,
        cand("x") === pairs(aCol) && cand("y") === pairs(bCol), "left_anti")
      .select(col("x").as("item_a"), col("y").as("item_b"),
        col("n_common"), col("ra_fp"))
  }

  /** Link prediction by the Jaccard neighbourhood coefficient (Liben-
    * Nowell & Kleinberg 2003): for a non-adjacent pair (x, y),
    * J = |Γ(x)∩Γ(y)| / |Γ(x)∪Γ(y)| = n_common / (deg(x)+deg(y)−n_common)
    * — RA's size-normalized sibling (RA rewards LOW-degree witnesses;
    * Jaccard penalizes LARGE neighbourhoods symmetrically). Same wedge
    * machinery as [[linkPredictRA]]: common neighbours are counted by the
    * symmetric-edge self-join on the shared endpoint z with the identical
    * deg(z) ≤ `maxDeg` hub cap applied BEFORE the join (Σ deg² bounded;
    * the cap is part of the operator's contract, replayed exactly by the
    * oracle — a hub's witness adds ~0 to Jaccard anyway since it inflates
    * both unions). The DENOMINATOR degrees are the full, uncapped
    * neighbourhood sizes — a per-node count, one broadcast-sized relation,
    * no quadratic term. Score in 1e-12 integer fixed point with the
    * 128-bit intermediate (n_common · Total overflows a long at
    * web-graph co-citation counts). Input must be [[normalize]]d
    * (deduplicated a < b pairs). Returns (item_a, item_b, n_common,
    * jac_fp) for non-adjacent pairs with ≥ 1 (non-hub) common neighbour. */
  def linkPredictJaccard(pairs: DataFrame, aCol: String, bCol: String,
                         maxDeg: Long = 1024L): DataFrame = {
    require(maxDeg >= 1)
    retireLastGeneration()
    val sym = pairs.select(col(aCol).as("z"), col(bCol).as("x"))
      .union(pairs.select(col(bCol).as("z"), col(aCol).as("x")))
      .transform(mat)
    // full degree of every node (Jaccard's denominator); the wedge legs
    // below re-derive the CAPPED degree of the shared endpoint from the
    // same relation — one scan, two aggregates, both node-sized
    val degAll = sym.groupBy(col("x").as("id")).agg(count(lit(1)).as("deg"))
      .transform(mat)
    val degZ = sym.groupBy("z").agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxDeg).select("z")
    val legs = sym.join(degZ, "z").transform(mat)
    val cand = legs.join(legs.select(col("z"), col("x").as("y")), "z")
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_common"))
    val scored = cand
      .join(degAll.select(col("id").as("x"), col("deg").as("dx")), "x")
      .join(degAll.select(col("id").as("y"), col("deg").as("dy")), "y")
      .withColumn("jac_fp", expr(
        s"(cast(n_common as decimal(38,0)) * ${Total}L) " +
          "div (dx + dy - n_common)"))
    scored.join(pairs,
        scored("x") === pairs(aCol) && scored("y") === pairs(bCol), "left_anti")
      .select(col("x").as("item_a"), col("y").as("item_b"),
        col("n_common"), col("jac_fp").cast("long").as("jac_fp"))
  }
}
