package graft

import graft.route.Router

/** Every declared query must run and (for nearly all) return rows at
  * sf0.001 — the safety net behind the driver's rows-only checks, plus
  * the flagship entry and observability metrics. */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Tiny-SF corner cases where an empty (but schema-valid) result is
  // legitimate for threshold queries.
  private val mayBeEmpty = Set("sim_threshold_pairs", "dedup_ngram_jaccard",
    "dedup_minhash_pairs", "dedup_simhash", "emb_near_dups", "dedup_clusters",
    "dedup_against_snapshot", "txt_contamination", "txt_heavy_bigrams")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("q_above_avg_orders never broadcasts the per-customer aggregate") {
    // the aggregate side grows with |customers| — broadcasting it is a
    // 100×-scale OOM; the window form must win
    val plan = SparkEntry.queries("q_above_avg_orders")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"aggregated side must not be broadcast:\n$plan")
  }

  test("q8 market share joins every dimension by broadcast, facts by shuffle") {
    // five dims (part/supplier/customer/nation/region) must broadcast;
    // the only shuffle join is lineitem ⋈ orders on orderkey — a
    // sort-merge (or shuffled-hash) exchange that scales with the facts
    val plan = SparkEntry.queries("q8_market_share")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no unkeyed join may appear:\n${plan.take(3000)}")
  }

  test("q22 anti join stays keyed; only the scalar average broadcasts") {
    val plan = SparkEntry.queries("q22_idle_customers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"),
      s"scalar must broadcast, not cartesian:\n${plan.take(3000)}")
  }

  test("txt_source_divergence never materializes a sources×vocab grid") {
    // the unigram vocabulary is heaps-law unbounded at web scale: the
    // vocab-sized global-count relation must reach the per-source counts
    // through a keyed SHUFFLE join, never a broadcast or a cross join.
    // Only the 1-row corpus total may cross-broadcast.
    val plan = exec("txt_source_divergence")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian against the vocabulary:\n${plan.take(3000)}")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1,
      s"only the 1-row total may cross-broadcast, found $bnlj BNLJs:\n${plan.take(3000)}")
    assert(plan.contains("SortMergeJoin"),
      s"the vocab-sized join must stay keyed and shuffled:\n${plan.take(3000)}")
  }

  test("sim_int8_topk scans the packed bytes, never a double-array column") {
    // the point of the SQ8 layout is the 8× scan cut: the corpus-side
    // read schema must be the BINARY codes (+ tiny id/scale), with no
    // array<double> embedding column resurrected anywhere in the plan
    val plan = exec("sim_int8_topk")
    assert(plan.contains("emb_i8"), s"expected the packed scan:\n${plan.take(3000)}")
    assert(!plan.contains("unpack_i8") && !plan.contains("array<double>"),
      s"ranking must stay on the bytes (DotI8/NormSqI8), never widen:\n${plan.take(3000)}")
  }

  test("incremental rollup merge is two scans + one merge aggregate, no join") {
    val plan = SparkEntry.queries("q_incremental_rollup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"MV merge must be union+agg, never a join:\n${plan.take(3000)}")
    assert(plan.contains("Union"), s"expected partial-union shape:\n${plan.take(3000)}")
  }

  private def exec(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  private def shuffleJoins(plan: String): Int =
    "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length

  test("q2 correlated min decorrelates to a window, never a re-agg self-join") {
    // the per-part minimum must ride the aggregate's own hash partitioning
    // (one Window, zero shuffle joins) — the naive decorrelation re-
    // aggregates and self-joins, two extra lineitem-sized exchanges
    val plan = exec("q2_min_cost_supplier")
    assert(plan.contains("Window"), s"expected window-min:\n${plan.take(3000)}")
    assert(shuffleJoins(plan) == 0,
      s"part/supplier must broadcast; no shuffle join allowed:\n${plan.take(3000)}")
  }

  test("q9 star join: dims broadcast, lineitem⋈orders is the only shuffle join") {
    val plan = exec("q9_product_profit")
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n${plan.take(3000)}")
    assert(shuffleJoins(plan) <= 1,
      s"only the fact-fact join may shuffle:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n${plan.take(3000)}")
  }

  test("q11/q15 scalar subqueries broadcast, never cartesian") {
    for (name <- Seq("q11_important_parts", "q15_top_supplier")) {
      val plan = exec(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name: global scalar must broadcast:\n${plan.take(3000)}")
    }
  }

  test("q16 NOT-IN complaint list decorrelates to a broadcast anti join") {
    val plan = exec("q16_supplier_part_counts")
    assert(plan.contains("LeftAnti"), s"expected anti join:\n${plan.take(3000)}")
    assert(shuffleJoins(plan) == 0,
      s"both dims are tiny — everything broadcasts:\n${plan.take(3000)}")
  }

  test("q20/q21 correlated EXISTS collapse to window counts, no self-join") {
    // Q21's reference SQL is EXISTS + NOT EXISTS over lineitem — two
    // lineitem self-joins. The engine reformulates both as per-key window
    // counts over the (order|part, supplier) aggregate: exactly one fact
    // shuffle join (orders), zero self-joins.
    for (name <- Seq("q20_excess_suppliers", "q21_waiting_suppliers")) {
      val plan = exec(name)
      assert(plan.contains("Window"), s"$name: expected window counts:\n${plan.take(3000)}")
      assert(shuffleJoins(plan) <= 1,
        s"$name: the EXISTS pair must not become self-joins:\n${plan.take(3000)}")
    }
  }

  test("DSIR weight table broadcasts; novelty first-doc rides the bigram window") {
    val dsir = exec("txt_dsir_weights")
    assert(dsir.contains("BroadcastHashJoin"),
      s"256-bucket weight table must broadcast:\n${dsir.take(3000)}")
    val nov = exec("txt_ngram_novelty")
    assert(nov.contains("Window"), s"expected window-min first-doc:\n${nov.take(3000)}")
    assert(shuffleJoins(nov) == 0,
      s"novelty must not self-join the bigram relation:\n${nov.take(3000)}")
  }

  test("partition-pruned scan carries non-empty PartitionFilters") {
    val plan = exec("q_partition_prune")
    assert(plan.contains("PartitionFilters: ["),
      s"expected a partitioned scan:\n${plan.take(3000)}")
    assert(!plan.matches("(?s).*PartitionFilters: \\[\\].*"),
      s"day predicate must prune partitions, not filter rows post-scan:\n${plan.take(3000)}")
  }

  test("IVF probe assignment plan has no driver-side collect (scan → window → join)") {
    val plan = SparkEntry.queries("sim_ivf_topk")(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the probe side must appear as a plan subtree (window over the query
    // scan), not as a pre-collected LocalRelation of probe rows
    assert(plan.contains("Window"), s"expected distributed probe ranking:\n$plan")
  }

  test("graph ops: degree tables broadcast via AQE, joins never cartesian") {
    // the query entries return an eagerly-materialized (checkpointed)
    // result, so inspect the OP's own plan directly: build the same
    // co-purchase graph and run triangleCounts on it
    import org.apache.spark.sql.functions._
    val pairs = graft.ops.Affinity.basketPairCounts(
        graft.ops.Affinity.basketItems(
          graft.Tables.table(spark, sf, "lineitem"), "l_orderkey", "l_partkey"))
      .filter(col("n_ab") >= 2).select("item_a", "item_b")
    val df = graft.ops.Graph.triangleCounts(pairs, "item_a", "item_b")
    val static = df.queryExecution.executedPlan.toString
    assert(!static.contains("CartesianProduct"), s"q_triangles:\n${static.take(3000)}")
    // the |V|-row degree table is NOT force-broadcast (a hint would OOM
    // the driver on a big graph); AQE must still choose broadcast at this
    // scale — assert on the FINAL adaptive plan, after execution
    df.count()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the degree join at this scale:\n${finalPlan.take(3000)}")
  }

  test("vocab coverage broadcasts the bounded vocab into the eval token stream") {
    val plan = exec("txt_vocab_coverage")
    assert(plan.contains("BroadcastHashJoin"),
      s"500-row vocab must broadcast, never shuffle the token stream:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-500 must be a bounded take, not a global sort:\n${plan.take(3000)}")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("flagship entry returns good routed rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("observe metrics count the routing channels inline (K5)") {
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    @volatile var seen: Map[String, Any] = Map.empty
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        val m = qe.observedMetrics
        if (m.contains(Observability.RouteMetrics))
          seen = Map("row" -> m(Observability.RouteMetrics))
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val routed = Pipeline.transform(Pipeline.eventsAsEnvelopes(spark, sf),
        graft.config.PipelineConfig())
      Observability.observeRoutes(routed).count()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val row = seen("row").asInstanceOf[org.apache.spark.sql.Row]
      assert(row.getAs[Long]("good") == 1000L)
      assert(row.getAs[Long]("failed") == 0L)
      assert(row.getAs[Long]("total") == 1000L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("router helper channels are disjoint and complete on events replay") {
    val routed = Pipeline.transform(Pipeline.eventsAsEnvelopes(spark, sf),
      graft.config.PipelineConfig())
    assert(Router.good(routed).count() == 1000)
    assert(Router.failed(routed).count() == 0)
    assert(Router.dropped(routed).count() == 0)
  }
}
