package graft

/** Shuffle-budget regression guard: pins the number of shuffle exchanges
  * in the executed plan of each headline query. A shuffle is the unit of
  * 100-TB cost — at 1000 executors an extra exchange is an extra full
  * network pass over the data — so a refactor that silently adds one
  * should fail CI, not surface as a bench regression three rounds later.
  *
  * Budgets are UPPER bounds set at the current (audited) plan shape; AQE
  * may collapse some at runtime, never add. If a change legitimately needs
  * another exchange, raising the budget here is the documented decision
  * point. Counted on the pre-AQE executedPlan string (local[4], shuffle
  * partitions 4 — see SparkSpec) so the count is deterministic.
  */
class PlanBudgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // query -> max ShuffleExchange occurrences in the executed plan
  private val budgets: Map[String, Int] = Map(
    // TPC-H: one fact-fact shuffle + the final agg/sort exchanges
    "q1_pricing_summary" -> 2, // partial agg -> final agg + order
    "q3_top_orders" -> 3,
    "q5_nation_revenue" -> 4,
    "q9_product_profit" -> 5,
    "q12_latency_priority" -> 3,
    "q21_waiting_suppliers" -> 5,
    // correlated-subquery rewrites: groupBy shuffle reused by the window
    "q2_min_cost_supplier" -> 3,
    "q20_excess_suppliers" -> 4,
    // pipeline replay: Par.spread round-robin (single-file scan → per-core
    // decode; a real Kinesis source arrives pre-partitioned by shard),
    // then shuffle-free decode→route→enrich until the final index rollup
    "pipe_index_counts" -> 3,
    // dedup: one bigram/shingle shuffle + grouping, never a self-join
    // shuffle of the corpus
    "dedup_exact" -> 3,
    "txt_ngram_novelty" -> 5,
    "txt_dsir_weights" -> 7,
    "txt_gopher_report" -> 2,
    // two label aggs (centroid, mean-dist — dist lineage re-derived for
    // each) + final rollup + order; all broadcasts in between
    "emb_centroid_outliers" -> 5,
    // sketch partial -> final + estimate join + order
    "q_kmv_distinct" -> 4,
    "q_sampled_quantiles" -> 3,
    // round-9 additions (post-localCheckpoint tails: the bucket build /
    // shortlist stages are fenced, so the final plan carries only the
    // downstream aggregation exchanges)
    "dedup_containment" -> 2,
    // token-count agg + per-source topk agg + final order; the OLS sums
    // fold the ≤500-element topk array in place (no per-rank exchange)
    "txt_zipf_fit" -> 3,
    "txt_keyphrases" -> 5,
    // round-10 additions (fence-free tails; the graph rows checkpoint
    // through graphResult so their final plans carry no exchange to pin)
    // round-12: the bucket/norm fences became LAZY persists (isolated A/B
    // win — OPTIMIZATION_r12.md §5), so the plan STRING now prints the
    // cached lineages once per reference instead of truncating at an RDD
    // leaf: buckets (3 exchanges: round-robin spread, tf agg, bucket agg)
    // prints 3× (dots + nested in each norm side), norms (1 exchange)
    // prints 2×, plus the pair groupBy = 1 + 3·3 + 2·1 = 12 string hits
    // for 5 DISTINCT executed exchanges — each cached lineage runs once
    // at first materialization. The norm joins still ride broadcasts.
    "dedup_cosine_tf" -> 12,
    // two full-vocab index builds (explode+agg / df agg / stats) + merge
    // aggregates + final order; the read path adds no corpus exchange
    "txt_bm25_append" -> 8,
    // distinct value pairs + banded frontier window + band-min agg +
    // band-merge self-join aggs + order. The distinct/band subtree
    // PRINTS four times (bounds, window and band-min branches) but is
    // ONE physical exchange under (AQE) exchange reuse — the budget
    // counts string occurrences, hence 10
    "q_skyline_parts" -> 10,
    // multiplicity histogram aggs + the histogram² prefix join
    "q_key_gini" -> 6,
    // z-sample agg is SinglePartition (≤1024 values); bucket rollup + order
    "q_zorder_buckets" -> 2,
    // two grouped-median stats aggregates + the outlier recount
    "txt_doc_outliers" -> 3,
    // round-11 additions
    // register agg (partial→final) + estimate agg + exact countDistinct
    // (2-exchange expand) + order — all on ≤64-rows/group state
    "q_hll_distinct" -> 5,
    // + the (type, day)→type max-merge re-aggregation
    "q_hll_merge" -> 6,
    // the truss rounds are checkpoint-fenced (the peel-loop pattern);
    // the final plan is the unioned per-round stat aggregates only
    "q_ktruss" -> 1,
    // feature scan → per-source confusion agg + order (training epochs
    // run on the fenced feature table, off this plan)
    "txt_perceptron" -> 2,
    // pagerank rounds checkpoint-fenced; final = top-k order on the
    // vocab-sized rank table
    "txt_textrank" -> 1,
    // broadcast ranking + label joins, per-qid metric aggs + order —
    // every shuffled relation is ≤ queries×k rows
    "sim_ndcg" -> 4,
    // two rankings (the projected side re-derives quantize+project per
    // consumer branch) + overlap/precision joins; all small-side
    "sim_abt_overlap" -> 13)

  // Queries that once carried (or are at risk of regrowing) a global
  // unpartitioned window over an unbounded relation — the single-task
  // sort that "WindowExec: No Partition Defined" warns about. Guarded on
  // the optimized logical plan: every Window node must have a partition
  // spec. (Bounded-relation global windows elsewhere document their
  // bound; these are contractually window-safe.)
  //
  // q_skyline_parts left this list in round 12: below the
  // Analytics.SkylineSmallRows footer cutoff the small-input gate
  // DELIBERATELY plans one bounded-partition window (the optimizer
  // folds the constant band id out of the partition spec), and at
  // sf0.001 the gate always engages. The unbounded-path guard lives in
  // AnalyticsSpec ("skyline plans only partitioned windows" pins the
  // banded rows=0 plan; the gate spec pins that large/unknown metadata
  // keeps that path).
  private val noGlobalWindow =
    Seq("q_key_gini", "q_zorder_buckets")

  noGlobalWindow.foreach { name =>
    test(s"$name plans no unpartitioned window") {
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan
      val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty,
        s"$name: ${bad.size} unpartitioned Window node(s) — a single-task " +
          s"global sort at scale:\n${bad.mkString("\n").take(2000)}")
    }
  }

  budgets.foreach { case (name, budget) =>
    test(s"$name stays within its shuffle budget ($budget)") {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val got = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange RoundRobinPartitioning"
        .r.findAllIn(plan).length
      assert(got <= budget,
        s"$name: $got shuffle exchanges > budget $budget — a new exchange " +
          s"is a new full-data network pass at scale:\n${plan.take(4000)}")
    }
  }
}
