package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational suite over the TPC-H-ish star schema — proves the engine is a
  * full Spark citizen (SURVEY.md §2.7: joins, aggregation, windows, set ops
  * come from org.apache.spark.sql) and provides the bench headliners.
  *
  * Scale notes (100 TB thinking, verified via .explain on sf0.1):
  *  - dimension joins (region/nation/supplier/customer) are broadcast —
  *    no shuffle of the fact table;
  *  - aggregations are partial (map-side combine) before the single shuffle;
  *  - predicates/projections push into the parquet scans.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.table(s, dir, name)

  /** The support>=2 co-purchase edge relation (item pairs co-occurring in
    * >=2 baskets) shared by the FIVE graph queries — built once per
    * (sfDir, JVM) and kept persisted, the way a pipeline materializes its
    * graph once and runs all analytics against it. The graph ops
    * themselves retire their own derived caches per invocation
    * (Graph.retireLastGeneration); this input relation is the one
    * deliberate long-lived cache, ~|E| rows. */
  /** Materialize a graph-analytics result under a RELATION-SIZED shuffle
    * partition count. The co-purchase graph is ~3.6k edges at sf0.1 —
    * at the session's 32 shuffle partitions the iterative loops' many
    * tiny exchanges cost 2-6x more in per-task fixed overhead than the
    * data work (measured via probe: pagerank 6.1s -> 3.3s, triangles
    * 11.4s -> 1.9s at 4 partitions). A production graph job sizes this
    * to |E| exactly the same way (cf. withFewShufflePartitions for the
    * stream rows). The conf must be active at MATERIALIZATION time, so
    * the tiny (<=50 row) result is eagerly local-checkpointed inside the
    * scope; the session conf is restored before returning. */
  private def graphResult(s: SparkSession)(df: => DataFrame): DataFrame = {
    // CONSTRAINT: spark.conf is SESSION-global, so this override leaks to
    // any query planning concurrently on the same session, and overlapping
    // graphResult calls could restore a stale previous value. The engine's
    // entry points (Verify, Bench, the driver harness) run queries
    // strictly serially on one thread, so this is safe here; a server-style
    // concurrent deployment must give each graph job its own
    // `spark.newSession()` (cloned conf, shared context/cache) instead.
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "4")
    try df.localCheckpoint(eager = true) finally s.conf.set(key, prev)
  }

  private val copurchaseCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val purchaseEdgesCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  // basketItems' maxBasket = 1024 hub-basket exclusion is part of THIS
  // graph's contract too: every oracle built on the li/pp co-purchase
  // prefix carries the matching `lok` HAVING count(*) <= 1024 CTE, so a
  // corpus with a >1024-item order peels identically on both engines
  // (inert on TPC-H fixtures — baskets are <= 7 items)
  private def copurchasePairs(s: SparkSession, dir: String): DataFrame =
    copurchaseCache.getOrElseUpdate(dir, {
      import graft.ops.Affinity
      Affinity.basketPairCounts(
          Affinity.basketItems(t(s, dir, "lineitem"), "l_orderkey", "l_partkey"))
        .filter(col("n_ab") >= 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** EWMA decay weights (1-α)^j, α = 0.3, j = 0..7 — most-recent first.
    * Computed by repeated exact double multiplication (never pow(),
    * whose libm rounding is platform-defined) and embedded as
    * round-trip literals in the oracle SQL so both engines fold the
    * identical constants. */
  private val EwmaWeights: Seq[Double] = Seq.iterate(1.0, 8)(_ * 0.7)

  /** Benford first-digit expectations log10(1 + 1/d) — computed once on
    * the driver and embedded as identical literals in both engines (the
    * SQL must never call log10 itself: libm rounding is platform-defined). */
  private val BenfordP: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
  private def ewmaWeightsSqlList: String =
    EwmaWeights.map(java.lang.Double.toString).mkString("[", ", ", "]")
  private def ewmaWeightSumSql: String =
    java.lang.Double.toString(EwmaWeights.sum)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan-heavy partial aggregation
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape: selective dim filter + two joins + top-k
    "q3_top_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: star join through 5 tables, dims broadcast
    "q5_nation_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q7 shape: bilateral shipping volume between nation pairs
    // (4-nation block — wide enough that sf0.001 still has rows) by year.
    // Six-relation join where only lineitem⋈orders is data-sized:
    // every dimension broadcasts, the two nation filters semi-reduce
    // customer/supplier BEFORE the fact join, and the year rollup rides
    // the same exchange.
    "q7_nation_volume" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        .filter(col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10 shape: customers ranked by revenue lost to returned
    // items — date-windowed orders, return-flagged lineitems, nation
    // broadcast, top-20 via TakeOrderedAndProject (bounded heap)
    "q10_returned_customers" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q4 shape: EXISTS decorrelation. The correlated EXISTS becomes a
    // LEFT SEMI join — lineitem is filtered and deduped per orderkey by the
    // semi-join itself (no distinct pass), then the priority rollup rides
    // the post-join exchange. At scale the semi side carries only
    // l_orderkey, so the shuffle moves one long column.
    "q4_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val returned = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q6 shape: the pure pushdown showcase — no join at all. All
    // three predicates and both referenced columns must reach the parquet
    // scan (PushedFilters + 4-column ReadSchema); the aggregate is a
    // single partial-final pair over an empty grouping.
    "q6_discount_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))),

    // TPC-H Q13 shape: outer-join distribution. LEFT join keeps the
    // zero-order customers (count(o_orderkey) ignores the null rows), then
    // a second, tiny aggregation folds ~customer-count rows into an
    // order-count histogram. The priority filter lives on the orders side
    // BEFORE the join — equivalent to Q13's ON-clause predicate.
    "q13_customer_distribution" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count("o_orderkey").as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q17 shape: correlated scalar subquery, decorrelated by hand
    // into a per-part average joined back to the fact. The brand filter
    // semi-reduces lineitem BEFORE the per-part aggregate (Q17's classic
    // optimization), and both the part list and the tiny avg relation
    // broadcast — the fact table never shuffles. Quantities are
    // integer-valued doubles, so avg = exact-int-sum / count is
    // order-independent and the 0.8·avg threshold is engine-stable.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val li = t(s, dir, "lineitem")
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val partAvg = li.groupBy("l_partkey")
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(broadcast(partAvg), Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.8) * col("avg_qty"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q18 shape: HAVING on a fact-side aggregate, then join the
    // survivors back to orders/customer. The heavy groupBy runs FIRST and
    // the > 180 filter collapses it to a handful of keys, so the two
    // dimension joins see only survivors (broadcast the aggregate, not
    // the fact).
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 180)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), round(col("total_qty"), 2).as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q19 shape: disjunctive predicate pushdown. The OR-of-ANDs
    // references both sides, but its single-table residues (brand ∈ {1,2,3},
    // size ≤ 15, quantity ∈ [1,30]) are pre-applied to each input so the
    // join sees only plausible rows; the full disjunction runs post-join.
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size").between(1, 15))
      val li = t(s, dir, "lineitem").filter(col("l_quantity").between(1, 30))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Window function: top order per customer (rank + deterministic tiebreak)
    "q_window_top_order" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // Running / analytic window: cumulative spend per customer over time
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("cum_spend", round(sum("o_totalprice").over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("cum_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Anti join: customers with no pending ('P') order (NOT EXISTS)
    "q_anti_no_orders" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")),

    // Semi join: customers with at least one open ('O') order (EXISTS)
    "q_semi_open_orders" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")),

    // Set op: users that both clicked and purchased (INTERSECT)
    "q_intersect_users" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "click").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    }),

    // Set op: user-days with a click but no purchase (EXCEPT)
    "q_except_users" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def userDays(typ: String) = ev.filter(col("event_type") === typ)
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .distinct()
      userDays("click").except(userDays("purchase")).orderBy("user_id", "day")
    }),

    // Semi-structured: JSON field extraction from the open props payload
    "q_props_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Same extraction through Spark 4 VARIANT (parse once, typed get) —
    // the open-schema storage type for the payload remainder
    "q_props_variant" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    // UNION ALL with provenance tag
    "q_union_all" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def tagged(typ: String) = ev.filter(col("event_type") === typ)
        .select(col("user_id"), lit(typ).as("src"))
      tagged("click").unionAll(tagged("purchase"))
        .groupBy("src").agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"))
        .orderBy("src")
    }),

    // Ranking-window suite: ntile / percent_rank / cume_dist over per-user
    // spend within each event type — the ranking family of §2.7 in one
    // exchange (the groupBy's hash partitioning feeds the window sort).
    // Per-user totals accumulate in DECIMAL(18,2) (values are 2-dp exact)
    // and the window orders by (total, user_id), so the ordering is unique
    // and every rank statistic is engine-deterministic — ordering by a
    // double sum would let an ulp of fold-order reorder near-ties.
    "q_window_rank_suite" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("tv"), col("user_id"))
      t(s, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).as("tv"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .groupBy("event_type", "quartile")
        .agg(count(lit(1)).as("n_users"),
          round(avg("pct"), 4).as("avg_pct_rank"),
          round(avg("cume"), 4).as("avg_cume_dist"),
          sum("tv").cast("double").as("quartile_value"))
        .orderBy("event_type", "quartile")
    }),

    // Percentiles: exact continuous-interpolation quantiles of value
    "q_percentiles" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy("event_type")),

    // EXACT global order statistics WITHOUT a global sort: iterative
    // histogram-refinement selection (Selection.kthSmallest — ≤5 scans
    // per statistic, 2^16 driver counters, range filter prunable by
    // parquet stats) — the exact-verifier tier next to the sketch
    // quantiles; q_percentiles' percentile() sorts per group in executor
    // memory, this never materializes an ordered relation anywhere.
    "q_exact_quantiles" -> ((s, dir) => {
      import s.implicits._
      // cached across the ≤3 refinement scans each statistic pays (the
      // 100 TB form instead reads the source per pass, range-pruned)
      val cents = t(s, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try
        graft.ops.Selection.quantiles(cents, "cents", Seq(25, 50, 75))
          .toDF("p", "k", "cents")
          .orderBy("p")
      finally { cents.unpersist(blocking = false); () }
    }),

    // Population-stability-index drift per event type: the ML-monitoring
    // metric next to q_ks_drift's KS statistic — the value distribution
    // of each type's SECOND time half scored against its first over 10
    // equal-width buckets of the per-type range, add-one smoothed
    // ((c+1)/(n+10), so empty buckets are defined and the contract is a
    // pure function both engines replay; PSI > 0.2 is the conventional
    // "investigate" line). One scan + bounded per-type bucket tables.
    "q_psi_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val rng = ev.groupBy("event_type").agg(
        min("value").as("vmin"), max("value").as("vmax"),
        min("us").as("tmin"), max("us").as("tmax"))
      val b = ev.join(broadcast(rng), "event_type")
        .withColumn("half",
          when(col("us") < col("tmin") + expr("(tmax - tmin) div 2"), lit("ref"))
            .otherwise(lit("cur")))
        .withColumn("bucket",
          when(col("vmax") === col("vmin"), lit(0L))
            .otherwise(least(lit(9L),
              floor((col("value") - col("vmin")) * lit(10.0) /
                (col("vmax") - col("vmin"))))))
      val cnt = b.groupBy("event_type", "half", "bucket").agg(count(lit(1)).as("c"))
      val n = b.groupBy("event_type", "half").agg(count(lit(1)).as("n"))
      val sp = rng.select(col("event_type"),
          explode(sequence(lit(0L), lit(9L))).as("bucket"))
        .withColumn("half", explode(array(lit("ref"), lit("cur"))))
      val fill = sp
        .join(cnt, Seq("event_type", "half", "bucket"), "left")
        .join(n, Seq("event_type", "half"), "left")
        .select(col("event_type"), col("bucket"), col("half"),
          ((coalesce(col("c"), lit(0L)) + 1) * lit(1.0) /
            (coalesce(col("n"), lit(0L)) + 10)).as("prop"))
      fill.filter(col("half") === "ref")
        .select(col("event_type"), col("bucket"), col("prop").as("p"))
        .join(fill.filter(col("half") === "cur")
          .select(col("event_type"), col("bucket"), col("prop").as("q")),
          Seq("event_type", "bucket"))
        .groupBy("event_type")
        .agg(round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6).as("psi"))
        .orderBy("event_type")
    }),

    // 2-D skyline (pareto frontier, Börzsönyi 2001): the parts no other
    // part beats on BOTH price (max) and size (min) — the trade-off
    // query no single ORDER BY expresses. One ordered pass over the
    // DISTINCT value pairs (running strict-prefix min), frontier
    // broadcast to the id-recovery join; the oracle states dominance
    // directly as NOT EXISTS.
    "q_skyline_parts" -> ((s, dir) =>
      graft.ops.Analytics.skyline2D(
          t(s, dir, "part").select("p_partkey", "p_retailprice", "p_size"),
          "p_retailprice", "p_size",
          // footer row count gates the small-input one-band path (the
          // banding ladder costs more than it shards below ~4M rows);
          // the frontier is band-invariant so the hash cannot change
          rows = graft.Tables.footerRowCount(dir, "part"))
        .select(col("p_partkey").as("part_id"),
          col("p_retailprice").as("price"),
          col("p_size").cast("long").as("size"))
        .orderBy(col("price").desc, col("size"), col("part_id"))),

    // Aggregate stats incl. distinct counts
    "q_event_stats" -> ((s, dir) =>
      t(s, dir, "events").agg(
        countDistinct("user_id").as("users"),
        countDistinct("event_type").as("types"),
        round(sum("value"), 2).as("total_value"),
        round(avg("value"), 4).as("avg_value"),
        count(lit(1)).as("n"))),

    // Daily rollup — event-time bucketing (the E2 pattern, relationally)
    "q_daily_rollup" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("event_type", "day")),

    // TPC-H Q8 shape (national market share): one nation's share of ASIA
    // consumer revenue for PROMO parts, by order year. The big fact joins
    // (lineitem ⋈ orders) shuffle on orderkey; part/supplier/customer/
    // nation/region are broadcast dims; the share is a conditional-sum /
    // sum over the same grouped scan — one shuffle, one agg.
    "q8_market_share" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cust_nationkey"))
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
      li.join(t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("cust_nationkey"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0.0))
            / sum(col("volume")), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q14 shape (promotion effect): share of one month's revenue
    // from PROMO parts — broadcast part dim, shipdate month pruned at the
    // scan, single conditional aggregate.
    "q14_promo_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("volume")).otherwise(0.0))
          / sum(col("volume")), 4).as("promo_revenue"))),

    // TPC-H Q22 shape (global sales opportunity): LAPSED customers with
    // above-average positive balance and no orders since 2000 — scalar-
    // subquery broadcast + left-anti join against the pruned order scan,
    // grouped by segment (the fixture has no phone country codes, so
    // mktsegment stands in for cntrycode; every custkey has SOME order in
    // this dense synthetic fixture, so the anti-join target is recency).
    "q22_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q2 shape (minimum-cost supplier): for each PROMO part, the
    // supplier(s) offering the lowest unit cost. The fixture has no
    // partsupp table, so the part×supplier offer relation is derived from
    // lineitem history (avg realized unit price). The reference SQL's
    // correlated `= (SELECT min(..) WHERE partkey = outer.partkey)` is
    // expressed as a window-min over the SAME partitioning the aggregate
    // just shuffled on — zero extra exchanges, vs the naive decorrelation
    // into a re-aggregate + self-join (two more shuffles at 100 TB).
    "q2_min_cost_supplier" -> ((s, dir) => {
      val wMin = Window.partitionBy("partkey")
      // exact accumulation: prices are 2-dp decimals and quantities are
      // integral, so summing DECIMAL(18,2)/BIGINT is order-independent,
      // and the raw IEEE quotient of the identical exact totals is
      // bit-deterministic everywhere. Deliberately NO round(): rounding a
      // double whose true value sits at a .xxx5 boundary diverges between
      // engines (Spark rounds the shortest decimal repr, DuckDB the
      // binary value — seen live on 60.82475 at sf0.01)
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
          sum(col("l_quantity").cast("long")).cast("double")).as("unit_cost"))
      ps.withColumn("min_cost", min("unit_cost").over(wMin))
        .filter(col("unit_cost") === col("min_cost"))
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")),
          col("partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("suppkey") === col("s_suppkey"))
        .select("p_partkey", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    }),

    // TPC-H Q9 shape (product-type profit): nation×year profit where cost
    // is proxied by 0.6×retailprice (no partsupp.ps_supplycost in the
    // fixture). Lineitem⋈orders is the only data-sized join; part (LIKE-
    // filtered), supplier, nation all broadcast.
    "q9_product_profit" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        // per-row profit is EXACT in decimal (2-dp prices × 2-dp discount,
        // integral quantity, 1-dp cost factor), so the sum is order-
        // independent — no round-boundary flips between engines
        .agg(sum(
          col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
            - lit(BigDecimal("0.6")).cast("decimal(18,1)")
              * col("p_retailprice").cast("decimal(18,2)")
              * col("l_quantity").cast("decimal(18,0)"))
          .cast("double").as("profit"))
        .orderBy("nation", "o_year")),

    // TPC-H Q11 shape (important stock): parts holding an outsized share
    // of total inventory value — scalar subquery in HAVING. The share test
    // is kept INTEGER-EXACT (qty*700 > total over BIGINT quantities) so the
    // boundary can't flip on summation order; the global total broadcasts.
    "q11_important_parts" -> ((s, dir) => {
      val pv = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type").isin("LARGE", "SMALL")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      pv.crossJoin(broadcast(pv.agg(sum("qty").as("total_qty"))))
        .filter(col("qty") * 700 > col("total_qty"))
        .select("partkey", "qty")
        .orderBy(col("qty").desc, col("partkey"))
    }),

    // TPC-H Q12 shape (shipping-mode priority split): ship-latency bucket
    // stands in for l_shipmode (the fixture carries no mode column).
    // Conditional counts after the one fact⋈fact join, year pruned at scan.
    "q12_latency_priority" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("ship_bucket",
          when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "FAST")
            .otherwise("SLOW"))
        .groupBy("ship_bucket")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("ship_bucket")),

    // TPC-H Q15 shape (top supplier): quarterly revenue view, pick the
    // supplier(s) matching the global max — scalar subquery over the view.
    // The view is computed ONCE (Spark reuses the exchange under AQE); the
    // max broadcasts.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("suppkey"))
        // exact scale-4 decimal revenue: order-independent sum, and the
        // `= max` scalar comparison can never flip on partitioning
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("total_revenue"))
      rev.crossJoin(broadcast(rev.agg(max("total_revenue").as("max_rev"))))
        .filter(col("total_revenue") === col("max_rev"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape (supplier-part counts): distinct suppliers per
    // (brand, type, size) excluding a complaint list — NOT IN over a
    // non-null key set, which decorrelates to a broadcast left-anti join
    // (the complaint list is tiny; never a shuffle).
    "q16_supplier_part_counts" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 7, 14, 23, 36, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))),

    // TPC-H Q20 shape (excess inventory): suppliers holding an outsized
    // share of some PROMO part's shipped volume. The correlated per-part
    // total is a window-sum over the aggregate's own partitioning (no
    // second shuffle); the share test is integer-exact (q*6 > total).
    "q20_excess_suppliers" -> ((s, dir) => {
      val wPart = Window.partitionBy("pk")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .withColumn("part_total", sum("q").over(wPart))
        .filter(col("q") * 6 > col("part_total"))
        .select("sk").distinct()
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("sk") === col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): multi-supplier
    // orders where EXACTLY ONE supplier shipped late (>60 days after order
    // date; the fixture has no commit/receipt dates). The reference SQL's
    // EXISTS + NOT EXISTS pair is reformulated as per-order window counts
    // over the (order, supplier) aggregate — one shuffle replaces two
    // self-joins, the decisive rewrite at 100 TB where lineitem self-joins
    // dominate the plan.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val wOrd = Window.partitionBy("ok")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, 1)
          .otherwise(0)).as("late"))
        .withColumn("n_supp", count(lit(1)).over(wOrd))
        .withColumn("n_late", sum("late").over(wOrd))
        .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("sk") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // Incremental MV maintenance: the daily rollup maintained by MERGING
    // mergeable partials (standing MV + a late-arriving delta slice)
    // instead of rescanning history — proven equal to the full recompute
    // the oracle runs. The delta (event_id % 5 == 0) deliberately touches
    // EVERY day, the hard case where naive "reprocess recent partitions"
    // maintenance silently misses late rows.
    "q_incremental_rollup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val mv = graft.ops.Incremental.partialDaily(ev.filter(col("event_id") % 5 =!= 0))
      val delta = graft.ops.Incremental.partialDaily(ev.filter(col("event_id") % 5 === 0))
      graft.ops.Incremental.merge(mv, delta)
        .select(col("event_type"), col("day"), col("n"),
          round(col("sv"), 2).as("total_value"),
          round(col("mn"), 4).as("min_value"),
          round(col("mx"), 4).as("max_value"),
          // derive avg from the ROUNDED sum: the raw partial-sum total can
          // differ from the oracle's fold order by an ulp, and an ulp at a
          // round-boundary flips the 4th decimal — rounding first pins both
          // engines to the identical dividend
          round(round(col("sv"), 2) / col("n"), 4).as("avg_value"))
        .orderBy("event_type", "day")
    }),

    // Incremental JOIN-view maintenance: the nation-revenue MV is kept
    // current by joining ONLY the delta slice of orders against the dims
    // and merging the partial aggregates — ΔMV = agg(Δorders ⋈ dims),
    // never re-joining history (one-sided delta maintenance: the dims are
    // slowly-changing and versioned separately via SCD2). The delta
    // (o_orderkey % 4 == 0) spans all nations and dates — the oracle is
    // the full recompute.
    "q_incremental_join" -> ((s, dir) => {
      def partial(orders: DataFrame) = orders
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"), sum("o_totalprice").as("sv"))
      val orders = t(s, dir, "orders")
      val mv = partial(orders.filter(col("o_orderkey") % 4 =!= 0))
      val delta = partial(orders.filter(col("o_orderkey") % 4 === 0))
      mv.unionByName(delta).groupBy("n_name")
        .agg(sum("n").as("n_orders"), round(sum("sv"), 2).as("total_price"))
        .orderBy("n_name")
    }),

    // Incremental MV over a SKETCH column — the proof that the engine's
    // sketch family is mergeable state, not just a query-time aggregate:
    // a per-day KMV distinct-users MV is maintained by folding each
    // ingest slice's partial sketch in at O(|MV| + k) — explode + re-take
    // the k smallest hashes IS kmvMerge as an aggregate — with history
    // never rescanned. k=512: the sf0.01 oracle (exact distinct recompute)
    // sits below k so the estimate is exact; at sf0.1 (max 1356 users/day)
    // the estimator path engages in the bench.
    "q_incremental_sketch" -> ((s, dir) => {
      import graft.functions.KMinStrings.kmin_strings
      val k = 512
      val ev = t(s, dir, "events")
      def partial(slice: DataFrame) = slice
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(graft.ops.Sketch.kmvSketch(col("user_id"), k).as("kmv"))
      // three ingest slices: the standing MV + two later deltas
      val parts = Seq(0, 1, 2).map(i => partial(ev.filter(col("event_id") % 3 === i)))
      parts.reduce(_ unionByName _)
        .select(col("day"), explode(col("kmv")).as("h"))
        .groupBy("day")
        .agg(kmin_strings(col("h"), k).as("kmv"))
        .select(col("day"),
          round(graft.ops.Sketch.kmvEstimate(col("kmv"), k), 2).as("est_users"))
        .orderBy("day")
    }),

    // Join-cardinality pre-flight: the exact output size of the events
    // user_id self-join (the q_interval_join shape) computed WITHOUT
    // executing the join — sum over keys of c(k)^2 from one
    // map-side-combined count. At 100 TB this O(|input|) aggregation is
    // what you run BEFORE a potentially-quadratic join: `amplification`
    // says whether to proceed, `max_key_rows` says which keys need
    // salting first.
    "q_join_cardinality" -> ((s, dir) => {
      val c = t(s, dir, "events")
        .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("c"))
      c.agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          sum(col("c") * col("c")).as("selfjoin_rows"),
          max(col("c") * col("c")).as("max_key_rows"))
        .withColumn("amplification",
          round(col("selfjoin_rows").cast("double") / col("n_rows").cast("double"), 4))
    }),

    // As-of join: each event matched to the user's latest prior order
    // (union + single-shuffle window scan — no range cross join)
    "q_asof_last_order" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
      // one row per (cust, date): greatest orderkey wins, so the as-of
      // match is deterministic on both engines
      val orders = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("o_orderkey"))
      graft.ops.AsOf.join(ev, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightCols = Seq("o_orderkey"))
        .select(col("event_id"), col("asof_o_orderkey").as("last_orderkey"))
        .orderBy("event_id")
    }),

    // Interval (range) join via tolerance-width time bins — no range
    // cross join: clicks within ±10 min of each error, per user
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cuser"), col("ts").as("cts"))
      graft.ops.IntervalJoin.within(errors, clicks,
          "user_id", "cuser", "ts", "cts", toleranceMs = 10 * 60 * 1000L)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_nearby_clicks"))
        .orderBy("event_id")
    }),

    // Hierarchical aggregation: ROLLUP over returnflag/linestatus
    "q_rollup_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")),

    // Outer join with zero-preservation: order counts per customer
    // including customers with none
    "q_left_join_counts" -> ((s, dir) => {
      val counts = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "P")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      t(s, dir, "customer")
        .join(counts, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_pending"))
        .orderBy("c_custkey")
    }),

    // Scalar string functions: substr/upper/replace/length/like
    "q_string_funcs" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type").like("%PROMO%") || col("p_type").like("%ECONOMY%"))
        .select(
          col("p_partkey"),
          upper(substring(col("p_type"), 1, 8)).as("type_prefix"),
          length(regexp_replace(col("p_name"), " ", "")).cast("long").as("name_len"),
          concat_ws("/", col("p_brand"), col("p_size")).as("brand_size"))
        .orderBy("p_partkey")),

    // Date arithmetic: ship latency in days per order priority
    "q_ship_latency" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("lat"))
        .groupBy("o_orderpriority")
        .agg(round(avg("lat"), 4).as("avg_days"),
          max("lat").cast("long").as("max_days"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // CUBE: all grouping combinations in one pass
    "q_cube_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")),

    // Correlated aggregate: orders above their customer's average price.
    // A window over o_custkey, NOT a broadcast join against the per-customer
    // aggregate: that build side grows with |customers| (~15M at 100×) and
    // would OOM the broadcast; the window is one shuffle on the same key.
    "q_above_avg_orders" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
      t(s, dir, "orders")
        .withColumn("avg_price", avg("o_totalprice").over(w))
        .filter(col("o_totalprice") > col("avg_price"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_above"),
          round(max("o_totalprice"), 2).as("max_price"))
        .orderBy("o_custkey")
    }),

    // PIVOT: status rows × priority columns in one pass (explicit value
    // list so Catalyst skips the extra distinct-values job a dynamic
    // pivot needs — the right call when columns are known, at any scale)
    "q_pivot_priority" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          // absent combinations pivot to null; the relational contract
          // (and the oracle's count FILTER) says 0
          coalesce(col("`1-URGENT`"), lit(0L)).as("p1_urgent"),
          coalesce(col("`2-HIGH`"), lit(0L)).as("p2_high"),
          coalesce(col("`3-MEDIUM`"), lit(0L)).as("p3_medium"),
          coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p4_not_specified"),
          coalesce(col("`5-LOW`"), lit(0L)).as("p5_low"))
        .orderBy("o_orderstatus")),

    // UNPIVOT (melt): wide measure columns → long (metric, value) rows —
    // one Expand node, no join, no shuffle beyond the final aggregation
    "q_unpivot_measures" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .groupBy("metric")
        .agg(round(sum("val"), 2).as("total"), count(lit(1)).as("n"))
        .orderBy("metric")),

    // Sketch aggregates: HyperLogLog distinct estimates. The HLL++ state
    // is engine-opaque, so instead of emitting the raw estimate the query
    // emits a MACHINE-CHECKED verdict: the exact counts plus bound flags
    // |est/exact − 1| <= 3·rsd (rsd = 0.05, Spark's documented default).
    // The DuckDB oracle reproduces the exact counts and literal TRUE
    // flags — a drifting estimator flips a flag and fails the hash match,
    // so the last formerly-unoracled row now carries a checkable bound.
    "q_approx_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.agg(
          approx_count_distinct("user_id").as("au"),
          approx_count_distinct("event_type").as("at"),
          countDistinct(col("user_id")).as("n_users_exact"),
          countDistinct(col("event_type")).as("n_types_exact"))
        .select(col("n_users_exact"), col("n_types_exact"),
          (abs(col("au") / col("n_users_exact").cast("double") - 1.0) <= 0.15)
            .as("users_bounded"),
          (abs(col("at") / col("n_types_exact").cast("double") - 1.0) <= 0.15)
            .as("types_bounded"))
    }),

    // KMV distinct sketch: the PORTABLE approximate-distinct — unlike the
    // HLL above, the md5-hashed k-minimum-values state is reproducible in
    // DuckDB, so the ESTIMATE itself is oracle-checked bit-for-bit.
    // Exact countDistinct alongside shows the estimator's error live.
    // NB: the exact count is a SEPARATE aggregation joined on the (tiny)
    // group key — countDistinct in the same agg makes Spark pre-aggregate
    // by (group, value), shipping one sketch buffer per distinct value
    // across the first exchange and defeating the ≤k-per-group bound.
    "q_kmv_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sketch = ev.groupBy("event_type")
        .agg(graft.ops.Sketch.kmvSketch(col("user_id"), 64).as("arr"))
        .select(col("event_type"),
          round(graft.ops.Sketch.kmvEstimate(col("arr"), 64), 2).as("kmv_users"))
      val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
      sketch.join(exact, "event_type")
        .select("event_type", "n_exact", "kmv_users")
        .orderBy("event_type")
    }),

    // HyperLogLog distinct-count estimates (Flajolet 2007) next to the
    // KMV row: 64 max-rank registers per group — CONSTANT state at any
    // cardinality (KMV ships k hashes; HLL ships 64 bytes) — exact
    // integer register algebra, estimate replayed bit-for-bit by the
    // oracle (register sum carried as Σ 2^(63−M_j) integers; only the
    // final divide / linear-counting branch is double). Exact distinct
    // joined alongside to show the estimator's error live (separate
    // aggregation — same reasoning as q_kmv_distinct's NB).
    "q_hll_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sketch = graft.ops.Sketch.hllDistinct(ev, "event_type", "user_id", "users")
      val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
      sketch.join(exact, "event_type")
        .select("event_type", "n_exact", "hll_users")
        .orderBy("event_type")
    }),

    // HLL MERGEABILITY — the property that makes the sketch the 100-TB
    // distinct counter: per-(type, day) register tables max-merged up to
    // type level land on the BIT-IDENTICAL estimate as the direct
    // type-level sketch (registers are an idempotent max-semilattice;
    // the estimate is a pure function of them). The oracle replays both
    // paths independently; the hash witnesses merged == direct.
    "q_hll_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      val perDay = graft.ops.Sketch.hllRegisters(
        ev, Seq("event_type", "day"), "user_id")
      val merged = perDay.groupBy("event_type", "j").agg(max("mj").as("mj"))
      graft.ops.Sketch.hllEstimate(merged, "event_type", "merged")
        .join(graft.ops.Sketch.hllDistinct(ev, "event_type", "user_id", "direct"),
          "event_type")
        .select("event_type", "hll_merged", "hll_direct")
        .orderBy("event_type")
    }),

    // Count-Min sketch heavy-hitter estimates: one fixed 4×256 counter
    // array summarizes ALL user frequencies (memory independent of key
    // cardinality — the sketch for 100 TB of events is the same 8 KiB),
    // then the exact top-20 keys are point-queried against it. The md5
    // bucket hash makes every counter — and so every ESTIMATE — portable;
    // overcount ≥ 0 is the CMS guarantee, checked live in the output.
    // The exact groupBy exists only to pick candidates and show error;
    // the sketch side is one map-side-combined aggregation.
    "q_cms_topk" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id").cast("string").as("v"))
      val sk = ev.agg(graft.ops.Sketch.cmsSketch(col("v"), 4, 256).as("sk"))
      val exact = ev.groupBy("v").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("v").cast("long")).limit(20)
      exact.crossJoin(broadcast(sk))
        .select(col("v").cast("long").as("user_id"), col("exact_n"),
          graft.ops.Sketch.cmsEstimate(col("sk"), col("v"), 4, 256).as("cms_est"))
        .withColumn("overcount", col("cms_est") - col("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id"))
    }),

    // CMS merge algebra, proven live: per-type sketches combined by
    // element-wise addition must equal the single-pass global sketch on
    // every one of the 4×256 counters — the property that lets per-day /
    // per-partition sketches compose without rescanning data (the same
    // reason pre-aggregated rollups work). Output is the cell-equality
    // census; 1024/1024 equal is the algebra holding.
    "q_cms_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id").cast("string").as("v"))
      val merged = ev.groupBy("event_type")
        .agg(graft.ops.Sketch.cmsSketch(col("v"), 4, 256).as("sk"))
        .select(posexplode(col("sk")).as(Seq("i", "c")))
        .groupBy("i").agg(sum("c").as("mc"))
      val global = ev.agg(graft.ops.Sketch.cmsSketch(col("v"), 4, 256).as("sk"))
        .select(posexplode(col("sk")).as(Seq("i", "c")))
        .withColumnRenamed("c", "gc")
      merged.join(global, "i")
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("mc") === col("gc"), 1L).otherwise(0L)).as("n_equal"),
          sum("mc").as("merged_mass"), sum("gc").as("global_mass"))
    }),

    // Hopping (sliding) event-time window: 1-hour windows every 15 min —
    // each event lands in exactly 4 overlapping windows (native window()
    // with slide; completes tumbling/session/sliding parity)
    "q_hopping_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"))
        .orderBy("window_start", "event_type")),

    // Session path mining: 30-min-gap sessions -> ordered journey string
    // -> top journeys. The path builds from a per-session sorted
    // collect_list (bounded by session length), counts shuffle on the
    // path string.
    "q_session_paths" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(desc("n_sessions"), col("path")).limit(15)
    }),

    // Snapshot diff: change-data-feed between two dimension versions
    // (inserted / deleted / changed with old+new values) via one
    // full-outer equi-join — the no-CDC-log audit primitive
    "q_snapshot_diff" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val oldV = c.select(col("c_custkey").as("cust_id"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"))
      val newV = c
        .filter(col("c_custkey") % 11 =!= 0) // deletions
        .select(col("c_custkey").as("cust_id"),
          when(col("c_custkey") % 7 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("segment"),
          col("c_acctbal").as("acctbal"))
        .unionByName(c.filter(col("c_custkey") % 13 === 0) // insertions
          .select((col("c_custkey") + 1000000L).as("cust_id"),
            lit("NEWSEG").as("segment"), col("c_acctbal").as("acctbal")))
      graft.ops.Diff.snapshotDiff(oldV, newV, "cust_id", Seq("segment", "acctbal"))
        .orderBy("cust_id")
    }),

    // Top-k per group WITHOUT a window sort: the k-bounded heap aggregate
    // ships ≤3 candidates per group per partition (map-side combine) —
    // the row_number()-window equivalent shuffles every row to its
    // group's reducer and sorts there
    "q_top_customers" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(graft.functions.TopKByScore.topk_by_score(
          struct(col("c_acctbal"), col("c_custkey")), 3).as("top"))
        .select(col("c_nationkey"), posexplode(col("top")))
        .select(col("c_nationkey"), (col("pos") + 1).as("rank"),
          col("col.id").as("c_custkey"), col("col.score").as("acctbal"))
        .orderBy("c_nationkey", "rank")),

    // Equi-depth binning: global quartile boundaries from the
    // deterministic k-min-hash sample (portable order statistics, no
    // engine-opaque percentile sketch), broadcast to a shuffle-free
    // bucket ladder — the feature-bucketizer primitive
    "q_value_buckets" -> ((s, dir) => {
      import graft.ops.Sketch
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val bounds = ev
        .agg(Sketch.hashSample(col("event_id"), col("value"), 1024).as("smp"))
        .select(Sketch.sampleQuantile(col("smp"), 0.25).as("q1"),
          Sketch.sampleQuantile(col("smp"), 0.5).as("q2"),
          Sketch.sampleQuantile(col("smp"), 0.75).as("q3"))
      ev.crossJoin(broadcast(bounds))
        .withColumn("bucket", when(col("value") <= col("q1"), 0)
          .when(col("value") <= col("q2"), 1)
          .when(col("value") <= col("q3"), 2).otherwise(3))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
        .orderBy("bucket")
    }),

    // Robust anomaly detection: per-type Tukey fences (q3 ± 1.5·IQR) from
    // the deterministic sample — no sums/stddev, so the flag comparison
    // is bit-identical in any engine; fences broadcast, one scan recount
    "q_value_outliers" -> ((s, dir) => {
      import graft.ops.Sketch
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val fences = ev.groupBy("event_type")
        .agg(Sketch.hashSample(col("event_id"), col("value"), 512).as("smp"))
        .select(col("event_type"),
          Sketch.sampleQuantile(col("smp"), 0.25).as("q1"),
          Sketch.sampleQuantile(col("smp"), 0.75).as("q3"))
        .withColumn("hi_fence", col("q3") + lit(1.5) * (col("q3") - col("q1")))
        .withColumn("lo_fence", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      ev.join(broadcast(fences), "event_type")
        .withColumn("is_out",
          col("value") > col("hi_fence") || col("value") < col("lo_fence"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
          max(when(col("is_out"), col("value"))).as("max_outlier"))
        .orderBy("event_type")
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent view/click within 7 days — the as-of join (one union-scan
    // window pass, no range cross join) plus an attribution-window filter
    // Multi-touch LINEAR attribution: every touch within the 7-day window
    // gets an equal share of the purchase. One user-key equi-join (work
    // bounded per user), touch count via a purchase-key window, and the
    // per-touch share in integer MICRO-UNITS (floor(value·1e6/n)) so the
    // channel sums are exact integers — layout/engine-invariant by
    // construction, no float-reduction-order surface.
    "q_attribution_linear" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("t_ts"), col("event_type").as("touch"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"), col("value"))
      purchases.join(touches, Seq("user_id"))
        .where(col("t_ts") <= col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
        .withColumn("n_t", count(lit(1)).over(Window.partitionBy("event_id")))
        .groupBy(col("touch").as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(floor(col("value") * lit(1000000.0) / col("n_t")).cast("long"))
            .as("rev_micro"))
        .orderBy("channel")
    }),

    "q_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts").agg(max("event_type").as("touch"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      graft.ops.AsOf.join(purchases, touches,
          "user_id", "user_id", "ts", "ts", Seq("touch", "ts"))
        .withColumn("channel",
          when(col("asof_ts").isNotNull &&
              col("asof_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
            col("asof_touch")).otherwise(lit("none")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 2).as("revenue"))
        .orderBy("channel")
    }),

    // Z-order layout diagnostic: Morton-interleave (o_custkey, order-day)
    // and cut the z-ordering into 16 range buckets — per-bucket min/max of
    // BOTH dims shows each bucket is a bounding box (a linear sort would
    // leave one dim spanning its full range in every bucket, skipping
    // nothing). Bucket boundaries are order statistics of the
    // deterministic k-min-hash z-value sample (the q_value_buckets
    // ladder) broadcast to a shuffle-free bucket expression — NO global
    // rank of the fact table (ntile over all orders was a one-task sort;
    // equi-depth-by-sample is the layout write path's own contract,
    // Layout.zOrdered range-partitions by the same z). Oracle replays the
    // identical sample, boundaries and bucket ladder.
    "q_zorder_buckets" -> ((s, dir) => {
      val d = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("dday"))
      val withZ = d.withColumn("zv",
        graft.ops.Layout.zValue2(col("o_custkey"), col("dday")))
      import graft.ops.Sketch
      val bounds = withZ
        .agg(Sketch.hashSample(col("o_orderkey"), col("zv"), 1024).as("smp"))
        .select(array((1 until 16).map(i =>
          Sketch.sampleQuantile(col("smp"), i / 16.0)): _*).as("bl"))
      withZ.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          (size(filter(col("bl"), b => b < col("zv").cast("double"))) + 1)
            .cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"),
          min("dday").as("min_day"), max("dday").as("max_day"))
        .orderBy("bucket")
    }),

    // Rolling event-time window: per-event trailing-hour count and sum
    // via a RANGE frame on integer microseconds (value-based frame, so
    // peers with equal timestamps aggregate identically in any engine)
    "q_rolling_hour" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", round(sum("value").over(w), 4))
        .select("event_id", "event_type", "n_1h", "sum_1h")
        .orderBy("event_id")
    }),

    // Market-basket affinity: top part pairs by co-occurrence across
    // orders with lift — pair explode bounded by the contractual
    // maxBasket=1024 cap (oracle-mirrored; hub baskets excluded before
    // the quadratic term), top-20 via TakeOrderedAndProject (bounded
    // heap, no global sort materialization)
    "q_basket_pairs" -> ((s, dir) =>
      graft.ops.Affinity.coOccurrence(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2L, maxBasket = 1024)
        .orderBy(desc("n_ab"), col("item_a"), col("item_b"))
        .limit(20)),

    // Item-based collaborative filtering (Sarwar 2001): top-5 cosine
    // neighbours per item over the binary order-item incidence matrix —
    // "customers who bought X also bought". Pair generation basket-local
    // (Σ basket², maxBasket=1024-capped, cap oracle-mirrored), degree
    // joins plain equi-joins (item-cardinality tables are never
    // broadcast), top-k per item via the bounded-heap aggregate; integer
    // score inputs → oracle replays ranks and scores bit-for-bit.
    "q_item_similarity" -> ((s, dir) =>
      graft.ops.Affinity.itemSimilarity(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", k = 5, minSupport = 2L, maxBasket = 1024)
        .orderBy(col("item"), col("rank"))
        .limit(500)),

    // Bucketed co-located join: both sides written ONCE as 8-bucket
    // hash-bucketed tables on the order key, then sort-merge-joined with
    // NO join-side Exchange (the scan's bucketing satisfies the required
    // HashPartitioning — plan-guarded in LayoutSpec). The write-amortized
    // layout that deletes the dominant shuffle from every recurring
    // fact-to-fact join at 100 TB; result provably identical to the
    // plain join (same oracle SQL).
    // Partition pruning — the third leg of the layout story next to
    // Z-order (q_zorder_buckets) and bucketing (q_bucketed_join): events
    // written once partitioned by day (write-once-read-many, keyed by
    // source dir like the bucketed tables), then a one-week query reads
    // ONLY those directories — `PartitionFilters` in the scan, 23 of 30
    // day partitions never opened (plan-guarded). At 100 TB this is the
    // difference between scanning a week and scanning three years.
    "q_partition_prune" -> ((s, dir) => {
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val path = s"/tmp/graft_part_events_$tag"
      if (!new java.io.File(path).exists())
        graft.Tables.events(s, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("day").parquet(path)
      s.read.parquet(path)
        .filter(col("day") >= lit("2024-01-10") && col("day") < lit("2024-01-17"))
        .groupBy(col("day").cast("string").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("day", "event_type")
    }),

    "q_bucketed_join" -> ((s, dir) => {
      import graft.ops.Layout
      // write-once-read-many: the bucketed layout is amortized across
      // every downstream join, so repeated runs in one session reuse the
      // tables (names keyed by source dir; a fresh session rewrites)
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val liT = s"graft_b_lineitem_$tag"
      val orT = s"graft_b_orders_$tag"
      if (!s.catalog.tableExists(liT))
        Layout.writeBucketed(t(s, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          liT, "l_orderkey", 8)
      if (!s.catalog.tableExists(orT))
        Layout.writeBucketed(t(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority"),
          orT, "o_orderkey", 8)
      s.table(liT).hint("merge")
        .join(s.table(orT),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // Weighted PageRank over the part co-purchase graph (5 synchronous
    // rounds, damping 0.85) — the iterative Pregel-style pattern: edges
    // materialize once, each round is one join + one re-aggregate on node
    // keys. Exact integer fixed-point (1e-12 mass units) makes the
    // iterated sums associative, hence layout-invariant AND oracle-able
    // bit-for-bit — no floating-point reduction-order leak.
    "q_pagerank" -> ((s, dir) => {
      import graft.ops.Graph
      // support >= 2: a pair must co-occur in two baskets to be an edge —
      // single-coincidence pairs are noise for link analysis AND ~300x
      // the edge count (1.2M -> 3.6k at sf0.1)
      val pairs = copurchasePairs(s, dir)
      val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"),
          col("n_ab").as("w"))
        .union(pairs.select(col("item_b"), col("item_a"), col("n_ab")))
      graphResult(s) {
        Graph.pageRank(edges, "src", "dst", "w", iters = 5)
          .select(col("id").as("part_id"), col("pr").as("rank_fp"))
          .orderBy(col("rank_fp").desc, col("part_id"))
          .limit(50)
      }
    }),

    // Personalized (topic-sensitive) PageRank: teleport mass restricted
    // to a seed set (every 20th item) — "items related to THIS topic" on
    // the symmetric co-purchase graph. Same integer fixed point as
    // q_pagerank; the oracle unrolls the seeded recurrence.
    "q_pagerank_topic" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir)
      val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"),
          col("n_ab").as("w"))
        .union(pairs.select(col("item_b"), col("item_a"), col("n_ab")))
      val seeds = t(s, dir, "part")
        .select(col("p_partkey").as("id")).filter(col("id") % 20 === 0)
      graphResult(s) {
        Graph.personalizedPageRank(edges, "src", "dst", "w", seeds, "id", iters = 5)
          .select(col("id").as("part_id"), col("pr").as("rank_fp"))
          .orderBy(col("rank_fp").desc, col("part_id"))
          .limit(50)
      }
    }),

    // HITS hubs & authorities (Kleinberg 1999) on the BIPARTITE
    // customer→part purchase graph — the one link-analysis shape PageRank
    // doesn't cover: two mutually-recursive scores (good buyers point at
    // good parts, good parts are bought by good buyers). Exact 1e-12
    // integer fixed point with per-round L1 normalization in 128-bit
    // intermediates; the oracle unrolls the identical recurrence in
    // HUGEINT. Result: top 25 authorities (parts) + top 25 hubs
    // (customers) by score.
    "q_hits" -> ((s, dir) => {
      import graft.ops.Graph
      // once-per-(session, dir) edge MV, like copurchasePairs: the
      // orders⋈lineitem distinct is shared scaffolding, not the operator
      val e = purchaseEdgesCache.getOrElseUpdate(dir, {
        t(s, dir, "orders")
          .select(col("o_custkey").as("src"), col("o_orderkey").as("ok"))
          .join(t(s, dir, "lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("dst")), "ok")
          .filter(col("src").isNotNull && col("dst").isNotNull)
          .select("src", "dst").distinct()
          .localCheckpoint(eager = true)
      })
      graphResult(s) {
        val r = Graph.hits(e, "src", "dst", iters = 3)
        val auth = r
          .select(lit("authority").as("role"), col("id"),
            col("auth_fp").as("score_fp"))
          .orderBy(col("score_fp").desc, col("id")).limit(25)
        val hub = r
          .select(lit("hub").as("role"), col("id"),
            col("hub_fp").as("score_fp"))
          .orderBy(col("score_fp").desc, col("id")).limit(25)
        // explicit final sort: the oracle's ORDER BY (role, score DESC,
        // id) must not ride on union/coalesce partition-order accidents
        auth.union(hub)
          .orderBy(col("role"), col("score_fp").desc, col("id"))
      }
    }),

    // Multi-source shortest paths (synchronous Bellman–Ford rounds) on
    // the co-purchase graph with affinity distance w = 1e6 div n_ab
    // (strongly co-purchased items are CLOSE): exact distance from every
    // part to its nearest "hub" seed (every 500th part) within 6 hops —
    // the graph-proximity feature for recommendations/segmentation. The
    // round chain references the distance relation once per round (union
    // before min, never a full-outer), so 6 rounds are one lazy
    // linear-lineage plan; oracle unrolls the identical min-plus
    // recurrence.
    "q_shortest_paths" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir)
      val w = expr("1000000L div n_ab")
      val edges = pairs.select(col("item_a").as("src"),
          col("item_b").as("dst"), w.as("w"))
        .union(pairs.select(col("item_b"), col("item_a"), w))
      val seeds = t(s, dir, "part").select(col("p_partkey").as("id"))
        .filter(col("id") % 500 === 0)
      graphResult(s) {
        Graph.shortestPaths(edges, "src", "dst", "w", seeds, "id", rounds = 6)
          .select(col("id").as("part_id"), col("d").as("dist"))
          .orderBy(col("dist"), col("part_id"))
          .limit(100)
      }
    }),

    // Deterministic random-walk corpus (DeepWalk, Perozzi 2014) on the
    // co-purchase graph: 3 walks × 5 steps from every 500th part —
    // the graph → sequence-corpus step graph embeddings train on. Each
    // transition is argmin-md5 over the neighbours (A-ES applied to walk
    // steps), so the oracle replays every hop bit-for-bit; per step one
    // front⋈edges join + one argmin aggregate, rounds chained lazily.
    "q_random_walks" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir).select(col("item_a"), col("item_b"))
      val seeds = t(s, dir, "part").select(col("p_partkey").as("id"))
        .filter(col("id") % 500 === 0)
      graphResult(s) {
        Graph.randomWalks(pairs, "item_a", "item_b", seeds, "id",
            walksPerSeed = 3, steps = 5)
          .orderBy(col("seed"), col("walk"), col("step"))
      }
    }),

    // Label-propagation community detection (Raghavan 2007, made
    // deterministic: synchronous rounds, ties to the smallest label) on
    // the co-purchase graph — DENSITY classes inside the connectivity
    // classes q_components finds. 4 rounds; the oracle unrolls the
    // identical recurrence. Output: community census.
    "q_lpa_communities" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir).select(col("item_a"), col("item_b"))
      graphResult(s) {
        Graph.labelPropagation(pairs, "item_a", "item_b", iters = 4)
          .groupBy(col("l").as("community"))
          .agg(count(lit(1)).as("size"))
          .orderBy(col("size").desc, col("community"))
          .limit(50)
      }
    }),

    // Link prediction by the Resource-Allocation index (Zhou 2009) on the
    // co-purchase graph: for non-adjacent item pairs, Σ 1/deg(z) over
    // common neighbours z in 1e-12 integer fixed point — "items never yet
    // bought together that the graph says should be". Wedges through
    // super-hubs (deg > 1024) are excluded before the self-join (the
    // contract both engines share), bounding the enumeration at Σ deg²
    // over non-hub nodes.
    "q_link_predict" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir).select(col("item_a"), col("item_b"))
      graphResult(s) {
        Graph.linkPredictRA(pairs, "item_a", "item_b", maxDeg = 1024)
          .orderBy(col("ra_fp").desc, col("item_a"), col("item_b"))
          .limit(50)
      }
    }),

    // Link prediction by the Jaccard neighbourhood coefficient (Liben-
    // Nowell & Kleinberg 2003) on the same co-purchase graph — RA's
    // size-normalized sibling: n_common / (deg_x + deg_y − n_common) in
    // 1e-12 integer fixed point. Wedge enumeration shares RA's deg ≤ 1024
    // hub cap (contract, not approximation); denominator degrees are the
    // full neighbourhood sizes (node-sized relation, no quadratic term).
    "q_link_jaccard" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir).select(col("item_a"), col("item_b"))
      graphResult(s) {
        Graph.linkPredictJaccard(pairs, "item_a", "item_b", maxDeg = 1024)
          .orderBy(col("jac_fp").desc, col("item_a"), col("item_b"))
          .limit(50)
      }
    }),

    // PageRank on the DIRECTED (a<b) co-purchase edge list — a graph with
    // real dangling nodes (items appearing only as dst have no out-edges):
    // exercises the terminal-mass redistribution term that a total edge
    // list never does. Same 1e-12 integer fixed-point; oracle replays the
    // identical recurrence including the per-round dangling scalar.
    "q_pagerank_dangling" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir)
      graphResult(s) {
        // normalizeDirected is the dirty-edge front for the directed ops
        // (loops dropped, duplicate links weight-merged) — a no-op on the
        // already-aggregated co-purchase pairs, routed through anyway
        // because a real edge list arrives dirty (spec-proven idempotent)
        Graph.pageRank(
            Graph.normalizeDirected(
              pairs.select(col("item_a").as("src"), col("item_b").as("dst"),
                col("n_ab").as("w")), "src", "dst", "w"),
            "src", "dst", "w", iters = 5)
          .select(col("id").as("part_id"), col("pr").as("rank_fp"))
          .orderBy(col("rank_fp").desc, col("part_id"))
          .limit(50)
      }
    }),

    // Per-node triangle counts on the same support->=2 co-purchase graph —
    // the clustering-coefficient numerator. Degree-oriented wedge join
    // (Suri-Vassilvitskii): each triangle found exactly once at its
    // (degree, id)-minimal corner, out-degrees bounded O(sqrt(m)), so the
    // wedge set never explodes on hub nodes at 100 TB.
    "q_triangles" -> ((s, dir) => {
      import graft.ops.Graph
      // Graph.normalize is the dirty-edge-list front (drops loops/dups/
      // reversed copies); the co-purchase pairs are already canonical, so
      // it is a no-op here by idempotence (spec-proven) — routed through
      // anyway because a real edge list arrives dirty
      val pairs = Graph.normalize(
        copurchasePairs(s, dir).select("item_a", "item_b"), "item_a", "item_b")
      graphResult(s) {
        Graph.triangleCounts(pairs, "item_a", "item_b")
          .select(col("id").as("part_id"), col("n_tri"))
          .orderBy(col("n_tri").desc, col("part_id"))
          .limit(40)
      }
    }),

    // Local clustering coefficient (Watts-Strogatz 1998) on the
    // co-purchase graph: per-part neighbourhood density in 1e-12 integer
    // fixed point — spam-ring vs broadcast-hub separation at equal
    // degree. Triangles ride the degree-oriented enumeration (≤ m·√m
    // wedge work); the oracle enumerates a<b<c triangles directly.
    "q_local_clustering" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir).select(col("item_a"), col("item_b"))
      graphResult(s) {
        Graph.localClustering(pairs, "item_a", "item_b")
          .select(col("id").as("part_id"), col("deg"), col("n_tri"),
            col("cc_fp"))
          .orderBy(col("cc_fp").desc, col("part_id"))
          .limit(50)
      }
    }),

    // Bounded k-core peel (k=3, 3 synchronous rounds) on the same graph —
    // the dense-subgraph skeleton: per round, one degree agg + two node-key
    // semi-joins. Deterministic by fixed round count, so the oracle unrolls
    // the identical peel as CTEs.
    "q_kcore" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = Graph.normalize( // no-op on the clean fixture, see q_triangles
        copurchasePairs(s, dir).select("item_a", "item_b"), "item_a", "item_b")
      graphResult(s) {
        Graph.kCorePeel(pairs, "item_a", "item_b", k = 3, rounds = 3)
          .orderBy("round")
      }
    }),

    // 4-TRUSS peel (Cohen 2008) over the co-purchase graph — the
    // triangle-support core next to q_kcore's degree core: per round
    // every edge keeps iff it closes ≥ k−2 = 2 triangles among the
    // surviving edges. Fixed 4-round contract; the oracle unrolls the
    // identical support-join/filter rounds.
    "q_ktruss" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = Graph.normalize(
        copurchasePairs(s, dir).select("item_a", "item_b"), "item_a", "item_b")
      graphResult(s) {
        Graph.kTruss(pairs, "item_a", "item_b", k = 4, rounds = 4)
          .orderBy("round")
      }
    }),

    // k-core peel TO CONVERGENCE (k=3) — the exact fixed point, detected
    // by a per-round scalar edge count on the driver (the edge set shrinks
    // monotonically, so an unchanged count IS an unchanged set). Reports
    // (n_rounds, n_nodes, n_edges) where n_rounds is the first no-op
    // round; the oracle unrolls the peel far past the fixed point and
    // selects the first round whose count matches its predecessor.
    "q_kcore_converged" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = Graph.normalize( // no-op on the clean fixture, see q_triangles
        copurchasePairs(s, dir).select("item_a", "item_b"), "item_a", "item_b")
      graphResult(s)(Graph.kCoreConverged(pairs, "item_a", "item_b", k = 3))
    }),

    // Connected components on the same co-purchase graph — the
    // cluster-structure summary: every component labeled by its minimum
    // member id, reported as a component-size histogram. Since round 8
    // this runs the LOG-ROUND large-star/small-star contraction
    // (SoCC'14) — O(log n) phases on any graph shape, vs min-label
    // propagation's O(diameter) rounds (thousands on a crawl-chain at
    // 100 TB). The result is identical (both label components by their
    // minimum id — spec-proven equal, and the long-path phase bound is
    // spec-asserted); min-label stays as Graph.connectedComponents, the
    // oracle-replayable shape this DuckDB oracle unrolls.
    "q_components" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = Graph.normalize( // no-op on the clean fixture, see q_triangles
        copurchasePairs(s, dir).select("item_a", "item_b"), "item_a", "item_b")
      graphResult(s) {
        Graph.connectedComponentsStar(pairs, "item_a", "item_b")
          .orderBy("csize")
      }
    }),

    // INCREMENTAL component maintenance — the MV-delta pattern applied
    // to graph state: the co-purchase edge set is split 4:1 by a
    // deterministic md5 parity into a BASE (whose star-contraction
    // labeling is the materialized view) and an ARRIVAL batch; the batch
    // is applied through Graph.incrementalComponents — components of the
    // ≤|Δ|-edge LABEL graph, one join back — without re-traversing the
    // base edges. The oracle is the FULL-graph recompute (identical
    // histogram by the canonical-min-label composition argument,
    // spec-proven on merge/new-node/no-op shapes).
    "q_incremental_components" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = Graph.normalize(
        copurchasePairs(s, dir).select("item_a", "item_b"), "item_a", "item_b")
      graphResult(s) {
        val tagged = pairs.withColumn("slot",
          pmod(abs(xxhash64(col("item_a"), col("item_b"))), lit(5L)))
        val base = tagged.filter(col("slot") =!= 0L).select("item_a", "item_b")
        val delta = tagged.filter(col("slot") === 0L).select("item_a", "item_b")
        // base MV through the small-graph union-find gate (spec-proven
        // equal to the star labels) — this query measures the DELTA
        // algebra; q_components is the row that exercises the
        // distributed log-round contraction itself
        val mv = Graph.starComponentLabels(base, "item_a", "item_b",
          localMaxEdges = 65536)._1
        Graph.incrementalComponents(mv, "id", "l", delta, "item_a", "item_b")
          .groupBy("l").agg(count(lit(1)).as("csize"))
          .groupBy("csize").agg(count(lit(1)).as("n_components"))
          .orderBy("csize")
      }
    }),

    // PageRank run TO ITS EXACT INTEGER FIXED POINT on the symmetric
    // co-purchase graph: the detected stop (L1 delta 0 between check
    // windows of 16 batched rounds) replaces the hardcoded 5 iterations —
    // ~170 rounds to drain 1e12 fixed-point units at damping 0.85, but
    // only ~11 driver barriers thanks to the linear-lineage batching.
    // The oracle unrolls the identical recurrence past the fixed point
    // and selects the first check window with zero delta — bit-for-bit,
    // including n_iters.
    "q_pagerank_converged" -> ((s, dir) => {
      import graft.ops.Graph
      val pairs = copurchasePairs(s, dir)
      val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"),
          col("n_ab").as("w"))
        .union(pairs.select(col("item_b"), col("item_a"), col("n_ab")))
      graphResult(s) {
        Graph.pageRankConverged(edges, "src", "dst", "w")
          .select(col("id").as("part_id"), col("pr").as("rank_fp"), col("n_iters"))
          .orderBy(col("rank_fp").desc, col("part_id"))
          .limit(50)
      }
    }),

    // Time-series regularization: 15-min resample of event values per
    // type, gap-densified with a per-key spine, LOCF + linear interp
    "q_ts_resample" -> ((s, dir) =>
      graft.ops.TimeSeries.resample(t(s, dir, "events"),
          "event_type", "ts", "value", stepSeconds = 900L)
        .select(col("event_type"),
          date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
          col("v_obs"), col("v_locf"), col("v_interp"))
        .orderBy("event_type", "bucket_ts")),

    // RFM segmentation: per-user recency/frequency/monetary scored into
    // tertiles whose boundaries come from the deterministic sample
    // (portable — no engine percentile sketch), segment = "R{r}F{f}M{m}"
    "q_rfm_segments" -> ((s, dir) => {
      import graft.ops.Sketch
      val p = t(s, dir, "events").filter(col("event_type") === "purchase")
      val anchor = p.agg(max(unix_micros(col("ts"))).as("t_max"))
      val rfm = p.groupBy("user_id").agg(
          max(unix_micros(col("ts"))).as("t_last"),
          count(lit(1)).as("f"),
          round(sum("value"), 2).as("m"))
        .crossJoin(broadcast(anchor))
        .withColumn("r_days", expr("(t_max - t_last) div 86400000000"))
      val bounds = rfm.agg(
          Sketch.hashSample(col("user_id"), col("r_days").cast("double"), 512).as("rs"),
          Sketch.hashSample(col("user_id"), col("f").cast("double"), 512).as("fs"),
          Sketch.hashSample(col("user_id"), col("m"), 512).as("ms"))
        .select(
          Sketch.sampleQuantile(col("rs"), 1.0 / 3).as("r1"),
          Sketch.sampleQuantile(col("rs"), 2.0 / 3).as("r2"),
          Sketch.sampleQuantile(col("fs"), 1.0 / 3).as("f1"),
          Sketch.sampleQuantile(col("fs"), 2.0 / 3).as("f2"),
          Sketch.sampleQuantile(col("ms"), 1.0 / 3).as("m1"),
          Sketch.sampleQuantile(col("ms"), 2.0 / 3).as("m2"))
      def tertile(v: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
                  hi: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(v <= lo, 1).when(v <= hi, 2).otherwise(3)
      rfm.crossJoin(broadcast(bounds))
        .withColumn("segment", concat(
          lit("R"), tertile(col("r_days").cast("double"), col("r1"), col("r2")),
          lit("F"), tertile(col("f").cast("double"), col("f1"), col("f2")),
          lit("M"), tertile(col("m"), col("m1"), col("m2"))))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_users"), round(sum("m"), 2).as("revenue"))
        .orderBy("segment")
    }),

    // Rolling correlation of two metric series (clicks vs purchases per
    // 15-min bucket, trailing 24h): all window sums are exact integers —
    // the only floating point is the final Pearson formula, so the
    // 2.7k correlations reproduce bit-for-bit in any engine
    // Two-sample Kolmogorov-Smirnov drift statistic between the purchase
    // and click value distributions, quantized to cents so the support is
    // cardinality-bounded. The max deviation is computed on the INTEGER
    // numerator |cumA*nB − cumB*nA| (exact, layout-independent); the only
    // float op is the final division. The distribution-drift screen.
    "q_ks_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      val ca = ev.filter(col("event_type") === "purchase")
        .groupBy("c").agg(count(lit(1)).as("na"))
      val cb = ev.filter(col("event_type") === "click")
        .groupBy("c").agg(count(lit(1)).as("nb"))
      val u = ca.join(cb, Seq("c"), "full")
        .select(col("c"), coalesce(col("na"), lit(0L)).as("na"),
          coalesce(col("nb"), lit(0L)).as("nb"))
      val tot = u.agg(sum("na").as("ta"), sum("nb").as("tb"))
      val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
      u.withColumn("cuma", sum("na").over(w))
        .withColumn("cumb", sum("nb").over(w))
        .crossJoin(broadcast(tot))
        .agg(max(abs(col("cuma") * col("tb") - col("cumb") * col("ta")))
            .as("dnum"),
          max("ta").as("n_a"), max("tb").as("n_b"))
        .select(round(col("dnum").cast("double") / (col("n_a") * col("n_b")), 6)
          .as("ks_stat"), col("n_a"), col("n_b"))
    }),

    // Weekly seasonal decomposition of the daily count series: per
    // day-of-week mean (the seasonal component) and the worst
    // low/high residual each weekday ever saw vs its norm — the
    // calendar-seasonality profile behind every volume alert. Exact
    // integer sums; floats only in the final divisions.
    "q_seasonal_profile" -> ((s, dir) => {
      // daily is |days| rows but its lineage is the full events scan, and
      // it feeds BOTH the per-dow profile and the residual join — pin it
      // once so the corpus is scanned once, not twice (the 10×-rehearsal
      // ratio was 2.33× exactly because both passes rescaled)
      val daily = t(s, dir, "events")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
        .agg(count(lit(1)).as("x"))
        .withColumn("dow", expr("(d + 4) % 7")) // 1970-01-01 was a Thursday
        .localCheckpoint()
      val prof = daily.groupBy("dow")
        .agg(sum("x").as("sx"), count(lit(1)).as("nd"))
      daily.join(prof, "dow")
        .withColumn("expected", col("sx").cast("double") / col("nd"))
        .withColumn("resid_pct",
          (col("x") - col("expected")) / col("expected"))
        .groupBy("dow")
        .agg(max("nd").as("n_days"),
          round(max("expected"), 4).as("mean_count"),
          round(min("resid_pct"), 4).as("worst_low_pct"),
          round(max("resid_pct"), 4).as("worst_high_pct"))
        .orderBy("dow")
    }),

    // Sample autocorrelation of the daily event-count series at lags
    // 1..7 (the seasonality screen). The centred ACF is rearranged so
    // every term is an exact integer sum — r_k = (N²P_k − N·S·(Sh+St)
    // + (N−k)·S²) / (N·(N·Q − S²)) — layout-independent with one final
    // float division per lag.
    "q_autocorr" -> ((s, dir) => {
      // 1 base + 7 per-lag aggregates all re-derive daily; pin the |days|-
      // row aggregate once so events is scanned once, not 8 times
      val daily = t(s, dir, "events")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint()
      val w = Window.orderBy("d")
      val lagged = daily.select(
        (Seq(col("d"), col("x")) ++
          (1 to 7).map(k => lag(col("x"), k).over(w).as(s"x$k"))): _*)
      val base = lagged.agg(
        count(lit(1)).as("nn"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
      val perLag = (1 to 7).map { k =>
        lagged.filter(col(s"x$k").isNotNull).agg(
            sum(col("x") * col(s"x$k")).as("p"),
            sum(col(s"x$k")).as("sh"), // x_t for t=1..N-k (the lagged value)
            sum(col("x")).as("st"))    // x_{t+k}
          .select(lit(k).as("lag"), col("p"), col("sh"), col("st"))
      }.reduce(_.unionByName(_))
      perLag.crossJoin(broadcast(base))
        .select(col("lag"),
          round((col("nn") * col("nn") * col("p")
              - col("nn") * col("s") * (col("sh") + col("st"))
              + (col("nn") - col("lag")) * col("s") * col("s")).cast("double") /
            (col("nn") * (col("nn") * col("q") - col("s") * col("s"))).cast("double"),
            6).as("acf"))
        .orderBy("lag")
    }),

    // Candidate-key validation across tables (the profiling step that
    // decides dedup keys and join contracts): for each declared
    // candidate key, distinct-key count vs row count and how many rows
    // sit in violating groups. One hash-aggregate per table.
    "q_fd_check" -> ((s, dir) => {
      def check(df: DataFrame, table: String, keyName: String,
                key: Column*): DataFrame = {
        val g = df.groupBy(key: _*).agg(count(lit(1)).as("c"))
        g.agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
            sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_rows"))
          .select(lit(table).as("table_name"), lit(keyName).as("candidate_key"),
            col("n_rows"), col("n_keys"), col("n_dup_rows"),
            (col("n_keys") === col("n_rows")).as("is_key"))
      }
      check(t(s, dir, "events"), "events", "event_id", col("event_id"))
        .unionByName(check(t(s, dir, "events"), "events", "user_id,ts",
          col("user_id"), col("ts")))
        .unionByName(check(t(s, dir, "lineitem"), "lineitem",
          "l_orderkey,l_linenumber", col("l_orderkey"), col("l_linenumber")))
        .unionByName(check(t(s, dir, "orders"), "orders", "o_orderkey",
          col("o_orderkey")))
        .unionByName(check(t(s, dir, "documents"), "documents", "doc_id",
          col("doc_id")))
        .orderBy("table_name", "candidate_key")
    }),

    // Referential-integrity audit: orphan FK rows per declared
    // relationship via LEFT ANTI joins (the other half of the q_fd_check
    // contract audit). Anti joins shuffle on the FK only; parents with
    // broadcast-size keys broadcast.
    "q_ri_check" -> ((s, dir) => {
      def orphans(child: DataFrame, childName: String, fk: String,
                  parent: DataFrame, parentName: String, pk: String): DataFrame = {
        val n = child.join(parent, child(fk) === parent(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val tot = child.agg(count(lit(1)).as("n_child_rows"))
        n.crossJoin(tot).select(
          lit(s"$childName.$fk -> $parentName.$pk").as("relationship"),
          col("n_child_rows"), col("n_orphans"),
          (col("n_orphans") === 0L).as("intact"))
      }
      orphans(t(s, dir, "lineitem"), "lineitem", "l_orderkey",
          t(s, dir, "orders"), "orders", "o_orderkey")
        .unionByName(orphans(t(s, dir, "orders"), "orders", "o_custkey",
          t(s, dir, "customer"), "customer", "c_custkey"))
        .unionByName(orphans(t(s, dir, "customer"), "customer", "c_nationkey",
          t(s, dir, "nation"), "nation", "n_nationkey"))
        .unionByName(orphans(t(s, dir, "lineitem"), "lineitem", "l_partkey",
          t(s, dir, "part"), "part", "p_partkey"))
        .orderBy("relationship")
    }),

    // Order-independent table content digests — the cross-engine
    // migration/replication validation primitive: XOR of per-row md5
    // hashes over a CANONICAL projection (integers and md5(text), never
    // raw doubles or engine-formatted timestamps, whose string forms
    // differ across engines). XOR is commutative and overflow-free, so
    // the digest is one map-side-combined scan per table and identical
    // under any partitioning; paired with the row count it detects any
    // single-row difference (duplicate-pair blindness is XOR's known
    // trade, covered by n_rows).
    "q_table_digest" -> ((s, dir) => {
      def canon(cols: Column*): Column = concat_ws("|",
        cols.map(c => coalesce(c.cast("string"), lit("∅"))): _*)
      def digest(df: DataFrame, name: String, c: Column): DataFrame =
        df.select(conv(substring(md5(c.cast("binary")), 1, 15), 16, 10)
            .cast("long").as("h"))
          .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_digest"))
          .select(lit(name).as("table_name"), col("n_rows"), col("xor_digest"))
      digest(t(s, dir, "events"), "events", canon(
          col("event_id"), unix_micros(col("ts")), col("user_id"),
          col("event_type"), round(col("value") * 100).cast("long"), col("props")))
        .unionByName(digest(t(s, dir, "lineitem"), "lineitem", canon(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), round(col("l_quantity") * 100).cast("long"),
          round(col("l_extendedprice") * 100).cast("long"))))
        .unionByName(digest(t(s, dir, "documents"), "documents", canon(
          col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text").cast("binary")))))
        .orderBy("table_name")
    }),

    // Per-type linear trend (closed-form OLS over daily counts): every
    // sum is an exact INTEGER sum (x = epoch-day, y = count), so the
    // normal equations are layout-independent and portable; the only
    // float ops are the final divisions. Slope/day + r² per event type —
    // the drift screen over ingest volumes.
    "q_trend_fit" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("x"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("num", col("n_days") * col("sxy") - col("sx") * col("sy"))
        .withColumn("den", col("n_days") * col("sxx") - col("sx") * col("sx"))
        .withColumn("deny", col("n_days") * col("syy") - col("sy") * col("sy"))
        .select(col("event_type"), col("n_days"),
          round(col("num").cast("double") / nullif(col("den"), lit(0L)), 6).as("slope"),
          round((col("sy") - col("num").cast("double") / nullif(col("den"), lit(0L))
            * col("sx")) / col("n_days"), 4).as("intercept"),
          round(col("num").cast("double") * col("num").cast("double") /
            nullif(col("den").cast("double") * col("deny").cast("double"), lit(0.0)), 6)
            .as("r2"))
        .orderBy("event_type")
    }),

    // Benford first-digit screen over purchase values: the fraud/quality
    // check. The leading digit comes from an integer CASE ladder over
    // cents (never log10 — libm rounding at decade boundaries is
    // platform-defined), Benford expectations are embedded literals.
    "q_benford" -> ((s, dir) => {
      // integer CASE ladder, largest decade outermost: digit = c div 10^k
      // for the k with 10^k <= c < 10^(k+1)
      val digitLadder = (1 to 13).foldLeft(col("c")) { (acc, k) =>
        val pow = BigInt(10).pow(k).toLong
        when(col("c") >= pow, expr(s"c div $pow")).otherwise(acc)
      }
      val d = t(s, dir, "events")
        .filter(col("value").isNotNull && col("value") > 0)
        .select(round(col("value") * 100).cast("long").as("c"))
        .filter(col("c") > 0)
        .withColumn("digit", digitLadder)
      val n = d.agg(count(lit(1)).as("total"))
      val expectedP = (1 to 9).foldLeft(lit(null).cast("double")) { (acc, dd) =>
        when(col("digit") === dd, lit(BenfordP(dd))).otherwise(acc)
      }
      d.groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(n))
        .withColumn("share", col("n").cast("double") / col("total"))
        .select(col("digit"), col("n"), round(col("share"), 4).as("share"),
          round(expectedP, 4).as("benford_p"),
          round(col("share") - expectedP, 4).as("deviation"))
        .orderBy("digit")
    }),

    // EWMA smoothing + spike flags over the hourly per-type series. The
    // exponential weights are embedded as full-precision double literals
    // in BOTH engines (never pow(), whose libm rounding may differ), and
    // the weighted sum is a fixed-length left fold over the window's
    // collect_list — deterministic, so even the spike comparison against
    // 2x the trailing EWMA is bit-exact. Window state is 8 longs per row.
    "q_ewma_anomaly" -> ((s, dir) => {
      val counts = t(s, dir, "events")
        .withColumn("b", timestamp_micros(
          expr("(unix_micros(ts) div 3600000000) * 3600000000")))
        .groupBy("event_type", "b").agg(count(lit(1)).as("n"))
      // trailing window EXCLUDING the current row: spike = now vs history
      val w = Window.partitionBy("event_type").orderBy("b").rowsBetween(-8, -1)
      val wLit = array(EwmaWeights.map(lit): _*)
      val hist = counts.withColumn("h", reverse(collect_list(col("n")).over(w)))
      hist.filter(size(col("h")) === 8)
        .withColumn("wsum", aggregate(
          zip_with(col("h"), wLit, (x, wt) => x * wt),
          lit(0.0), (acc, x) => acc + x))
        .withColumn("ewma", col("wsum") / lit(EwmaWeights.sum))
        .select(col("event_type"),
          date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
          col("n"), round(col("ewma"), 4).as("ewma"),
          (col("n").cast("double") > lit(2.0) * col("ewma")).as("is_spike"))
        .filter(col("is_spike"))
        .orderBy("event_type", "bucket_ts")
    }),

    // Chi-square independence test of event_type x hour-of-day (the
    // feature-relevance screen). All 192 (o-e)^2/e terms are folded in
    // ONE deterministic sorted order — never a groupBy sum of doubles,
    // whose reduction order is layout-dependent — so the statistic
    // hash-matches bit-for-bit across engines.
    "q_chisq_type_hour" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type").as("ty"), hour(col("ts")).as("hr"))
      val obs = ev.groupBy("ty", "hr").agg(count(lit(1)).as("o"))
      val rowT = obs.groupBy("ty").agg(sum("o").as("rt"))
      val colT = obs.groupBy("hr").agg(sum("o").as("ct"))
      val n = obs.agg(sum("o").as("nn"))
      val cells = rowT.crossJoin(colT).crossJoin(broadcast(n))
        .join(obs, Seq("ty", "hr"), "left")
        .withColumn("e", col("rt").cast("double") * col("ct") / col("nn"))
        .withColumn("term",
          (coalesce(col("o"), lit(0L)) - col("e")) *
            (coalesce(col("o"), lit(0L)) - col("e")) / col("e"))
      val dims = cells.agg(countDistinct("ty").as("r"), countDistinct("hr").as("c"),
        max("nn").as("nn"))
      cells.agg(sort_array(collect_list(struct(col("ty"), col("hr"), col("term"))))
          .as("terms"))
        .crossJoin(broadcast(dims))
        .withColumn("chi2", aggregate(
          transform(col("terms"), t => t.getField("term")),
          lit(0.0), (acc, x) => acc + x))
        .select(round(col("chi2"), 6).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          round(sqrt(col("chi2") / (col("nn") *
            least(col("r") - 1, col("c") - 1))), 6).as("cramers_v"))
    }),

    "q_rolling_corr" -> ((s, dir) => {
      val counts = t(s, dir, "events")
        .withColumn("b", timestamp_micros(
          expr("(unix_micros(ts) div 900000000) * 900000000")))
        .groupBy("b").agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val spine = counts.agg(min("b").as("lo"), max("b").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 900 SECOND"))).as("b"))
      val dense = spine.join(counts, Seq("b"), "left")
        .select(col("b"), coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val w = Window.orderBy("b").rowsBetween(-95, 0)
      dense
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum("x").over(w)).withColumn("sy", sum("y").over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("syy", sum(col("y") * col("y")).over(w))
        .filter(col("n") === 96) // full windows only
        .withColumn("num", (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
        .withColumn("den",
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
        .select(date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
          round(when(col("den") =!= 0.0, col("num") / col("den")), 6).as("corr_24h"))
        .orderBy("bucket_ts")
    }),

    // Exact Gini concentration of rows over join keys — the single-number
    // skew verdict next to q_skew_report's quantiles. Rank-sum formula,
    // but computed WITHOUT ranking the key table: keys sharing a
    // multiplicity occupy consecutive ranks, and Σ rank·c over such a tie
    // group depends only on the group's start rank and size — so the
    // whole sum folds out of the (multiplicity → #keys) HISTOGRAM, a
    // relation bounded by the largest key multiplicity (dozens of rows at
    // any scale), never the billions-of-keys count table. Prefix key
    // counts come from a histogram² broadcast self-join — no window, no
    // global sort, nothing single-partition. Oracle unchanged (DuckDB
    // ranks directly; the fold is provably the same sum).
    "q_key_gini" -> ((s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      val hist = counts.groupBy("c").agg(count(lit(1)).as("m"))
      // s = #keys with strictly smaller multiplicity → the tie group of
      // multiplicity c covers ranks s+1 .. s+m, so Σ rank·c over it is
      // c · (s·m + m(m+1)/2)   [m(m+1) is even — the division is exact]
      val pre = hist.as("a")
        .join(broadcast(hist.as("b")), col("b.c") < col("a.c"), "left")
        .groupBy(col("a.c").as("c"), col("a.m").as("m"))
        .agg(coalesce(sum(col("b.m")), lit(0L)).as("s"))
      pre
        .agg(sum("m").as("n_keys"),
          sum(col("c") * col("m")).as("n_rows"),
          sum(col("c").cast("decimal(38,0)") *
              (col("s").cast("decimal(38,0)") * col("m") +
                (col("m").cast("decimal(38,0)") * (col("m") + lit(1L))) / 2))
            .as("ric"))
        .select(col("n_keys"), col("n_rows"),
          round(lit(2.0) * col("ric").cast("double") /
              (col("n_keys").cast("double") * col("n_rows").cast("double")) -
            (col("n_keys") + 1L).cast("double") / col("n_keys").cast("double"),
            6).as("gini"))
    }),

    // Sliding distinct count WITHOUT rescanning: per 15-min bucket, the
    // trailing-hour distinct users estimated by MERGING the four bucket
    // KMV sketches in a window frame (sketch algebra over windows — the
    // pre-aggregated sliding-distinct pattern; exact sliding distinct
    // would rescan every window). Estimates oracle bit-for-bit.
    "q_sliding_distinct" -> ((s, dir) => {
      import graft.ops.Sketch
      val k = 64
      val bucketed = t(s, dir, "events")
        .withColumn("b", timestamp_micros(
          expr("(unix_micros(ts) div 900000000) * 900000000")))
        .groupBy("b")
        .agg(Sketch.kmvSketch(col("user_id"), k).as("sk"),
          count(lit(1)).as("n_events"))
      // RANGE frame on µs (not 4 ROWS): empty buckets are absent, and a
      // row frame would silently reach back past the hour across gaps
      val w = Window.orderBy(unix_micros(col("b")))
        .rangeBetween(-2700000000L, 0L)
      bucketed
        .withColumn("merged", aggregate(
          collect_list(col("sk")).over(w),
          array().cast("array<string>"),
          (acc, x) => Sketch.kmvMerge(acc, x, k)))
        .select(date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
          col("n_events"),
          round(Sketch.kmvEstimate(col("merged"), k), 2).as("est_hour_users"))
        .orderBy("bucket_ts")
    }),

    // Sliding trailing-hour VALUE QUANTILES per 15-min bucket by MERGING
    // per-bucket deterministic pair samples in a µs-range window frame —
    // the quantile sibling of q_sliding_distinct: per bucket, the k
    // hash-smallest (md5(event_id), value) pairs; per window, the merge
    // of 4 bucket samples IS the window's k-min sample (KMV property),
    // so no per-window rescan ever happens. The estimate rule (ceil(p·m)
    // over the sample, exact below k) is replayed by the oracle
    // bit-for-bit — a portable percentile sketch, unlike t-digest.
    "q_sliding_quantiles" -> ((s, dir) => {
      import graft.ops.Sketch
      val k = 64
      val bucketed = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .withColumn("b", timestamp_micros(
          expr("(unix_micros(ts) div 900000000) * 900000000")))
        .groupBy("b")
        .agg(Sketch.pairSample(col("event_id"), col("value"), k).as("sm"),
          count(lit(1)).as("n_events"))
      // RANGE frame on µs (not 4 ROWS): empty buckets are absent, and a
      // row frame would silently reach back past the hour across gaps
      val w = Window.orderBy(unix_micros(col("b")))
        .rangeBetween(-2700000000L, 0L)
      bucketed
        .withColumn("merged", aggregate(
          collect_list(col("sm")).over(w),
          array().cast("array<struct<h:string,v:double>>"),
          (acc, x) => Sketch.pairSampleMerge(acc, x, k)))
        .select(date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
          col("n_events"),
          round(Sketch.sampleQuantile(
            Sketch.pairSampleValues(col("merged")), 0.5), 4).as("p50_hour"),
          round(Sketch.sampleQuantile(
            Sketch.pairSampleValues(col("merged")), 0.95), 4).as("p95_hour"))
        .orderBy("bucket_ts")
    }),

    // Feature hashing (the hashing trick, Weinberger et al. 2009): each
    // user's event types hashed into a fixed 8-bucket count vector via
    // md5 — dimensionality is constant regardless of category
    // cardinality, and the md5 bucket is engine-portable
    "q_feature_hash" -> ((s, dir) => {
      val bucket = conv(substring(md5(col("event_type")), 1, 4), 16, 10)
        .cast("int") % 8
      t(s, dir, "events")
        .withColumn("b", bucket)
        .groupBy("user_id")
        .agg(array_join(array((0 until 8).map(i =>
          sum(when(col("b") === i, 1L).otherwise(0L))): _*), "|").as("features"))
        .orderBy("user_id")
    }),

    // Join-key skew report: the diagnostic that decides whether a join
    // needs salting — key cardinality, head shares, and count quantiles
    // from the portable sample (key-cardinality-sized work, one scan)
    "q_skew_report" -> ((s, dir) => {
      import graft.ops.Sketch
      val counts = t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      val total = counts.agg(sum("c").as("n_rows"),
        count(lit(1)).as("n_keys"), max("c").as("max_c"))
      val smp = counts.agg(
        Sketch.hashSample(col("l_orderkey"), col("c").cast("double"), 1024).as("s"))
      total.crossJoin(smp)
        .select(col("n_rows"), col("n_keys"),
          round(col("max_c").cast("double") / col("n_rows").cast("double"), 6)
            .as("top_key_share"),
          Sketch.sampleQuantile(col("s"), 0.5).cast("long").as("p50_count"),
          Sketch.sampleQuantile(col("s"), 0.99).cast("long").as("p99_count"))
    }),

    // Incremental rollup chain: monthly totals RE-AGGREGATED from the
    // daily rollup (never from raw) — the aggregate-table maintenance
    // pattern; the oracle computes monthly straight from raw, so a hash
    // match proves the re-aggregation is lossless
    "q_rollup_chain" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      daily
        .groupBy(substring(col("day"), 1, 7).as("month"), col("event_type"))
        .agg(sum("n").as("n_events"), round(sum("sv"), 2).as("total_value"))
        .orderBy("month", "event_type")
    }),

    // Outage detection: maximal runs of ≥2 consecutive EMPTY buckets on
    // the regularized series (gaps-and-islands over the resample spine —
    // pure integer window logic, no arithmetic portability risk)
    "q_gap_incidents" -> ((s, dir) => {
      val rs = graft.ops.TimeSeries.resample(t(s, dir, "events"),
        "event_type", "ts", "value", stepSeconds = 900L)
      val w = Window.partitionBy("event_type").orderBy("b")
      rs.withColumn("rn", row_number().over(w))
        .filter(col("v_obs").isNull)
        .withColumn("rn2", row_number().over(w))
        .withColumn("grp", col("rn") - col("rn2"))
        .groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).as("n_buckets"),
          date_format(min("b"), "yyyy-MM-dd HH:mm:ss").as("gap_start"),
          date_format(max("b"), "yyyy-MM-dd HH:mm:ss").as("gap_end"))
        .filter(col("n_buckets") >= 2)
        .select("event_type", "gap_start", "gap_end", "n_buckets")
        .orderBy("event_type", "gap_start")
    }),

    // Path analysis: first-order Markov transition matrix of per-user
    // event sequences (counts + row-normalized probabilities)
    "q_event_transitions" -> ((s, dir) =>
      graft.ops.Analytics.transitionMatrix(t(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id")
        .orderBy("from_type", "to_type")),

    // SCD2 merge: apply an update batch (changed segments, no-op echoes,
    // brand-new keys) to a customer dimension history — superseded open
    // rows close, new versions open, no-ops are dropped (idempotent)
    "q_scd2_merge" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val hist = c.select(col("c_custkey").as("cust_id"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
        lit("2024-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"))
      val ts = lit("2024-06-01").cast("date")
      val changed = c.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("cust_id"), lit("MOVED").as("segment"),
          (col("c_acctbal") + 50.0).as("acctbal"), ts.as("uts"))
      val echo = c.filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("cust_id"), col("c_mktsegment").as("segment"),
          col("c_acctbal").as("acctbal"), ts.as("uts"))
      val fresh = c.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 1000000L).as("cust_id"),
          lit("NEWSEG").as("segment"), lit(0.0).as("acctbal"), ts.as("uts"))
      graft.ops.Scd2.merge(hist, changed.unionByName(echo).unionByName(fresh),
          "cust_id", "uts", Seq("segment", "acctbal"))
        .orderBy("cust_id", "valid_from")
    }),

    // Temporal dimension join: each event resolves the customer segment
    // VALID AT its event time against the SCD2 history (mid-January
    // update, so events genuinely straddle two versions) — point-in-time
    // lookup via the as-of join on valid_from; no range cross join
    "q_temporal_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val hist = c.select(col("c_custkey").as("cust_id"),
        col("c_mktsegment").as("segment"),
        lit("2024-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"))
      val updates = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("cust_id"), lit("MIDMONTH").as("segment"),
          lit("2024-01-15").cast("date").as("uts"))
      val dim = graft.ops.Scd2.merge(hist, updates, "cust_id", "uts", Seq("segment"))
        .withColumn("vf_ts", col("valid_from").cast("timestamp"))
      graft.ops.AsOf.join(
          t(s, dir, "events").select("event_id", "user_id", "ts", "event_type"),
          dim.select("cust_id", "vf_ts", "segment"),
          "user_id", "cust_id", "ts", "vf_ts", Seq("segment"))
        .groupBy(col("asof_segment").as("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("segment", "event_type")
    }),

    // Declarative data-quality gate: six constraints (completeness,
    // uniqueness, bounds, set membership) fused into ONE aggregation over
    // one scan — includes a deliberately failing check (user_id
    // uniqueness) to exercise the failure path. Uniqueness goes through
    // the scale-aware default (Checks.uniquenessFor): the footer row
    // count (free metadata) exceeds the exact cutoff at sf0.01, so both
    // uniqueness checks run the bounded-state KMV path — no Expand, ≤k
    // hashes of state — and the oracle replays the KMV-exact-below-k
    // contract (user_id's 150 distinct < k is bit-for-bit exact;
    // event_id's 10k distinct > k is the deterministic (k−1)·2⁶⁴/H_k
    // estimate).
    "q_quality_checks" -> ((s, dir) => {
      import graft.ops.Checks
      val rows = graft.Tables.footerRowCount(dir, "events")
      Checks.run(t(s, dir, "events"), Seq(
          Checks.Completeness("user_id", 0.99),
          Checks.Completeness("value", 0.5),
          Checks.uniquenessFor(rows, "event_id", 0.999999),
          Checks.uniquenessFor(rows, "user_id", 0.5),
          Checks.FractionBetween("value", -1e6, 1e6, 0.999),
          Checks.FractionInSet("event_type",
            Seq("click", "view", "purchase", "signup", "error"), 1.0)))
        .orderBy("kind", "col_name")
    }),

    // Freshness-decayed activity (half-life one day): per event type,
    // the exponentially time-decayed event count at the corpus' own
    // latest timestamp — the recency weight a training-data sampler
    // applies to favor fresh documents. Bit-stable across layouts AND
    // engines by construction: ages bucket to whole days so the
    // per-(type, day) aggregation is an exact integer count (one small
    // shuffle), each bucket's term cnt/2^age is an exact dyadic double
    // (shiftleft — no libm pow, whose last ulp differs across engines),
    // and the per-type total folds the day-sorted bucket list in one
    // explicit sequential pass (the q_chisq/IVF fold discipline). At
    // 100 TB the bucket table is |types|×|days| no matter the corpus —
    // the decay arithmetic never touches row-level data.
    "q_decayed_counts" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("ts").isNotNull)
      val ref = ev.agg(max(expr("unix_micros(ts) div 86400000000")).as("dmax"))
      val b = ev.crossJoin(broadcast(ref))
        .select(col("event_type"),
          least(col("dmax") - expr("unix_micros(ts) div 86400000000"),
            lit(62L)).as("age_d"))
        .groupBy("event_type", "age_d").agg(count(lit(1)).as("cnt"))
        .withColumn("term", col("cnt").cast("double") /
          expr("cast(shiftleft(cast(1 as bigint), cast(age_d as int)) as double)"))
      b.groupBy("event_type")
        .agg(
          sum("cnt").as("n_events"),
          aggregate(
            transform(sort_array(collect_list(struct(col("age_d"), col("term")))),
              x => x.getField("term")),
            lit(0.0), (acc, x) => acc + x).as("decayed_raw"))
        .select(col("event_type"), col("n_events"),
          round(col("decayed_raw"), 6).as("decayed"))
        .orderBy("event_type")
    }),

    // KMV sketch SET ALGEBRA (theta-sketch style): audience overlap
    // between event-type segments estimated from the per-type sketches
    // ALONE — union, Jaccard and intersection need no rescan and no
    // distinct-join of the data. The pair join is sketch-level (|types|
    // rows per side, broadcast), never data-level; at 100 TB the sketches
    // are the only thing that moves.
    "q_kmv_overlap" -> ((s, dir) => {
      import graft.ops.Sketch
      val k = 64
      val sk = t(s, dir, "events")
        .groupBy("event_type")
        .agg(Sketch.kmvSketch(col("user_id"), k).as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          round(Sketch.kmvEstimate(col("ska"), k), 2).as("est_a"),
          round(Sketch.kmvEstimate(col("skb"), k), 2).as("est_b"),
          round(Sketch.kmvEstimate(Sketch.kmvMerge(col("ska"), col("skb"), k), k), 2)
            .as("est_union"),
          round(Sketch.kmvJaccard(col("ska"), col("skb"), k), 4).as("jaccard_est"),
          round(Sketch.kmvIntersectEstimate(col("ska"), col("skb"), k), 2)
            .as("est_intersect"))
        .orderBy("type_a", "type_b")
    }),

    // Deterministic-sample quantiles: a bounded k-min-hash uniform sample
    // per group (≤128 (hash,value) pairs cross the exchange) + discrete
    // quantiles of the sample — the PORTABLE approximate-percentile
    // (percentile_approx is engine-opaque). Oracle-checked bit-for-bit:
    // DuckDB re-ranks rows by the same md5 and picks the same order
    // statistics.
    "q_sampled_quantiles" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      ev.groupBy("event_type")
        .agg(graft.ops.Sketch.hashSample(col("event_id"), col("value"), 128).as("smp"))
        .select(col("event_type"), size(col("smp")).as("n_sample"),
          round(graft.ops.Sketch.sampleQuantile(col("smp"), 0.5), 4).as("p50_est"),
          round(graft.ops.Sketch.sampleQuantile(col("smp"), 0.9), 4).as("p90_est"))
        .orderBy("event_type")
    }),

    // Single-pass bounded-state table profile (the ANALYZE primitive):
    // per column, non-null/null counts + md5-KMV distinct estimate — one
    // scan for every column at once, ≤k hashes per column cross the
    // exchange. Oracle-checked bit-for-bit (the KMV estimate is
    // portable); `value` reports NULL distinct (double string rendering
    // is not engine-portable, documented in Profile).
    "q_profile_events" -> ((s, dir) =>
      graft.ops.Profile.table(
        t(s, dir, "events").select("event_id", "user_id", "event_type", "value", "props"),
        distinctCols = Set("event_id", "user_id", "event_type", "props"))
        .orderBy("col_name")),

    // GROUPING SETS: explicit grouping combinations (finer control than
    // rollup/cube) in one Expand pass — no multi-scan union
    "q_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")),

    // Skew-salted join: fact salted into 8 buckets, dim replicated 8× —
    // the hot-key spreading technique, oracle-proven equal to the plain
    // join (salting must never change the result multiset)
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      graft.ops.Skew.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey",
          buckets = 8, factSaltOn = Seq("l_orderkey", "l_linenumber"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Bloom-pruned semi join: a ~100 KB sketch of the dim keys evaluated
    // inside the fact scan drops non-matching rows BEFORE the exchange;
    // the exact semi join after removes false positives, so the result
    // equals the plain semi join (which is what the oracle runs)
    "q_bloom_semi_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      graft.ops.BloomJoin.semiJoinPruned(t(s, dir, "orders"), cust,
          "o_custkey", "c_custkey", expectedItems = 100000L, numBits = 800000L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // Tumbling event-time window (the Structured Streaming window() fn,
    // batch-planned): 15-min epoch-aligned buckets
    "q_tumbling_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")),

    // Native session_window(): 30-min-gap sessions per user — same
    // semantics the streaming sessionizer uses, here batch-planned; the
    // oracle replays it as gaps-and-islands (new session iff gap >= 30min,
    // Spark merges sessions only on STRICT overlap)
    "q_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")),

    // Sessionization via lag(): >30 min gap starts a new session
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Ordered funnel view -> click -> purchase: each stage's timestamp is
    // the user's FIRST qualifying event STRICTLY AFTER the previous stage.
    // Three chained unbounded-frame window aggs share ONE exchange on
    // user_id (same partitioning — Catalyst reuses the shuffle), then a
    // user-level rollup; the events table is shuffled once, not per stage.
    "q_funnel" -> ((s, dir) =>
      graft.ops.Analytics.funnelStageTimes(t(s, dir, "events"),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_view_click"),
          count(col("t_purchase")).as("n_view_click_purchase"))),

    // Deadline-bounded funnel: each conversion must land within 48h of
    // the previous stage (real funnels expire)
    "q_funnel_windowed" -> ((s, dir) =>
      graft.ops.Analytics.funnelStageTimes(t(s, dir, "events"),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
          maxGapSeconds = Some(172800L))
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_view_click"),
          count(col("t_purchase")).as("n_view_click_purchase"))),

    // Entity resolution: all part-name pairs within edit distance 2 via
    // PassJoin segment blocking — candidates from a pure equi-join on
    // (length, slot, segment), exact levenshtein only on candidates; the
    // oracle is the all-pairs scan, so a hash match proves the blocking
    // is COMPLETE (no lost pair), not just fast
    "q_fuzzy_name_pairs" -> ((s, dir) =>
      graft.ops.EntityResolution.fuzzySelfJoin(t(s, dir, "part"), "p_name", tau = 2)
        .orderBy("name_a", "name_b")),

    // Weekly cohort retention: users grouped by first-activity week,
    // activity counted per (cohort_week, week_offset). SCALE-AWARE
    // (the uniquenessFor pattern): exact distinct-(user, week) counting
    // while the parquet-footer row count keeps that exchange cheap,
    // bounded-state KMV sketching per (cohort, offset) group above the
    // cutoff — the distinct (user, period) table is the one state that
    // scales with the corpus here. Both scales the driver touches sit
    // below the cutoff (exact path — this oracle); the sketch path has
    // its own oracled row (q_cohort_retention_kmv) on the exact-below-k
    // KMV contract.
    "q_cohort_retention" -> ((s, dir) =>
      graft.ops.Analytics.cohortRetentionFor(
        graft.Tables.footerRowCount(dir, "events"),
        t(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),

    // The bounded-state retention path pinned on: per-(cohort, offset)
    // KMV user sketches (≤ k hashes across every exchange) instead of
    // the corpus-scale distinct (user, week) table. Below k distinct
    // users per group the sketch holds all of them, so n_active equals
    // the exact count bit-for-bit — which is what this DuckDB oracle
    // (the exact SQL) checks at sf0.01 (150 users ≪ k = 4096).
    "q_cohort_retention_kmv" -> ((s, dir) =>
      graft.ops.Analytics.cohortRetentionSketch(
        t(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_week", "week_offset"))
  )

  /** One UNION ALL branch per profiled column, each replaying the
    * ungrouped KMV estimate (the q_kmv_distinct oracle's formula). */
  private def profileEventsSql: String = {
    def one(c: String, distinct: Boolean): String = {
      val est =
        if (distinct)
          s"""(WITH h AS (SELECT DISTINCT substr(md5($c::VARCHAR), 1, 16) AS hx
             |            FROM events WHERE $c IS NOT NULL),
             |  r AS (SELECT hx, row_number() OVER (ORDER BY hx) AS rn,
             |               count(*) OVER () AS nd FROM h)
             |  SELECT round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
             |               ELSE 63.0 * 18446744073709551616.0 /
             |                    (('0x' || max(CASE WHEN rn = 64 THEN hx END))::UBIGINT::DOUBLE)
             |          END, 2)
             |  FROM r WHERE rn <= 64)""".stripMargin
        else "NULL::DOUBLE"
      s"""SELECT '$c' AS col_name,
         |       count($c) AS n_non_null,
         |       count(*) - count($c) AS n_nulls,
         |       $est AS approx_distinct
         |FROM events""".stripMargin
    }
    Seq("event_id" -> true, "user_id" -> true, "event_type" -> true,
      "value" -> false, "props" -> true)
      .map { case (c, d) => one(c, d) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** q_pagerank oracle: the 5 synchronous rounds unrolled as CTEs. Every
    * step is BIGINT/HUGEINT arithmetic with positive operands, so
    * DuckDB's `//` and Spark's `div` agree exactly — the rank values
    * hash-match bit-for-bit despite 5 chained reductions. */
  private def pagerankSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""p$i AS (SELECT e.dst AS id,
         |             150000000000 // nn.n
         |               + CAST(sum((p.pr * 85 * e.w) // (100 * e.tw)) AS BIGINT) AS pr
         |      FROM e JOIN $prev p ON p.id = e.src, nn
         |      GROUP BY e.dst, nn.n)""".stripMargin
    }
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst, count(*) AS w
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |edges AS (SELECT src, dst, w FROM pp UNION ALL SELECT dst, src, w FROM pp),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
       |e AS (SELECT edges.src, edges.dst, edges.w, ow.tw
       |      FROM edges JOIN ow ON ow.src = edges.src),
       |nn AS (SELECT count(*) AS n FROM ow),
       |p0 AS (SELECT ow.src AS id, 1000000000000 // nn.n AS pr FROM ow, nn),
       |${(1 to 5).map(round).mkString(",\n")}
       |SELECT id AS part_id, CAST(pr AS BIGINT) AS rank_fp FROM p5
       |ORDER BY rank_fp DESC, part_id LIMIT 50""".stripMargin
  }

  /** q_pagerank_topic oracle: the SEEDED recurrence unrolled — pr0 =
    * Total//|S| on seeds else 0; per round every node earns its floored
    * in-mass and seeds additionally earn (15%·Total)//|S|. The graph is
    * the total symmetric co-purchase union (nodes ≡ ow.src), so no
    * dangling scalar and no lost receivers. */
  private def pagerankTopicSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""c$i AS (SELECT e.dst AS id,
         |             CAST(sum((p.pr * 85 * e.w) // (100 * e.tw)) AS BIGINT) AS s
         |      FROM e JOIN $prev p ON p.id = e.src GROUP BY e.dst),
         |p$i AS (SELECT nd.id,
         |             CASE WHEN nd.id % 20 = 0 THEN 150000000000 // ns.k ELSE 0 END
         |               + COALESCE(c.s, 0) AS pr
         |      FROM (SELECT src AS id FROM ow) nd
         |      CROSS JOIN ns LEFT JOIN c$i c ON c.id = nd.id)""".stripMargin
    }
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst, count(*) AS w
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |edges AS (SELECT src, dst, w FROM pp UNION ALL SELECT dst, src, w FROM pp),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
       |e AS (SELECT edges.src, edges.dst, edges.w, ow.tw
       |      FROM edges JOIN ow ON ow.src = edges.src),
       |ns AS (SELECT count(*) AS k FROM ow WHERE src % 20 = 0),
       |p0 AS (SELECT ow.src AS id,
       |              CASE WHEN ow.src % 20 = 0 THEN 1000000000000 // ns.k ELSE 0 END AS pr
       |       FROM ow, ns),
       |${(1 to 5).map(round).mkString(",\n")}
       |SELECT id AS part_id, CAST(pr AS BIGINT) AS rank_fp FROM p5
       |ORDER BY rank_fp DESC, part_id LIMIT 50""".stripMargin
  }

  /** q_shortest_paths oracle: the min-plus Bellman–Ford recurrence
    * unrolled — per round carry the previous distances and every relaxed
    * in-edge candidate through one min-aggregate. */
  private def shortestPathsSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "d0" else s"d${i - 1}"
      s"""d$i AS (SELECT id, CAST(min(d) AS BIGINT) AS d FROM (
         |        SELECT id, d FROM $prev
         |        UNION ALL
         |        SELECT e.dst AS id, p.d + e.w AS d
         |        FROM e JOIN $prev p ON e.src = p.id) GROUP BY id)""".stripMargin
    }
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst, count(*) AS n_ab
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS (SELECT src, dst, 1000000 // n_ab AS w FROM pp
       |      UNION ALL SELECT dst, src, 1000000 // n_ab FROM pp),
       |d0 AS (SELECT p_partkey AS id, CAST(0 AS BIGINT) AS d FROM part
       |       WHERE p_partkey % 500 = 0),
       |${(1 to 6).map(round).mkString(",\n")}
       |SELECT id AS part_id, d AS dist FROM d6
       |ORDER BY dist, part_id LIMIT 100""".stripMargin
  }

  /** q_lpa_communities oracle: the synchronous LPA recurrence unrolled —
    * per round every node adopts the most frequent neighbour label, ties
    * to the smallest label (row_number over (count DESC, label)). */
  private def lpaCommunitiesSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (SELECT e.dst AS id, p.l AS l, count(*) AS c
         |      FROM e JOIN $prev p ON p.id = e.src GROUP BY 1, 2),
         |l$i AS (SELECT id, l FROM (
         |        SELECT id, l, row_number() OVER (PARTITION BY id
         |          ORDER BY c DESC, l) AS rn FROM c$i) WHERE rn = 1)""".stripMargin
    }
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS (SELECT src, dst FROM pp UNION ALL SELECT dst, src FROM pp),
       |l0 AS (SELECT DISTINCT src AS id, src AS l FROM e),
       |${(1 to 4).map(round).mkString(",\n")}
       |SELECT l AS community, count(*) AS size FROM l4
       |GROUP BY 1 ORDER BY size DESC, community LIMIT 50""".stripMargin
  }

  /** q_hits oracle: the 3 HITS rounds unrolled — per round an in-mass
    * aggregate, a HUGEINT L1 normalization `(a·1e12) // ΣA`, then the
    * symmetric hub step. Every operand positive, floor division
    * throughout ⇒ bit-for-bit with the engine's DECIMAL(38,0) `div`. */
  private def hitsSql: String = {
    def round(i: Int): String = {
      val ph = if (i == 1) "h0" else s"hn${i - 1}"
      s"""ar$i AS (SELECT e.p AS id, CAST(sum(h.h) AS BIGINT) AS a
         |      FROM e JOIN $ph h ON h.id = e.c GROUP BY e.p),
         |sa$i AS (SELECT CAST(sum(a) AS HUGEINT) AS s FROM ar$i),
         |an$i AS (SELECT id,
         |             CAST((CAST(a AS HUGEINT) * 1000000000000) // sa$i.s AS BIGINT) AS a
         |      FROM ar$i, sa$i),
         |hr$i AS (SELECT e.c AS id, CAST(sum(a.a) AS BIGINT) AS h
         |      FROM e JOIN an$i a ON a.id = e.p GROUP BY e.c),
         |sh$i AS (SELECT CAST(sum(h) AS HUGEINT) AS s FROM hr$i),
         |hn$i AS (SELECT id,
         |             CAST((CAST(h AS HUGEINT) * 1000000000000) // sh$i.s AS BIGINT) AS h
         |      FROM hr$i, sh$i)""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |           WHERE o.o_custkey IS NOT NULL AND l.l_partkey IS NOT NULL),
       |hs AS (SELECT DISTINCT c FROM e),
       |nh AS (SELECT count(*) AS n FROM hs),
       |h0 AS (SELECT c AS id, 1000000000000 // nh.n AS h FROM hs, nh),
       |${(1 to 3).map(round).mkString(",\n")}
       |SELECT * FROM (
       |  (SELECT 'authority' AS role, id, a AS score_fp FROM an3
       |   ORDER BY a DESC, id LIMIT 25)
       |  UNION ALL
       |  (SELECT 'hub' AS role, id, h AS score_fp FROM hn3
       |   ORDER BY h DESC, id LIMIT 25))
       |ORDER BY role, score_fp DESC, id""".stripMargin
  }

  /** q_link_predict oracle: the same wedge enumeration with the identical
    * deg ≤ 1024 hub cap, RA score as positive-operand floor division. */
  private def linkPredictSql: String =
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (SELECT src AS z, dst AS x FROM pp
       |        UNION ALL SELECT dst, src FROM pp),
       |deg AS (SELECT z, count(*) AS d FROM sym GROUP BY 1
       |        HAVING count(*) <= 1024),
       |legs AS (SELECT sym.z, sym.x, deg.d FROM sym JOIN deg ON deg.z = sym.z),
       |cand AS (SELECT l1.x AS x, l2.x AS y, count(*) AS n_common,
       |               CAST(sum(1000000000000 // l1.d) AS BIGINT) AS ra_fp
       |         FROM legs l1 JOIN legs l2 ON l1.z = l2.z AND l1.x < l2.x
       |         GROUP BY 1, 2),
       |nw AS (SELECT c.* FROM cand c LEFT JOIN pp
       |         ON pp.src = c.x AND pp.dst = c.y
       |       WHERE pp.src IS NULL)
       |SELECT x AS item_a, y AS item_b, n_common, ra_fp FROM nw
       |ORDER BY ra_fp DESC, item_a, item_b LIMIT 50""".stripMargin

  /** q_link_jaccard oracle: the same capped wedge enumeration; Jaccard
    * denominator from the FULL symmetric degree; HUGEINT product before
    * the floor division replays the engine's DECIMAL(38,0) intermediate. */
  private def linkJaccardSql: String =
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (SELECT src AS z, dst AS x FROM pp
       |        UNION ALL SELECT dst, src FROM pp),
       |degall AS (SELECT x AS id, count(*) AS deg FROM sym GROUP BY 1),
       |degz AS (SELECT z FROM sym GROUP BY z HAVING count(*) <= 1024),
       |legs AS (SELECT sym.z, sym.x FROM sym JOIN degz ON degz.z = sym.z),
       |cand AS (SELECT l1.x AS x, l2.x AS y, count(*) AS n_common
       |         FROM legs l1 JOIN legs l2 ON l1.z = l2.z AND l1.x < l2.x
       |         GROUP BY 1, 2),
       |sc AS (SELECT c.x, c.y, c.n_common,
       |              CAST((CAST(c.n_common AS HUGEINT) * 1000000000000)
       |                   // (dx.deg + dy.deg - c.n_common) AS BIGINT) AS jac_fp
       |       FROM cand c JOIN degall dx ON dx.id = c.x
       |                   JOIN degall dy ON dy.id = c.y),
       |nw AS (SELECT sc.* FROM sc LEFT JOIN pp
       |         ON pp.src = sc.x AND pp.dst = sc.y
       |       WHERE pp.src IS NULL)
       |SELECT x AS item_a, y AS item_b, n_common, jac_fp FROM nw
       |ORDER BY jac_fp DESC, item_a, item_b LIMIT 50""".stripMargin

  /** q_random_walks oracle: the walk recurrence unrolled — per step an
    * inner join of the walk front with the symmetric edge list and an
    * arg_min over the md5 transition keys, replaying every hop
    * bit-for-bit (md5 order is engine-independent). */
  private def randomWalksSql: String = {
    def step(t: Int): String = {
      val prev = if (t == 1) "f0" else s"f${t - 1}"
      s"""f$t AS (SELECT f.seed, f.walk,
         |            arg_min(s.dst, md5(f.seed || '_' || f.walk ||
         |                               '_${t}_' || s.dst)) AS node
         |     FROM $prev f JOIN sym s ON s.src = f.node GROUP BY 1, 2)"""
        .stripMargin
    }
    val arms = (1 to 5).map(t =>
      s"SELECT seed, walk, CAST($t AS BIGINT) AS step, node FROM f$t")
      .mkString("\n  UNION ALL ")
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (SELECT src, dst FROM pp UNION ALL SELECT dst, src FROM pp),
       |seeds AS (SELECT p_partkey AS seed FROM part WHERE p_partkey % 500 = 0),
       |f0 AS (SELECT seed, w.widx AS walk, seed AS node
       |       FROM seeds, (SELECT unnest(generate_series(1, 3)) AS widx) w),
       |${(1 to 5).map(step).mkString(",\n")}
       |SELECT seed, walk, step, node FROM (
       |  $arms)
       |ORDER BY seed, walk, step""".stripMargin
  }

  /** q_pagerank_dangling oracle: the directed-graph recurrence unrolled —
    * per round, a contribution CTE, a dangling-mass scalar CTE (ranks of
    * nodes absent from ow), and a node-relation left join so isolated
    * receivers still earn base + dangling mass. All BIGINT `//` steps with
    * positive operands — bit-for-bit with the engine's fixed point. */
  private def pagerankDanglingSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""c$i AS (SELECT e.dst AS id,
         |             CAST(sum((p.pr * 85 * e.w) // (100 * e.tw)) AS BIGINT) AS s
         |      FROM e JOIN $prev p ON p.id = e.src GROUP BY e.dst),
         |d$i AS (SELECT CAST(COALESCE(sum(pr), 0) AS BIGINT) AS dm FROM $prev
         |        WHERE id NOT IN (SELECT src FROM ow)),
         |p$i AS (SELECT nodes.id,
         |             150000000000 // nn.n + COALESCE(c.s, 0)
         |               + (d.dm * 85) // (100 * nn.n) AS pr
         |      FROM nodes LEFT JOIN c$i c ON c.id = nodes.id, d$i d, nn)""".stripMargin
    }
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst, count(*) AS w
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM pp GROUP BY 1),
       |e AS (SELECT pp.src, pp.dst, pp.w, ow.tw
       |      FROM pp JOIN ow ON ow.src = pp.src),
       |nodes AS (SELECT src AS id FROM pp UNION SELECT dst FROM pp),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |p0 AS (SELECT nodes.id, 1000000000000 // nn.n AS pr FROM nodes, nn),
       |${(1 to 5).map(round).mkString(",\n")}
       |SELECT id AS part_id, CAST(pr AS BIGINT) AS rank_fp FROM p5
       |ORDER BY rank_fp DESC, part_id LIMIT 50""".stripMargin
  }

  /** q_pagerank_converged oracle: the symmetric-graph recurrence unrolled
    * to `depth` rounds (past the integer fixed point), every round
    * MATERIALIZED — each check round is referenced twice (next round +
    * its delta), and default inlining would double the chain per check.
    * The BASE relations (ow/e/nn) are MATERIALIZED too: e is referenced
    * by all `depth` rounds, so default inlining re-derives the whole
    * li→pp→edges→ow graph build 208× — measured 453 s of the round-12
    * oracle gate at sf0.01, collapsing to seconds once pinned.
    * n_iters = the first multiple of `checkEvery` whose L1 delta against
    * the previous check is zero — the engine's exact stop rule — and the
    * reported ranks are p_depth, which equals the fixed point for any
    * depth ≥ n_iters. */
  private def pagerankConvergedSql(depth: Int, checkEvery: Int): String = {
    require(depth % checkEvery == 0)
    def round(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""p$i AS MATERIALIZED (SELECT e.dst AS id,
         |             150000000000 // nn.n
         |               + CAST(sum((p.pr * 85 * e.w) // (100 * e.tw)) AS BIGINT) AS pr
         |      FROM e JOIN $prev p ON p.id = e.src, nn
         |      GROUP BY e.dst, nn.n)""".stripMargin
    }
    val checks = (checkEvery to depth by checkEvery).map { k =>
      s"""SELECT $k AS r,
         |  (SELECT COALESCE(sum(abs(a.pr - b.pr)), 0)
         |   FROM p$k a JOIN p${k - checkEvery} b ON a.id = b.id) AS d""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS src, b.it AS dst, count(*) AS w
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |edges AS (SELECT src, dst, w FROM pp UNION ALL SELECT dst, src, w FROM pp),
       |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM edges GROUP BY 1),
       |e AS MATERIALIZED (SELECT edges.src, edges.dst, edges.w, ow.tw
       |      FROM edges JOIN ow ON ow.src = edges.src),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM ow),
       |p0 AS MATERIALIZED (SELECT ow.src AS id, 1000000000000 // nn.n AS pr FROM ow, nn),
       |${(1 to depth).map(round).mkString(",\n")},
       |checks AS ($checks),
       |conv AS (SELECT CAST(min(r) AS BIGINT) AS n_iters FROM checks WHERE d = 0)
       |SELECT id AS part_id, CAST(pr AS BIGINT) AS rank_fp, conv.n_iters
       |FROM p$depth, conv
       |ORDER BY rank_fp DESC, part_id LIMIT 50""".stripMargin
  }

  /** q_kcore_converged oracle: the peel unrolled to `depth` rounds (far
    * past the sf0.01 fixed point), then the first no-op round selected by
    * a lag window over the per-round edge counts — the engine's
    * convergence rule expressed relationally. */
  /** q_ktruss oracle: the triangle-support peel unrolled — per round a
    * symmetric edge view, the wedge self-join counting each edge's
    * support, and the support ≥ k−2 filter. */
  private def trussSql(k: Int, rounds: Int): String = {
    // every CTE MATERIALIZED: d_i and e_i are each referenced 2-3 times
    // per round, so the default inline expansion is 4^rounds copies of
    // the wedge join (measured: the un-materialized 4-round chain never
    // finished at sf0.01; materialized it's sub-second)
    val iters = (1 to rounds).map { i =>
      s"""d${i - 1} AS MATERIALIZED (
         |  SELECT a AS u, b AS v FROM e${i - 1}
         |  UNION ALL SELECT b, a FROM e${i - 1}),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b
         |  FROM e${i - 1} e JOIN d${i - 1} x ON x.u = e.a
         |       JOIN d${i - 1} y ON y.u = e.b AND y.v = x.v
         |  GROUP BY e.a, e.b HAVING count(*) >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    val union = (1 to rounds).map { i =>
      s"""SELECT $i AS round,
         |  (SELECT count(DISTINCT u)
         |   FROM (SELECT a AS u FROM e$i UNION ALL SELECT b FROM e$i)) AS n_nodes,
         |  count(*) AS n_edges FROM e$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS a, b.it AS b
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e0 AS MATERIALIZED (SELECT a, b FROM pp),
       |$iters
       |SELECT CAST(round AS INT) AS round, CAST(n_nodes AS BIGINT) AS n_nodes,
       |       CAST(n_edges AS BIGINT) AS n_edges
       |FROM ($union) ORDER BY round""".stripMargin
  }

  private def kcoreConvergedSql(k: Int, depth: Int): String = {
    // MATERIALIZED: each e_i is referenced three times (its k-filter and
    // both semi-join sides of the next round) — default CTE inlining would
    // expand the chain 3^depth-fold
    def round(i: Int): String =
      s"""k$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e${i - 1}.u, e${i - 1}.v FROM e${i - 1}
         |        JOIN k$i x ON e${i - 1}.u = x.u
         |        JOIN k$i y ON e${i - 1}.v = y.u)""".stripMargin
    val counts = (0 to depth).map(i =>
      s"SELECT $i AS r, count(DISTINCT u) AS n_nodes, count(*) // 2 AS n_edges FROM e$i")
      .mkString("\nUNION ALL ")
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS a, b.it AS b
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM pp UNION ALL SELECT b, a FROM pp),
       |${(1 to depth).map(round).mkString(",\n")},
       |counts AS ($counts),
       |lagd AS (SELECT r, n_nodes, n_edges,
       |                lag(n_edges) OVER (ORDER BY r) AS pe FROM counts)
       |SELECT CAST(r AS BIGINT) AS n_rounds, n_nodes, n_edges FROM lagd
       |WHERE pe = n_edges ORDER BY n_rounds LIMIT 1""".stripMargin
  }

  /** q_components oracle: min-label propagation unrolled `depth` rounds
    * (past the graph diameter — extra rounds are no-ops at the fixed
    * point), then the component-size histogram. MATERIALIZED for the
    * same 2-references-per-round reason as the peel oracle. */
  private def componentsSql(depth: Int): String = {
    def round(i: Int): String =
      s"""l$i AS MATERIALIZED (
         |  SELECT id, min(l) AS l FROM (
         |    SELECT id, l FROM l${i - 1}
         |    UNION ALL
         |    SELECT e0.v AS id, p.l FROM e0 JOIN l${i - 1} p ON p.id = e0.u
         |  ) GROUP BY id)""".stripMargin
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
       |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
       |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
       |pp AS (SELECT a.it AS a, b.it AS b
       |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM pp UNION ALL SELECT b, a FROM pp),
       |l0 AS (SELECT DISTINCT u AS id, u AS l FROM e0),
       |${(1 to depth).map(round).mkString(",\n")},
       |comp AS (SELECT l, count(*) AS csize FROM l$depth GROUP BY l)
       |SELECT csize, count(*) AS n_components FROM comp
       |GROUP BY csize ORDER BY csize""".stripMargin
  }

  /** q_autocorr oracle: the same integer-sum ACF rearrangement, one CTE
    * per lag, with float ops only in the final division. */
  private def autocorrSql: String = {
    val lags = (1 to 7).map(k => s"lag(x, $k) OVER (ORDER BY d) AS x$k").mkString(", ")
    val ks = (1 to 7).map { k =>
      s"""k$k AS (SELECT $k AS lag, CAST(sum(x * x$k) AS BIGINT) AS p,
         |            CAST(sum(x$k) AS BIGINT) AS sh, CAST(sum(x) AS BIGINT) AS st
         |     FROM l WHERE x$k IS NOT NULL)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to 7).map(k => s"SELECT * FROM k$k").mkString(" UNION ALL ")
    s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS x
       |               FROM events GROUP BY 1),
       |l AS (SELECT d, x, $lags FROM daily),
       |base AS (SELECT count(*) AS nn, CAST(sum(x) AS BIGINT) AS s,
       |                CAST(sum(x * x) AS BIGINT) AS q FROM l),
       |$ks,
       |u AS ($unions)
       |SELECT u.lag,
       |       round(CAST(base.nn * base.nn * u.p - base.nn * base.s * (u.sh + u.st)
       |                  + (base.nn - u.lag) * base.s * base.s AS DOUBLE) /
       |             CAST(base.nn * (base.nn * base.q - base.s * base.s) AS DOUBLE), 6) AS acf
       |FROM u, base ORDER BY u.lag""".stripMargin
  }

  /** q_benford oracle: identical digit ladder and probability literals,
    * generated from the same Scala constants the engine embeds. */
  private def benfordSql: String = {
    val ladder = (13 to 1 by -1).map { k =>
      val pow = BigInt(10).pow(k).toLong
      s"WHEN c >= $pow THEN c // $pow"
    }.mkString("\n        ")
    val probs = (1 to 9).map(d =>
      s"WHEN digit = $d THEN ${java.lang.Double.toString(BenfordP(d))}")
      .mkString("CASE ", " ", " END")
    s"""WITH d AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
       |           WHERE value IS NOT NULL AND value > 0),
       |dd AS (SELECT CASE
       |        $ladder
       |        ELSE c END AS digit
       |       FROM d WHERE c > 0),
       |n AS (SELECT count(*) AS total FROM dd),
       |g AS (SELECT digit, count(*) AS n FROM dd GROUP BY 1)
       |SELECT g.digit, g.n, round(g.n::DOUBLE / n.total, 4) AS share,
       |       round($probs, 4) AS benford_p,
       |       round(g.n::DOUBLE / n.total - $probs, 4) AS deviation
       |FROM g, n ORDER BY g.digit""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q_pagerank" -> pagerankSql,
    "q_pagerank_topic" -> pagerankTopicSql,
    "q_lpa_communities" -> lpaCommunitiesSql,
    "q_shortest_paths" -> shortestPathsSql,
    "q_random_walks" -> randomWalksSql,
    // Local clustering oracle: direct a<b<c triangle enumeration over the
    // deduplicated pair list; HUGEINT product before the floor division.
    "q_local_clustering" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
        |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
        |pp AS (SELECT a.it AS src, b.it AS dst
        |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT p1.src AS a, p1.dst AS b, p2.dst AS c
        |        FROM pp p1 JOIN pp p2 ON p2.src = p1.dst
        |                   JOIN pp p3 ON p3.src = p1.src AND p3.dst = p2.dst),
        |tcnt AS (SELECT id, count(*) AS n_tri
        |         FROM (SELECT unnest([a, b, c]) AS id FROM tri) GROUP BY 1),
        |deg AS (SELECT id, count(*) AS deg FROM (
        |          SELECT src AS id FROM pp UNION ALL SELECT dst FROM pp)
        |        GROUP BY 1 HAVING count(*) >= 2)
        |SELECT d.id AS part_id, d.deg,
        |       COALESCE(t.n_tri, 0) AS n_tri,
        |       CAST((COALESCE(t.n_tri, 0)::HUGEINT * 2 * 1000000000000)
        |            // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_fp
        |FROM deg d LEFT JOIN tcnt t ON t.id = d.id
        |ORDER BY cc_fp DESC, part_id LIMIT 50""".stripMargin,
    "q_hits" -> hitsSql,
    "q_link_predict" -> linkPredictSql,
    "q_link_jaccard" -> linkJaccardSql,
    "q_pagerank_dangling" -> pagerankDanglingSql,
    // depth 208 = 13 check windows of 16: the sf0.01 graph fixes at
    // n_iters 176 (measured); the unroll reaches comfortably past it
    "q_pagerank_converged" -> pagerankConvergedSql(depth = 208, checkEvery = 16),
    // depth 14: sf0.01 converges at round 11; the unroll just needs to
    // reach PAST the fixed point, extra rounds are no-ops
    "q_kcore_converged" -> kcoreConvergedSql(k = 3, depth = 14),
    "q_ktruss" -> trussSql(k = 4, rounds = 4),
    "q_components" -> componentsSql(depth = 20),
    // incremental maintenance must land exactly where a full recompute
    // does — the oracle IS the full-graph recompute
    "q_incremental_components" -> componentsSql(depth = 20),
    // triangles are orientation-invariant, so the oracle can use the plain
    // a<b edge order: each {a<b<c} closes as (a,b)+(b,c)+(a,c) exactly once
    "q_kcore" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
        |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
        |pp AS (SELECT a.it AS a, b.it AS b
        |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS (SELECT a AS u, b AS v FROM pp UNION ALL SELECT b, a FROM pp),
        |k1 AS (SELECT u FROM e0 GROUP BY u HAVING count(*) >= 3),
        |e1 AS (SELECT e0.u, e0.v FROM e0 JOIN k1 x ON e0.u = x.u
        |       JOIN k1 y ON e0.v = y.u),
        |k2 AS (SELECT u FROM e1 GROUP BY u HAVING count(*) >= 3),
        |e2 AS (SELECT e1.u, e1.v FROM e1 JOIN k2 x ON e1.u = x.u
        |       JOIN k2 y ON e1.v = y.u),
        |k3 AS (SELECT u FROM e2 GROUP BY u HAVING count(*) >= 3),
        |e3 AS (SELECT e2.u, e2.v FROM e2 JOIN k3 x ON e2.u = x.u
        |       JOIN k3 y ON e2.v = y.u)
        |SELECT 1 AS round, count(DISTINCT u) AS n_nodes, count(*) // 2 AS n_edges FROM e1
        |UNION ALL
        |SELECT 2, count(DISTINCT u), count(*) // 2 FROM e2
        |UNION ALL
        |SELECT 3, count(DISTINCT u), count(*) // 2 FROM e3
        |ORDER BY round""".stripMargin,
    "q_triangles" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
        |             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |lok AS (SELECT bk FROM li0 GROUP BY 1 HAVING count(*) <= 1024),
        |li AS (SELECT li0.bk, li0.it FROM li0 JOIN lok ON lok.bk = li0.bk),
        |pp AS (SELECT a.it AS a, b.it AS b
        |       FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM pp e1 JOIN pp e2 ON e1.b = e2.a
        |        JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT unnest([x, y, z]) AS id FROM tri)
        |SELECT id AS part_id, count(*) AS n_tri FROM n GROUP BY 1
        |ORDER BY n_tri DESC, part_id LIMIT 40""".stripMargin,
    "q_ks_drift" ->
      """WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |            FROM events WHERE value IS NOT NULL),
        |ca AS (SELECT c, count(*) AS na FROM ev WHERE event_type = 'purchase' GROUP BY 1),
        |cb AS (SELECT c, count(*) AS nb FROM ev WHERE event_type = 'click' GROUP BY 1),
        |u AS (SELECT COALESCE(ca.c, cb.c) AS c, COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
        |      FROM ca FULL JOIN cb ON ca.c = cb.c),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM u),
        |cum AS (SELECT c, sum(na) OVER (ORDER BY c) AS cuma,
        |               sum(nb) OVER (ORDER BY c) AS cumb FROM u)
        |SELECT round(CAST(max(abs(cuma * t.tb - cumb * t.ta)) AS DOUBLE) / (t.ta * t.tb), 6) AS ks_stat,
        |       t.ta AS n_a, t.tb AS n_b
        |FROM cum, t GROUP BY t.ta, t.tb""".stripMargin,
    "q_autocorr" -> autocorrSql,
    "q_seasonal_profile" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS x
        |               FROM events GROUP BY 1),
        |dd AS (SELECT d, x, (d + 4) % 7 AS dow FROM daily),
        |prof AS (SELECT dow, CAST(sum(x) AS BIGINT) AS sx, count(*) AS nd
        |         FROM dd GROUP BY 1),
        |j AS (SELECT dd.d, dd.dow, dd.x,
        |             prof.sx::DOUBLE / prof.nd AS expected, prof.nd
        |      FROM dd JOIN prof ON prof.dow = dd.dow)
        |SELECT dow, max(nd) AS n_days, round(max(expected), 4) AS mean_count,
        |       round(min((x - expected) / expected), 4) AS worst_low_pct,
        |       round(max((x - expected) / expected), 4) AS worst_high_pct
        |FROM j GROUP BY dow ORDER BY dow""".stripMargin,
    "q_fd_check" ->
      """WITH c1 AS (SELECT count(*) AS c FROM events GROUP BY event_id),
        |c2 AS (SELECT count(*) AS c FROM events GROUP BY user_id, ts),
        |c3 AS (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber),
        |c4 AS (SELECT count(*) AS c FROM orders GROUP BY o_orderkey),
        |c5 AS (SELECT count(*) AS c FROM documents GROUP BY doc_id),
        |u AS (
        |  SELECT 'events' AS table_name, 'event_id' AS candidate_key,
        |         CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows FROM c1
        |  UNION ALL
        |  SELECT 'events', 'user_id,ts', CAST(sum(c) AS BIGINT), count(*),
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) FROM c2
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey,l_linenumber', CAST(sum(c) AS BIGINT), count(*),
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) FROM c3
        |  UNION ALL
        |  SELECT 'orders', 'o_orderkey', CAST(sum(c) AS BIGINT), count(*),
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) FROM c4
        |  UNION ALL
        |  SELECT 'documents', 'doc_id', CAST(sum(c) AS BIGINT), count(*),
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) FROM c5)
        |SELECT table_name, candidate_key, n_rows, n_keys, n_dup_rows,
        |       n_keys = n_rows AS is_key
        |FROM u ORDER BY table_name, candidate_key""".stripMargin,
    "q_ri_check" ->
      """WITH r AS (
        |  SELECT 'customer.c_nationkey -> nation.n_nationkey' AS relationship,
        |         (SELECT count(*) FROM customer) AS n_child_rows,
        |         (SELECT count(*) FROM customer c
        |          WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey -> part.p_partkey',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey -> customer.c_custkey',
        |         (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM orders o
        |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
        |SELECT relationship, n_child_rows, n_orphans, n_orphans = 0 AS intact
        |FROM r ORDER BY relationship""".stripMargin,
    "q_table_digest" ->
      """WITH ev AS (
        |  SELECT ('0x' || substr(md5(
        |    COALESCE(event_id::VARCHAR, '∅') || '|' ||
        |    COALESCE(epoch_us(ts)::VARCHAR, '∅') || '|' ||
        |    COALESCE(user_id::VARCHAR, '∅') || '|' ||
        |    COALESCE(event_type, '∅') || '|' ||
        |    COALESCE(CAST(round(value * 100) AS BIGINT)::VARCHAR, '∅') || '|' ||
        |    COALESCE(props, '∅')), 1, 15))::BIGINT AS h
        |  FROM events),
        |li AS (
        |  SELECT ('0x' || substr(md5(
        |    COALESCE(l_orderkey::VARCHAR, '∅') || '|' ||
        |    COALESCE(l_partkey::VARCHAR, '∅') || '|' ||
        |    COALESCE(l_suppkey::VARCHAR, '∅') || '|' ||
        |    COALESCE(l_linenumber::VARCHAR, '∅') || '|' ||
        |    COALESCE(CAST(round(l_quantity * 100) AS BIGINT)::VARCHAR, '∅') || '|' ||
        |    COALESCE(CAST(round(l_extendedprice * 100) AS BIGINT)::VARCHAR, '∅')), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |doc AS (
        |  SELECT ('0x' || substr(md5(
        |    COALESCE(doc_id::VARCHAR, '∅') || '|' ||
        |    COALESCE(lang, '∅') || '|' ||
        |    COALESCE(source, '∅') || '|' ||
        |    COALESCE(n_chars::VARCHAR, '∅') || '|' ||
        |    COALESCE(md5(text), '∅')), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT 'documents' AS table_name, count(*) AS n_rows, bit_xor(h) AS xor_digest FROM doc
        |UNION ALL
        |SELECT 'events', count(*), bit_xor(h) FROM ev
        |UNION ALL
        |SELECT 'lineitem', count(*), bit_xor(h) FROM li
        |ORDER BY table_name""".stripMargin,
    "q_trend_fit" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS x, count(*) AS y
        |               FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n_days,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |             CAST(sum(y*y) AS BIGINT) AS syy
        |      FROM daily GROUP BY 1),
        |f AS (SELECT event_type, n_days, sx, sy,
        |             n_days * sxy - sx * sy AS num,
        |             n_days * sxx - sx * sx AS den,
        |             n_days * syy - sy * sy AS deny
        |      FROM s)
        |SELECT event_type, n_days,
        |       round(num::DOUBLE / nullif(den, 0), 6) AS slope,
        |       round((sy - num::DOUBLE / nullif(den, 0) * sx) / n_days, 4) AS intercept,
        |       round(num::DOUBLE * num::DOUBLE / nullif(den::DOUBLE * deny::DOUBLE, 0.0), 6) AS r2
        |FROM f ORDER BY event_type""".stripMargin,
    "q_benford" -> benfordSql,
    "q_ewma_anomaly" ->
      s"""WITH c AS (SELECT event_type,
         |                 make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS b,
         |                 count(*) AS n
         |           FROM events GROUP BY 1, 2),
         |h AS (SELECT event_type, b, n,
         |             list_reverse(list(n) OVER (PARTITION BY event_type ORDER BY b
         |               ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)) AS h
         |      FROM c),
         |e AS (SELECT event_type, b, n,
         |             list_reduce(list_transform(generate_series(1, 8),
         |               i -> h[i] * ($ewmaWeightsSqlList)[i]), (a, b) -> a + b)
         |               / $ewmaWeightSumSql AS ewma
         |      FROM h WHERE len(h) = 8)
         |SELECT event_type, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts, n,
         |       round(ewma, 4) AS ewma, n > 2.0 * ewma AS is_spike
         |FROM e WHERE n > 2.0 * ewma ORDER BY 1, 2""".stripMargin,
    "q_chisq_type_hour" ->
      """WITH ev AS (SELECT event_type AS ty, hour(ts) AS hr FROM events),
        |obs AS (SELECT ty, hr, count(*) AS o FROM ev GROUP BY 1, 2),
        |rt AS (SELECT ty, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
        |ctt AS (SELECT hr, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM obs),
        |cells AS (SELECT r.ty, c.hr, r.rt, c.ct, nn.nn, COALESCE(o.o, 0) AS o
        |          FROM rt r CROSS JOIN ctt c CROSS JOIN nn
        |          LEFT JOIN obs o ON o.ty = r.ty AND o.hr = c.hr),
        |terms AS (SELECT ty, hr, (o - e) * (o - e) / e AS term FROM
        |          (SELECT ty, hr, o, rt::DOUBLE * ct / nn AS e FROM cells) x),
        |dims AS (SELECT count(DISTINCT ty) AS r, count(DISTINCT hr) AS c FROM cells),
        |agg AS (SELECT list_reduce(list(term ORDER BY ty, hr), (a, b) -> a + b) AS chi2
        |        FROM terms)
        |SELECT round(agg.chi2, 6) AS chi2,
        |       (dims.r - 1) * (dims.c - 1) AS dof,
        |       round(sqrt(agg.chi2 / (nn.nn * least(dims.r - 1, dims.c - 1))), 6) AS cramers_v
        |FROM agg, dims, nn""".stripMargin,
    "q_window_rank_suite" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |         sum(CAST(value AS DECIMAL(18,2))) AS tv
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, tv,
        |         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |         percent_rank() OVER w AS pct,
        |         cume_dist() OVER w AS cume
        |  FROM u
        |  WINDOW w AS (PARTITION BY event_type ORDER BY tv, user_id))
        |SELECT event_type, quartile, count(*) AS n_users,
        |       round(avg(pct), 4) AS avg_pct_rank,
        |       round(avg(cume), 4) AS avg_cume_dist,
        |       CAST(sum(tv) AS DOUBLE) AS quartile_value
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_partition_prune" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-10'
        |  AND strftime(ts, '%Y-%m-%d') < '2024-01-17'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_customers" ->
      """SELECT c_custkey, c_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_discount_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |                   AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1) GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.8 * avg(l_quantity)
        |                    FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
        |       round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |GROUP BY 1, 2, 3, 4, 5 HAVING sum(l_quantity) > 180
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l JOIN part p ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_window_top_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |                                     ORDER BY o_orderdate, o_orderkey
        |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS cum_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_anti_no_orders" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_open_orders" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "q_except_users" ->
      """SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,
    "q_props_extract" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_props_variant" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_union_all" ->
      """SELECT src, count(*) AS n, count(DISTINCT user_id) AS users FROM (
        |  SELECT user_id, 'click' AS src FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, 'purchase' AS src FROM events WHERE event_type = 'purchase') t
        |GROUP BY src ORDER BY src""".stripMargin,
    "q_left_join_counts" ->
      """SELECT c_custkey, coalesce(cnt, 0) AS n_pending
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt FROM orders
        |  WHERE o_orderstatus = 'P' GROUP BY 1) o
        |ON c_custkey = o_custkey ORDER BY c_custkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |       upper(substr(p_type, 1, 8)) AS type_prefix,
        |       length(replace(p_name, ' ', '')) AS name_len,
        |       concat_ws('/', p_brand, p_size) AS brand_size
        |FROM part
        |WHERE p_type LIKE '%PROMO%' OR p_type LIKE '%ECONOMY%'
        |ORDER BY p_partkey""".stripMargin,
    "q_ship_latency" ->
      """SELECT o_orderpriority,
        |       round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_days,
        |       max(date_diff('day', o_orderdate, l_shipdate)) AS max_days,
        |       count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cube_status" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q_pivot_priority" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1_urgent,
        |       CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2_high,
        |       CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3_medium,
        |       CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4_not_specified,
        |       CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_unpivot_measures" ->
      """SELECT metric, round(sum(val), 2) AS total, count(*) AS n FROM (
        |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |GROUP BY metric ORDER BY metric""".stripMargin,
    "q_above_avg_orders" ->
      """SELECT o_custkey, count(*) AS n_above, round(max(o_totalprice), 2) AS max_price
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
        |                      WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_exact_quantiles" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM lineitem),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM v),
        |q AS (SELECT p, CAST((p * n.n + 99) // 100 AS BIGINT) AS k
        |      FROM (SELECT unnest([25, 50, 75]) AS p), n)
        |SELECT q.p, q.k, r.cents FROM q JOIN r ON r.rn = q.k
        |ORDER BY q.p""".stripMargin,
    "q_psi_drift" ->
      """WITH ev AS (SELECT event_type, value, epoch_us(ts) AS us FROM events
        |            WHERE value IS NOT NULL),
        |rng AS (SELECT event_type, min(value) AS vmin, max(value) AS vmax,
        |               min(us) AS tmin, max(us) AS tmax
        |        FROM ev GROUP BY 1),
        |b AS (SELECT e.event_type,
        |             CASE WHEN e.us < r.tmin + (r.tmax - r.tmin) // 2
        |                  THEN 'ref' ELSE 'cur' END AS half,
        |             CASE WHEN r.vmax = r.vmin THEN 0
        |                  ELSE least(9, CAST(floor((e.value - r.vmin) * 10.0 /
        |                                           (r.vmax - r.vmin)) AS BIGINT))
        |             END AS bucket
        |      FROM ev e JOIN rng r USING (event_type)),
        |cnt AS (SELECT event_type, half, bucket, count(*) AS c FROM b GROUP BY 1, 2, 3),
        |n AS (SELECT event_type, half, count(*) AS n FROM b GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(0, 9)) AS bucket FROM rng),
        |sph AS (SELECT event_type, bucket, h.h AS half
        |        FROM sp, (SELECT unnest(['ref', 'cur']) AS h) h),
        |fill AS (SELECT s.event_type, s.bucket, s.half,
        |                (COALESCE(c.c, 0) + 1) * 1.0 / (COALESCE(n.n, 0) + 10) AS prop
        |         FROM sph s
        |         LEFT JOIN cnt c ON c.event_type = s.event_type
        |                        AND c.half = s.half AND c.bucket = s.bucket
        |         LEFT JOIN n ON n.event_type = s.event_type AND n.half = s.half)
        |SELECT f1.event_type,
        |       round(sum((f2.prop - f1.prop) * ln(f2.prop / f1.prop)), 6) AS psi
        |FROM fill f1 JOIN fill f2
        |  ON f1.event_type = f2.event_type AND f1.bucket = f2.bucket
        | AND f1.half = 'ref' AND f2.half = 'cur'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skyline_parts" ->
      """WITH pts AS (SELECT DISTINCT p_retailprice AS price, p_size AS size
        |             FROM part
        |             WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
        |sky AS (SELECT price, size FROM pts b
        |        WHERE NOT EXISTS (
        |          SELECT 1 FROM pts a
        |          WHERE a.price >= b.price AND a.size <= b.size
        |            AND (a.price > b.price OR a.size < b.size)))
        |SELECT p.p_partkey AS part_id, p.p_retailprice AS price,
        |       CAST(p.p_size AS BIGINT) AS size
        |FROM part p JOIN sky ON p.p_retailprice = sky.price
        |                    AND p.p_size = sky.size
        |ORDER BY price DESC, size, part_id""".stripMargin,
    "q_event_stats" ->
      """SELECT count(DISTINCT user_id) AS users, count(DISTINCT event_type) AS types,
        |       round(sum(value), 2) AS total_value, round(avg(value), 4) AS avg_value,
        |       count(*) AS n
        |FROM events""".stripMargin,
    "q_daily_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |       round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       round(sum(CASE WHEN n2.n_name = 'NATION_3'
        |                      THEN l_extendedprice * (1 - l_discount)
        |                      ELSE 0 END)
        |             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM part, lineitem, supplier, orders, customer,
        |     nation n1, nation n2, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |  AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |  AND p_type = 'PROMO'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |                             THEN l_extendedprice * (1 - l_discount)
        |                             ELSE 0 END)
        |             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |       round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS unit_cost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, s_name, unit_cost
        |FROM ps JOIN part ON partkey = p_partkey
        |        JOIN supplier ON suppkey = s_suppkey
        |WHERE p_type = 'PROMO'
        |  AND unit_cost = (SELECT min(unit_cost) FROM ps ps2
        |                   WHERE ps2.partkey = ps.partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |                - CAST(0.6 AS DECIMAL(18,1))
        |                  * CAST(p_retailprice AS DECIMAL(18,2))
        |                  * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey AS partkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type IN ('LARGE', 'SMALL') GROUP BY 1)
        |SELECT partkey, qty FROM pv
        |WHERE qty * 700 > (SELECT sum(qty) FROM pv)
        |ORDER BY qty DESC, partkey""".stripMargin,
    "q12_latency_priority" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
        |            THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |           AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_size IN (1, 7, 14, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH sq AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |         sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO' GROUP BY 1, 2)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM sq JOIN supplier ON sk = s_suppkey
        |WHERE q * 6 > (SELECT sum(q) FROM sq sq2 WHERE sq2.pk = sq.pk)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH ll AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |         max(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
        |             THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F' GROUP BY 1, 2)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM ll l1 JOIN supplier ON l1.sk = s_suppkey
        |WHERE l1.late = 1
        |  AND EXISTS (SELECT 1 FROM ll l2
        |              WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM ll l3
        |                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late = 1)
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,
    "q_incremental_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |       round(sum(value), 2) AS total_value,
        |       round(min(value), 4) AS min_value,
        |       round(max(value), 4) AS max_value,
        |       round(round(sum(value), 2) / count(*), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_incremental_join" ->
      """SELECT n_name, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact recompute: every per-day distinct count is below k=512 at
    // sf0.01, where the KMV estimate is the retained-hash count itself
    "q_incremental_sketch" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       round(CAST(count(DISTINCT user_id) AS DOUBLE), 2) AS est_users
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_cardinality" ->
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
        |SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |       CAST(sum(c * c) AS BIGINT) AS selfjoin_rows,
        |       CAST(max(c * c) AS BIGINT) AS max_key_rows,
        |       round(sum(c * c) * 1.0 / sum(c), 4) AS amplification
        |FROM c""".stripMargin,
    "q_asof_last_order" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, o.o_orderkey AS last_orderkey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q_interval_join" ->
      """SELECT e.event_id, count(*) AS n_nearby_clicks
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id AND c.event_type = 'click'
        | AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts + INTERVAL 10 MINUTE
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "q_rollup_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_profile_events" -> profileEventsSql,
    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN t1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN t2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM t1) AS n_view,
        |       (SELECT count(*) FROM t2) AS n_view_click,
        |       (SELECT count(*) FROM t3) AS n_view_click_purchase""".stripMargin,
    "q_fuzzy_name_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part
        |           WHERE p_name IS NOT NULL AND len(p_name) >= 3)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "q_funnel_windowed" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN t1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > t1.t1
        |         AND epoch_us(e.ts) <= epoch_us(t1.t1) + 172800000000
        |       GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN t2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        |         AND epoch_us(e.ts) <= epoch_us(t2.t2) + 172800000000
        |       GROUP BY 1)
        |SELECT (SELECT count(*) FROM t1) AS n_view,
        |       (SELECT count(*) FROM t2) AS n_view_click,
        |       (SELECT count(*) FROM t3) AS n_view_click_purchase""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
        |            FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
        |SELECT cohort_week,
        |       CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_active
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // exact-below-k KMV contract: at the oracle scale every (cohort,
    // offset) group has < 4096 distinct users, so the sketch path's
    // n_active is bit-for-bit this exact count
    "q_cohort_retention_kmv" ->
      """WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
        |            FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
        |SELECT cohort_week,
        |       CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_active
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sampled_quantiles" ->
      """WITH h AS (SELECT event_type, value, md5(event_id::VARCHAR) AS hx
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, value,
        |             row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn
        |      FROM h),
        |smp AS (SELECT event_type, list_sort(list(value)) AS s
        |        FROM r WHERE rn <= 128 GROUP BY event_type)
        |SELECT event_type, CAST(len(s) AS INT) AS n_sample,
        |       round(s[GREATEST(1, CAST(ceil(0.5 * len(s)) AS INT))], 4) AS p50_est,
        |       round(s[GREATEST(1, CAST(ceil(0.9 * len(s)) AS INT))], 4) AS p90_est
        |FROM smp ORDER BY event_type""".stripMargin,
    "q_approx_distinct" ->
      """SELECT count(DISTINCT user_id) AS n_users_exact,
        |       count(DISTINCT event_type) AS n_types_exact,
        |       TRUE AS users_bounded, TRUE AS types_bounded
        |FROM events""".stripMargin,
    "q_decayed_counts" ->
      """WITH mx AS (SELECT max(epoch_us(ts) // 86400000000) AS dmax
        |            FROM events WHERE ts IS NOT NULL),
        |b AS (SELECT event_type,
        |             least(mx.dmax - epoch_us(ts) // 86400000000, 62) AS age_d,
        |             count(*) AS cnt
        |      FROM events, mx WHERE ts IS NOT NULL GROUP BY 1, 2),
        |t2 AS (SELECT event_type, age_d, cnt,
        |              cnt::DOUBLE / ((1::BIGINT << age_d::INTEGER)::DOUBLE) AS term
        |       FROM b)
        |SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
        |       round(list_reduce(list(term ORDER BY age_d), (a, b) -> a + b), 6)
        |         AS decayed
        |FROM t2 GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type, substr(md5(user_id::VARCHAR), 1, 16) AS hx
        |           FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hx,
        |             row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn,
        |             count(*) OVER (PARTITION BY event_type) AS nd
        |      FROM h),
        |est AS (SELECT event_type,
        |               CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
        |                    ELSE 63.0 * 18446744073709551616.0 /
        |                         (('0x' || max(CASE WHEN rn = 64 THEN hx END))::UBIGINT::DOUBLE)
        |               END AS kmv
        |        FROM r WHERE rn <= 64 GROUP BY event_type),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
        |SELECT e.event_type, ex.n_exact, round(e.kmv, 2) AS kmv_users
        |FROM est e JOIN ex ON e.event_type = ex.event_type
        |ORDER BY e.event_type""".stripMargin,
    "q_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, u >> 58 AS j,
        |             CASE WHEN (u & 288230376151711743) = 0 THEN 59
        |                  ELSE 59 - len(bin(u & 288230376151711743)) END AS rank
        |      FROM h),
        |regs AS (SELECT event_type, j, max(rank) AS mj FROM r GROUP BY 1, 2),
        |agg AS (SELECT event_type,
        |               CAST(sum(CAST(1 AS BIGINT) << (63 - mj)) AS DECIMAL(38,0))
        |                 + CAST(64 - count(*) AS DECIMAL(38,0)) * 9223372036854775808
        |                 AS s_int,
        |               64 - count(*) AS v
        |        FROM regs GROUP BY 1),
        |est AS (SELECT event_type,
        |               0.709::DOUBLE * 64.0 * 64.0 * 9223372036854775808.0
        |                 / s_int::DOUBLE AS raw, v
        |        FROM agg),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |       FROM events GROUP BY 1)
        |SELECT e.event_type, ex.n_exact,
        |       round(CASE WHEN e.raw <= 160 AND e.v > 0
        |                  THEN 64.0 * ln(64.0 / e.v) ELSE e.raw END, 4)
        |         AS hll_users
        |FROM est e JOIN ex ON e.event_type = ex.event_type
        |ORDER BY e.event_type""".stripMargin,
    "q_hll_merge" ->
      """WITH h AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, day, u >> 58 AS j,
        |             CASE WHEN (u & 288230376151711743) = 0 THEN 59
        |                  ELSE 59 - len(bin(u & 288230376151711743)) END AS rank
        |      FROM h),
        |regs_day AS (SELECT event_type, day, j, max(rank) AS mj
        |             FROM r GROUP BY 1, 2, 3),
        |regs_m AS (SELECT event_type, j, max(mj) AS mj FROM regs_day GROUP BY 1, 2),
        |regs_d AS (SELECT event_type, j, max(rank) AS mj FROM r GROUP BY 1, 2),
        |agg_m AS (SELECT event_type,
        |                 CAST(sum(CAST(1 AS BIGINT) << (63 - mj)) AS DECIMAL(38,0))
        |                   + CAST(64 - count(*) AS DECIMAL(38,0)) * 9223372036854775808
        |                   AS s_int,
        |                 64 - count(*) AS v
        |          FROM regs_m GROUP BY 1),
        |agg_d AS (SELECT event_type,
        |                 CAST(sum(CAST(1 AS BIGINT) << (63 - mj)) AS DECIMAL(38,0))
        |                   + CAST(64 - count(*) AS DECIMAL(38,0)) * 9223372036854775808
        |                   AS s_int,
        |                 64 - count(*) AS v
        |          FROM regs_d GROUP BY 1),
        |est_m AS (SELECT event_type,
        |                 0.709::DOUBLE * 64.0 * 64.0 * 9223372036854775808.0
        |                   / s_int::DOUBLE AS raw, v
        |          FROM agg_m),
        |est_d AS (SELECT event_type,
        |                 0.709::DOUBLE * 64.0 * 64.0 * 9223372036854775808.0
        |                   / s_int::DOUBLE AS raw, v
        |          FROM agg_d)
        |SELECT m.event_type,
        |       round(CASE WHEN m.raw <= 160 AND m.v > 0
        |                  THEN 64.0 * ln(64.0 / m.v) ELSE m.raw END, 4)
        |         AS hll_merged,
        |       round(CASE WHEN d.raw <= 160 AND d.v > 0
        |                  THEN 64.0 * ln(64.0 / d.v) ELSE d.raw END, 4)
        |         AS hll_direct
        |FROM est_m m JOIN est_d d ON m.event_type = d.event_type
        |ORDER BY m.event_type""".stripMargin,
    "q_cms_merge" ->
      """WITH ev AS (SELECT event_type, user_id::VARCHAR AS v FROM events
        |            WHERE user_id IS NOT NULL),
        |g AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cells AS (SELECT g.r AS r,
        |                 ('0x' || substr(md5(g.r::VARCHAR || ':' || ev.v), 1, 4))::INTEGER % 256 AS b,
        |                 ev.event_type, count(*) AS c
        |          FROM ev CROSS JOIN g GROUP BY 1, 2, 3),
        |idx AS (SELECT rr.r, bb.b FROM (SELECT unnest(generate_series(0, 3)) AS r) rr
        |        CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) bb),
        |merged AS (SELECT idx.r, idx.b,
        |                  COALESCE((SELECT CAST(sum(c) AS BIGINT) FROM cells
        |                            WHERE cells.r = idx.r AND cells.b = idx.b), 0) AS mc
        |           FROM idx),
        |gl AS (SELECT idx.r, idx.b,
        |                COALESCE((SELECT CAST(sum(c) AS BIGINT) FROM cells
        |                          WHERE cells.r = idx.r AND cells.b = idx.b), 0) AS gc
        |       FROM idx)
        |SELECT count(*) AS n_cells,
        |       CAST(sum(CASE WHEN m.mc = g2.gc THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
        |       CAST(sum(m.mc) AS BIGINT) AS merged_mass,
        |       CAST(sum(g2.gc) AS BIGINT) AS global_mass
        |FROM merged m JOIN gl g2 ON g2.r = m.r AND g2.b = m.b""".stripMargin,
    "q_cms_topk" ->
      """WITH ev AS (SELECT user_id::VARCHAR AS v FROM events WHERE user_id IS NOT NULL),
        |g AS (SELECT unnest(generate_series(0, 3)) AS i),
        |bkt AS (SELECT g.i AS i,
        |               ('0x' || substr(md5(g.i::VARCHAR || ':' || ev.v), 1, 4))::INTEGER % 256 AS b,
        |               count(*) AS c
        |        FROM ev CROSS JOIN g GROUP BY 1, 2),
        |exact AS (SELECT v, count(*) AS exact_n FROM ev GROUP BY 1
        |          ORDER BY exact_n DESC, v::BIGINT LIMIT 20),
        |est AS (SELECT e.v, e.exact_n, min(k.c) AS cms_est
        |        FROM exact e JOIN bkt k
        |          ON k.b = ('0x' || substr(md5(k.i::VARCHAR || ':' || e.v), 1, 4))::INTEGER % 256
        |        GROUP BY 1, 2)
        |SELECT v::BIGINT AS user_id, exact_n, cms_est, cms_est - exact_n AS overcount
        |FROM est ORDER BY exact_n DESC, user_id""".stripMargin,
    "q_hopping_window" ->
      """SELECT strftime(make_timestamp((epoch_us(ts) // 900000000) * 900000000
        |                               - k.k * 900000000),
        |                '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n
        |FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_session_paths" ->
      """WITH x AS (SELECT user_id, event_id, event_type, ts,
        |                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                          ORDER BY ts, event_id) AS prev_us
        |           FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL
        |                       OR epoch_us(ts) - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS new_s FROM x),
        |z AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sess_id
        |      FROM y),
        |p AS (SELECT user_id, sess_id,
        |             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |      FROM z GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 15""".stripMargin,
    "q_snapshot_diff" ->
      """WITH oldv AS (SELECT c_custkey AS cust_id, c_mktsegment AS segment,
        |                     c_acctbal AS acctbal FROM customer),
        |newv AS (
        |  SELECT c_custkey AS cust_id,
        |         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
        |              ELSE c_mktsegment END AS segment,
        |         c_acctbal AS acctbal
        |  FROM customer WHERE c_custkey % 11 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'NEWSEG', c_acctbal
        |  FROM customer WHERE c_custkey % 13 = 0),
        |j AS (SELECT coalesce(o.cust_id, n.cust_id) AS cust_id,
        |             o.cust_id IS NOT NULL AS in_old,
        |             n.cust_id IS NOT NULL AS in_new,
        |             o.segment AS old_segment, o.acctbal AS old_acctbal,
        |             n.segment AS new_segment, n.acctbal AS new_acctbal
        |      FROM oldv o FULL OUTER JOIN newv n ON o.cust_id = n.cust_id)
        |SELECT cust_id,
        |       CASE WHEN NOT in_old THEN 'inserted'
        |            WHEN NOT in_new THEN 'deleted'
        |            WHEN old_segment IS DISTINCT FROM new_segment
        |              OR old_acctbal IS DISTINCT FROM new_acctbal
        |            THEN 'changed' END AS change_type,
        |       old_segment, old_acctbal, new_segment, new_acctbal
        |FROM j
        |WHERE (NOT in_old) OR (NOT in_new)
        |   OR old_segment IS DISTINCT FROM new_segment
        |   OR old_acctbal IS DISTINCT FROM new_acctbal
        |ORDER BY cust_id""".stripMargin,
    "q_top_customers" ->
      """SELECT c_nationkey, CAST(rank AS INT) AS rank, c_custkey, acctbal
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal AS acctbal,
        |             row_number() OVER (PARTITION BY c_nationkey
        |                                ORDER BY c_acctbal DESC, c_custkey) AS rank
        |      FROM customer) t
        |WHERE rank <= 3 ORDER BY c_nationkey, rank""".stripMargin,
    "q_value_buckets" ->
      """WITH h AS (SELECT value, md5(event_id::VARCHAR) AS hx
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT value, row_number() OVER (ORDER BY hx) AS rn FROM h),
        |smp AS (SELECT list_sort(list(value)) AS s FROM r WHERE rn <= 1024),
        |b AS (SELECT s[GREATEST(1, CAST(ceil(0.25 * len(s)) AS INT))] AS q1,
        |             s[GREATEST(1, CAST(ceil(0.5 * len(s)) AS INT))] AS q2,
        |             s[GREATEST(1, CAST(ceil(0.75 * len(s)) AS INT))] AS q3
        |      FROM smp),
        |t AS (SELECT e.value,
        |             CASE WHEN e.value <= b.q1 THEN 0
        |                  WHEN e.value <= b.q2 THEN 1
        |                  WHEN e.value <= b.q3 THEN 2 ELSE 3 END AS bucket
        |      FROM events e CROSS JOIN b WHERE e.value IS NOT NULL)
        |SELECT bucket, count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_value_outliers" ->
      """WITH h AS (SELECT event_type, value, md5(event_id::VARCHAR) AS hx
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, value,
        |             row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn
        |      FROM h),
        |smp AS (SELECT event_type, list_sort(list(value)) AS s
        |        FROM r WHERE rn <= 512 GROUP BY event_type),
        |f AS (SELECT event_type,
        |             s[GREATEST(1, CAST(ceil(0.25 * len(s)) AS INT))] AS q1,
        |             s[GREATEST(1, CAST(ceil(0.75 * len(s)) AS INT))] AS q3
        |      FROM smp),
        |g AS (SELECT event_type, q1, q3,
        |             q3 + 1.5 * (q3 - q1) AS hi_fence,
        |             q1 - 1.5 * (q3 - q1) AS lo_fence
        |      FROM f),
        |e AS (SELECT ev.event_type, ev.value,
        |             (ev.value > g.hi_fence OR ev.value < g.lo_fence) AS is_out
        |      FROM events ev JOIN g ON ev.event_type = g.event_type
        |      WHERE ev.value IS NOT NULL)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       max(CASE WHEN is_out THEN value END) AS max_outlier
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_attribution_linear" ->
      """WITH touches AS (SELECT user_id, ts AS t_ts, event_type AS touch
        |                 FROM events WHERE event_type IN ('view', 'click')),
        |p AS (SELECT event_id, user_id, ts AS p_ts, value FROM events
        |      WHERE event_type = 'purchase' AND value IS NOT NULL),
        |j AS (SELECT p.event_id, t.touch, p.value,
        |             count(*) OVER (PARTITION BY p.event_id) AS n_t
        |      FROM p JOIN touches t ON p.user_id = t.user_id
        |       AND t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY)
        |SELECT touch AS channel, count(*) AS n_touches,
        |       CAST(sum(CAST(floor(value * 1000000 / n_t) AS BIGINT)) AS BIGINT)
        |         AS rev_micro
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_attribution" ->
      """WITH touches AS (SELECT user_id, ts, max(event_type) AS touch
        |                 FROM events WHERE event_type IN ('view', 'click')
        |                 GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'purchase'),
        |m AS (SELECT p.event_id, p.ts, p.value,
        |             max(t.ts) AS touch_ts, max_by(t.touch, t.ts) AS touch
        |      FROM p LEFT JOIN touches t
        |        ON p.user_id = t.user_id AND t.ts <= p.ts
        |      GROUP BY 1, 2, 3),
        |c AS (SELECT CASE WHEN touch_ts IS NOT NULL
        |                   AND touch_ts >= ts - INTERVAL 7 DAY
        |                  THEN touch ELSE 'none' END AS channel, value
        |      FROM m)
        |SELECT channel, count(*) AS n_purchases, round(sum(value), 2) AS revenue
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder_buckets" ->
      """WITH d AS (SELECT o_orderkey, o_custkey,
        |                  date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS dday
        |           FROM orders),
        |s1 AS (SELECT *, (o_custkey & 65535) AS xm, (dday & 65535) AS ym FROM d),
        |s2 AS (SELECT *, ((xm | (xm << 8)) & 16711935) AS xa,
        |                 ((ym | (ym << 8)) & 16711935) AS ya FROM s1),
        |s3 AS (SELECT *, ((xa | (xa << 4)) & 252645135) AS xb,
        |                 ((ya | (ya << 4)) & 252645135) AS yb FROM s2),
        |s4 AS (SELECT *, ((xb | (xb << 2)) & 858993459) AS xc,
        |                 ((yb | (yb << 2)) & 858993459) AS yc FROM s3),
        |s5 AS (SELECT *, ((xc | (xc << 1)) & 1431655765) AS xd,
        |                 ((yc | (yc << 1)) & 1431655765) AS yd FROM s4),
        |z AS (SELECT o_orderkey, o_custkey, dday, (xd | (yd << 1)) AS zv FROM s5),
        |h AS (SELECT zv, md5(o_orderkey::VARCHAR) AS hx FROM z),
        |r AS (SELECT zv, row_number() OVER (ORDER BY hx) AS rn FROM h),
        |smp AS (SELECT list_sort(list(zv::DOUBLE)) AS s FROM r WHERE rn <= 1024),
        |bl AS (SELECT list_transform(range(1, 16), i ->
        |                s[GREATEST(1, CAST(ceil(i / 16.0 * len(s)) AS INT))]) AS l
        |       FROM smp),
        |b AS (SELECT z.*,
        |             CAST(1 + len(list_filter(bl.l, x -> x < z.zv::DOUBLE)) AS INT)
        |               AS bucket
        |      FROM z CROSS JOIN bl)
        |SELECT bucket, count(*) AS n,
        |       min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
        |       min(dday) AS min_day, max(dday) AS max_day
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_hour" ->
      """SELECT event_id, event_type,
        |       count(*) OVER w AS n_1h,
        |       round(sum(value) OVER w, 4) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_basket_pairs" ->
      """WITH items0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |                FROM lineitem
        |                WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ok AS (SELECT bk FROM items0 GROUP BY 1 HAVING count(*) <= 1024),
        |items AS (SELECT i.* FROM items0 i JOIN ok USING (bk)),
        |pairs AS (SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_ab
        |          FROM items a JOIN items b
        |            ON a.bk = b.bk AND a.it < b.it
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |ic AS (SELECT it, count(*) AS n FROM items GROUP BY 1),
        |tot AS (SELECT count(DISTINCT bk) AS n_baskets FROM items)
        |SELECT item_a, item_b, n_ab,
        |       round(n_ab::DOUBLE * n_baskets::DOUBLE /
        |             (ia.n::DOUBLE * ib.n::DOUBLE), 6) AS lift
        |FROM pairs JOIN ic ia ON pairs.item_a = ia.it
        |           JOIN ic ib ON pairs.item_b = ib.it
        |           CROSS JOIN tot
        |ORDER BY n_ab DESC, item_a, item_b LIMIT 20""".stripMargin,
    "q_item_similarity" ->
      """WITH items0 AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |                FROM lineitem
        |                WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ok AS (SELECT bk FROM items0 GROUP BY 1 HAVING count(*) <= 1024),
        |items AS (SELECT i.* FROM items0 i JOIN ok USING (bk)),
        |pairs AS (SELECT a.it AS ia, b.it AS ib, count(*) AS n_ab
        |          FROM items a JOIN items b
        |            ON a.bk = b.bk AND a.it < b.it
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT it, count(*) AS n FROM items GROUP BY 1),
        |sym AS (SELECT ia AS item, ib AS nb, n_ab FROM pairs
        |        UNION ALL SELECT ib, ia, n_ab FROM pairs),
        |scored AS (SELECT s.item, s.nb,
        |                  s.n_ab::DOUBLE / sqrt(da.n::DOUBLE * db.n::DOUBLE) AS c
        |           FROM sym s JOIN deg da ON s.item = da.it
        |                      JOIN deg db ON s.nb = db.it),
        |rk AS (SELECT item, nb, c,
        |              row_number() OVER (PARTITION BY item
        |                ORDER BY c DESC, nb) AS rank
        |       FROM scored)
        |SELECT item, CAST(rank AS BIGINT) AS rank, nb AS neighbor,
        |       round(c, 6) AS cos
        |FROM rk WHERE rank <= 5 ORDER BY item, rank LIMIT 500""".stripMargin,
    "q_ts_resample" ->
      """WITH obs AS (
        |  SELECT event_type,
        |         make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b,
        |         round(avg(value), 6) AS v_obs
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1),
        |spine AS (SELECT event_type,
        |                 unnest(generate_series(lo, hi, INTERVAL 900 SECOND)) AS b
        |          FROM span),
        |j AS (SELECT s.event_type, s.b, o.v_obs
        |      FROM spine s LEFT JOIN obs o
        |        ON s.event_type = o.event_type AND s.b = o.b),
        |w AS (SELECT event_type, b, v_obs,
        |        last_value(v_obs IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY b
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
        |        first_value(v_obs IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY b
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
        |        last_value(CASE WHEN v_obs IS NOT NULL THEN b END IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY b
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |        first_value(CASE WHEN v_obs IS NOT NULL THEN b END IGNORE NULLS) OVER
        |          (PARTITION BY event_type ORDER BY b
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn
        |      FROM j)
        |SELECT event_type, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts, v_obs,
        |       vp AS v_locf,
        |       CASE WHEN v_obs IS NOT NULL THEN v_obs
        |            WHEN vp IS NOT NULL AND vn IS NOT NULL AND tn <> tp THEN
        |              floor(round(vp * 1000000.0) +
        |                    (round(vn * 1000000.0) - round(vp * 1000000.0)) *
        |                    ((epoch_us(b) - epoch_us(tp))::DOUBLE /
        |                     (epoch_us(tn) - epoch_us(tp))::DOUBLE)
        |                    + 0.5) / 1000000.0
        |            ELSE coalesce(vp, vn) END AS v_interp
        |FROM w ORDER BY 1, 2""".stripMargin,
    "q_rfm_segments" ->
      """WITH p AS (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |anchor AS (SELECT max(epoch_us(ts)) AS t_max FROM p),
        |rfm AS (SELECT user_id, max(epoch_us(ts)) AS t_last,
        |               count(*) AS f, round(sum(value), 2) AS m
        |        FROM p GROUP BY 1),
        |rfm2 AS (SELECT user_id, (t_max - t_last) // 86400000000 AS r_days, f, m
        |         FROM rfm CROSS JOIN anchor),
        |h AS (SELECT user_id, r_days, f, m,
        |             md5(user_id::VARCHAR) AS hx FROM rfm2),
        |rr AS (SELECT r_days::DOUBLE AS v,
        |              row_number() OVER (ORDER BY hx) AS rn FROM h),
        |rf AS (SELECT f::DOUBLE AS v,
        |              row_number() OVER (ORDER BY hx) AS rn FROM h),
        |rm AS (SELECT m AS v, row_number() OVER (ORDER BY hx) AS rn FROM h),
        |bs AS (SELECT
        |  (SELECT list_sort(list(v)) FROM rr WHERE rn <= 512) AS rs,
        |  (SELECT list_sort(list(v)) FROM rf WHERE rn <= 512) AS fs,
        |  (SELECT list_sort(list(v)) FROM rm WHERE rn <= 512) AS ms),
        |b AS (SELECT
        |  rs[GREATEST(1, CAST(ceil(0.3333333333333333 * len(rs)) AS INT))] AS r1,
        |  rs[GREATEST(1, CAST(ceil(0.6666666666666666 * len(rs)) AS INT))] AS r2,
        |  fs[GREATEST(1, CAST(ceil(0.3333333333333333 * len(fs)) AS INT))] AS f1,
        |  fs[GREATEST(1, CAST(ceil(0.6666666666666666 * len(fs)) AS INT))] AS f2,
        |  ms[GREATEST(1, CAST(ceil(0.3333333333333333 * len(ms)) AS INT))] AS m1,
        |  ms[GREATEST(1, CAST(ceil(0.6666666666666666 * len(ms)) AS INT))] AS m2
        |  FROM bs),
        |seg AS (SELECT
        |  'R' || CAST(CASE WHEN r_days::DOUBLE <= r1 THEN 1
        |                   WHEN r_days::DOUBLE <= r2 THEN 2 ELSE 3 END AS VARCHAR) ||
        |  'F' || CAST(CASE WHEN f::DOUBLE <= f1 THEN 1
        |                   WHEN f::DOUBLE <= f2 THEN 2 ELSE 3 END AS VARCHAR) ||
        |  'M' || CAST(CASE WHEN m <= m1 THEN 1
        |                   WHEN m <= m2 THEN 2 ELSE 3 END AS VARCHAR) AS segment,
        |  m
        |  FROM rfm2 CROSS JOIN b)
        |SELECT segment, count(*) AS n_users, round(sum(m), 2) AS revenue
        |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_corr" ->
      """WITH ev AS (SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b,
        |                   event_type
        |            FROM events),
        |c AS (SELECT b,
        |             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |      FROM ev GROUP BY 1),
        |span AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 900 SECOND)) AS b
        |          FROM span),
        |d AS (SELECT s.b, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
        |      FROM spine s LEFT JOIN c USING (b)),
        |wnd AS (SELECT b,
        |               count(*) OVER w AS n,
        |               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |               sum(x * y) OVER w AS sxy,
        |               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        |        FROM d
        |        WINDOW w AS (ORDER BY b ROWS BETWEEN 95 PRECEDING AND CURRENT ROW))
        |SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
        |       round(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |                  THEN (n * sxy - sx * sy)::DOUBLE /
        |                       (sqrt((n * sxx - sx * sx)::DOUBLE) *
        |                        sqrt((n * syy - sy * sy)::DOUBLE))
        |             END, 6) AS corr_24h
        |FROM wnd WHERE n = 96 ORDER BY 1""".stripMargin,
    "q_key_gini" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
        |r AS (SELECT c, l_orderkey,
        |             row_number() OVER (ORDER BY c, l_orderkey) AS i FROM c)
        |SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |       round(2.0 * sum(i * c)::DOUBLE /
        |               (count(*)::DOUBLE * sum(c)::DOUBLE) -
        |             (count(*) + 1)::DOUBLE / count(*)::DOUBLE, 6) AS gini
        |FROM r""".stripMargin,
    "q_sliding_distinct" ->
      """WITH h AS (SELECT DISTINCT
        |             make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b,
        |             substr(md5(user_id::VARCHAR), 1, 16) AS hx
        |           FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT b, hx, row_number() OVER (PARTITION BY b ORDER BY hx) AS rn
        |      FROM h),
        |sk AS (SELECT b, hx FROM r WHERE rn <= 64),
        |ne AS (SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b,
        |              count(*) AS n_events
        |       FROM events GROUP BY 1),
        |u AS (SELECT DISTINCT t.b AS tb, s.hx
        |      FROM (SELECT DISTINCT b FROM sk) t JOIN sk s
        |        ON s.b <= t.b AND s.b >= t.b - INTERVAL 45 MINUTE),
        |r2 AS (SELECT tb, hx,
        |              row_number() OVER (PARTITION BY tb ORDER BY hx) AS rn,
        |              count(*) OVER (PARTITION BY tb) AS nd
        |       FROM u),
        |est AS (SELECT tb,
        |               CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
        |                    ELSE 63.0 * 18446744073709551616.0 /
        |                         (('0x' || max(CASE WHEN rn = 64 THEN hx END))::UBIGINT::DOUBLE)
        |               END AS e
        |        FROM r2 WHERE rn <= 64 GROUP BY tb)
        |SELECT strftime(e2.tb, '%Y-%m-%d %H:%M:%S') AS bucket_ts, ne.n_events,
        |       round(e2.e, 2) AS est_hour_users
        |FROM est e2 JOIN ne ON e2.tb = ne.b
        |ORDER BY 1""".stripMargin,
    // same two-stage sampling the engine runs: per-bucket k-min pair
    // sample, window merge re-ranked to k, then the ceil(p*m) rule
    "q_sliding_quantiles" ->
      """WITH ev AS (SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b,
        |                   md5(event_id::VARCHAR) AS h, value AS v
        |            FROM events WHERE value IS NOT NULL),
        |r AS (SELECT b, h, v, row_number() OVER (PARTITION BY b ORDER BY h) AS rn FROM ev),
        |sk AS (SELECT b, h, v FROM r WHERE rn <= 64),
        |ne AS (SELECT b, count(*) AS n_events FROM ev GROUP BY 1),
        |u AS (SELECT t.b AS tb, s.h, s.v
        |      FROM (SELECT DISTINCT b FROM sk) t JOIN sk s
        |        ON s.b <= t.b AND s.b >= t.b - INTERVAL 45 MINUTE),
        |r2 AS (SELECT tb, v, row_number() OVER (PARTITION BY tb ORDER BY h) AS rn FROM u),
        |samp AS (SELECT tb, v FROM r2 WHERE rn <= 64),
        |m AS (SELECT tb, count(*) AS mm FROM samp GROUP BY 1),
        |vr AS (SELECT s.tb, s.v, row_number() OVER (PARTITION BY s.tb ORDER BY s.v) AS vr, m.mm
        |       FROM samp s JOIN m ON m.tb = s.tb),
        |q AS (SELECT tb,
        |             max(CASE WHEN vr = greatest(1, CAST(ceil(0.5 * mm) AS BIGINT)) THEN v END) AS p50,
        |             max(CASE WHEN vr = greatest(1, CAST(ceil(0.95 * mm) AS BIGINT)) THEN v END) AS p95
        |      FROM vr GROUP BY tb)
        |SELECT strftime(q.tb, '%Y-%m-%d %H:%M:%S') AS bucket_ts, ne.n_events,
        |       round(q.p50, 4) AS p50_hour, round(q.p95, 4) AS p95_hour
        |FROM q JOIN ne ON ne.b = q.tb
        |ORDER BY 1""".stripMargin,
    "q_feature_hash" ->
      """SELECT user_id,
        |       array_to_string(
        |       [CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 4 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 5 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 6 THEN 1 ELSE 0 END) AS BIGINT),
        |        CAST(sum(CASE WHEN b = 7 THEN 1 ELSE 0 END) AS BIGINT)], '|') AS features
        |FROM (SELECT user_id,
        |             ('0x' || substr(md5(event_type), 1, 4))::INTEGER % 8 AS b
        |      FROM events) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_skew_report" ->
      """WITH counts AS (SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
        |total AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |                 max(c) AS max_c FROM counts),
        |h AS (SELECT c::DOUBLE AS v, md5(l_orderkey::VARCHAR) AS hx FROM counts),
        |r AS (SELECT v, row_number() OVER (ORDER BY hx) AS rn FROM h),
        |smp AS (SELECT list_sort(list(v)) AS s FROM r WHERE rn <= 1024)
        |SELECT n_rows, n_keys,
        |       round(max_c::DOUBLE / n_rows::DOUBLE, 6) AS top_key_share,
        |       CAST(s[GREATEST(1, CAST(ceil(0.5 * len(s)) AS INT))] AS BIGINT) AS p50_count,
        |       CAST(s[GREATEST(1, CAST(ceil(0.99 * len(s)) AS INT))] AS BIGINT) AS p99_count
        |FROM total CROSS JOIN smp""".stripMargin,
    "q_rollup_chain" ->
      """SELECT strftime(ts, '%Y-%m') AS month, event_type,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_gap_incidents" ->
      """WITH obs AS (
        |  SELECT event_type,
        |         make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b,
        |         round(avg(value), 6) AS v_obs
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1),
        |spine AS (SELECT event_type,
        |                 unnest(generate_series(lo, hi, INTERVAL 900 SECOND)) AS b
        |          FROM span),
        |j AS (SELECT s.event_type, s.b, o.v_obs
        |      FROM spine s LEFT JOIN obs o
        |        ON s.event_type = o.event_type AND s.b = o.b),
        |r AS (SELECT event_type, b, v_obs,
        |             row_number() OVER (PARTITION BY event_type ORDER BY b) AS rn
        |      FROM j),
        |fl AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY b) AS rn2
        |       FROM r WHERE v_obs IS NULL),
        |g AS (SELECT event_type, rn - rn2 AS grp, count(*) AS n_buckets,
        |             strftime(min(b), '%Y-%m-%d %H:%M:%S') AS gap_start,
        |             strftime(max(b), '%Y-%m-%d %H:%M:%S') AS gap_end
        |      FROM fl GROUP BY 1, 2)
        |SELECT event_type, gap_start, gap_end, n_buckets FROM g
        |WHERE n_buckets >= 2 ORDER BY 1, 2""".stripMargin,
    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM seq
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type)::DOUBLE, 6) AS p
        |FROM c ORDER BY 1, 2""".stripMargin,
    "q_temporal_join" ->
      """WITH hist AS (
        |  SELECT c_custkey AS cust_id, c_mktsegment AS segment,
        |         DATE '2024-01-01' AS valid_from
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey AS cust_id, 'MIDMONTH' AS segment,
        |         DATE '2024-01-15' AS valid_from
        |  FROM customer WHERE c_custkey % 3 = 0),
        |dim AS (SELECT * FROM hist UNION ALL SELECT * FROM upd),
        |m AS (SELECT e.event_id, e.event_type,
        |             max_by(d.segment, d.valid_from) AS segment
        |      FROM events e LEFT JOIN dim d
        |        ON e.user_id = d.cust_id
        |       AND d.valid_from::TIMESTAMP <= e.ts
        |      GROUP BY 1, 2)
        |SELECT segment, event_type, count(*) AS n
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_scd2_merge" ->
      """WITH hist AS (
        |  SELECT c_custkey AS cust_id, c_mktsegment AS segment,
        |         c_acctbal AS acctbal, DATE '2024-01-01' AS valid_from,
        |         CAST(NULL AS DATE) AS valid_to
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey AS cust_id, 'MOVED' AS segment,
        |         c_acctbal + 50.0 AS acctbal, DATE '2024-06-01' AS uts
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal, DATE '2024-06-01'
        |  FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'NEWSEG', 0.0, DATE '2024-06-01'
        |  FROM customer WHERE c_custkey % 13 = 0),
        |app AS (
        |  SELECT u.* FROM upd u LEFT JOIN hist h ON u.cust_id = h.cust_id
        |  WHERE h.cust_id IS NULL
        |     OR u.segment IS DISTINCT FROM h.segment
        |     OR u.acctbal IS DISTINCT FROM h.acctbal),
        |closed AS (
        |  SELECT h.cust_id, h.segment, h.acctbal, h.valid_from,
        |         a.uts AS valid_to
        |  FROM hist h JOIN app a ON h.cust_id = a.cust_id),
        |still AS (
        |  SELECT h.* FROM hist h LEFT JOIN app a ON h.cust_id = a.cust_id
        |  WHERE a.cust_id IS NULL),
        |ins AS (
        |  SELECT cust_id, segment, acctbal, uts AS valid_from,
        |         CAST(NULL AS DATE) AS valid_to
        |  FROM app)
        |SELECT * FROM still UNION ALL SELECT * FROM closed
        |UNION ALL SELECT * FROM ins
        |ORDER BY cust_id, valid_from""".stripMargin,
    "q_quality_checks" ->
      """SELECT 'completeness' AS kind, 'user_id' AS col_name,
        |       round(count(user_id)::DOUBLE / count(*)::DOUBLE, 6) AS metric,
        |       0.99::DOUBLE AS threshold,
        |       (count(user_id)::DOUBLE / count(*)::DOUBLE) >= 0.99 AS passed
        |FROM events
        |UNION ALL
        |SELECT 'completeness', 'value',
        |       round(count(value)::DOUBLE / count(*)::DOUBLE, 6),
        |       0.5::DOUBLE,
        |       (count(value)::DOUBLE / count(*)::DOUBLE) >= 0.5
        |FROM events
        |UNION ALL
        |SELECT 'approx_uniqueness', 'event_id', round(e.est / c.n, 6),
        |       0.999999::DOUBLE, (e.est / c.n) >= 0.999999
        |FROM (WITH h AS (SELECT DISTINCT substr(md5(event_id::VARCHAR), 1, 16) AS hx
        |                 FROM events WHERE event_id IS NOT NULL),
        |      r AS (SELECT hx, row_number() OVER (ORDER BY hx) AS rn,
        |                   count(*) OVER () AS nd FROM h)
        |      SELECT CASE WHEN max(nd) < 1024 THEN CAST(max(nd) AS DOUBLE)
        |                  ELSE 1023.0 * 18446744073709551616.0 /
        |                       (('0x' || max(CASE WHEN rn = 1024 THEN hx END))::UBIGINT::DOUBLE)
        |             END AS est
        |      FROM r WHERE rn <= 1024) e,
        |     (SELECT count(event_id)::DOUBLE AS n FROM events) c
        |UNION ALL
        |SELECT 'approx_uniqueness', 'user_id', round(e.est / c.n, 6),
        |       0.5::DOUBLE, (e.est / c.n) >= 0.5
        |FROM (WITH h AS (SELECT DISTINCT substr(md5(user_id::VARCHAR), 1, 16) AS hx
        |                 FROM events WHERE user_id IS NOT NULL),
        |      r AS (SELECT hx, row_number() OVER (ORDER BY hx) AS rn,
        |                   count(*) OVER () AS nd FROM h)
        |      SELECT CASE WHEN max(nd) < 1024 THEN CAST(max(nd) AS DOUBLE)
        |                  ELSE 1023.0 * 18446744073709551616.0 /
        |                       (('0x' || max(CASE WHEN rn = 1024 THEN hx END))::UBIGINT::DOUBLE)
        |             END AS est
        |      FROM r WHERE rn <= 1024) e,
        |     (SELECT count(user_id)::DOUBLE AS n FROM events) c
        |UNION ALL
        |SELECT 'fraction_between', 'value',
        |       round(sum(CASE WHEN value BETWEEN -1000000.0 AND 1000000.0
        |                      THEN 1 ELSE 0 END)::DOUBLE / count(value)::DOUBLE, 6),
        |       0.999::DOUBLE,
        |       (sum(CASE WHEN value BETWEEN -1000000.0 AND 1000000.0
        |            THEN 1 ELSE 0 END)::DOUBLE / count(value)::DOUBLE) >= 0.999
        |FROM events
        |UNION ALL
        |SELECT 'fraction_in_set', 'event_type',
        |       round(sum(CASE WHEN event_type IN ('click','view','purchase','signup','error')
        |                      THEN 1 ELSE 0 END)::DOUBLE / count(event_type)::DOUBLE, 6),
        |       1.0::DOUBLE,
        |       (sum(CASE WHEN event_type IN ('click','view','purchase','signup','error')
        |            THEN 1 ELSE 0 END)::DOUBLE / count(event_type)::DOUBLE) >= 1.0
        |FROM events
        |ORDER BY 1, 2""".stripMargin,
    "q_kmv_overlap" ->
      """WITH h AS (SELECT DISTINCT event_type, substr(md5(user_id::VARCHAR), 1, 16) AS hx
        |           FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hx,
        |             row_number() OVER (PARTITION BY event_type ORDER BY hx) AS rn FROM h),
        |sk AS (SELECT event_type, list(hx ORDER BY hx) AS sk
        |       FROM r WHERE rn <= 64 GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             a.sk AS ska, b.sk AS skb,
        |             list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:64] AS u
        |      FROM sk a JOIN sk b ON a.event_type < b.event_type),
        |q AS (SELECT type_a, type_b,
        |             len(list_filter(u, x -> list_contains(ska, x)
        |                                 AND list_contains(skb, x)))::DOUBLE
        |               / len(u)::DOUBLE AS jac,
        |             CASE WHEN len(ska) < 64 THEN len(ska)::DOUBLE
        |                  ELSE 63.0 * 18446744073709551616.0 /
        |                       (('0x' || ska[64])::UBIGINT::DOUBLE) END AS ea,
        |             CASE WHEN len(skb) < 64 THEN len(skb)::DOUBLE
        |                  ELSE 63.0 * 18446744073709551616.0 /
        |                       (('0x' || skb[64])::UBIGINT::DOUBLE) END AS eb,
        |             CASE WHEN len(u) < 64 THEN len(u)::DOUBLE
        |                  ELSE 63.0 * 18446744073709551616.0 /
        |                       (('0x' || u[64])::UBIGINT::DOUBLE) END AS eu
        |      FROM p)
        |SELECT type_a, type_b, round(ea, 2) AS est_a, round(eb, 2) AS est_b,
        |       round(eu, 2) AS est_union, round(jac, 4) AS jaccard_est,
        |       round(jac * eu, 2) AS est_intersect
        |FROM q ORDER BY 1, 2""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY 1, 2""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bloom_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
