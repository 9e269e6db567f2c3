package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{KMinBuffer, KMinStrings}

class SketchSkewSpec extends SparkSpec {

  test("KMinBuffer keeps the k smallest distinct strings") {
    val buf = new KMinBuffer(3)
    Seq("d", "b", "e", "b", "a", "c", "a").foreach(buf.add)
    assert(buf.sortedAsc.toSeq == Seq("a", "b", "c"))
  }

  test("KMinBuffer merge equals single-buffer ingest and survives serde") {
    val all = (1 to 50).map(i => f"v$i%03d")
    val (l, r) = scala.util.Random.shuffle(all).splitAt(25)
    val a = new KMinBuffer(8); l.foreach(a.add)
    val b = new KMinBuffer(8); r.foreach(b.add)
    val roundTripped = KMinBuffer.fromBytes(8, b.toBytes)
    a.addAll(roundTripped)
    val whole = new KMinBuffer(8); all.foreach(whole.add)
    assert(a.sortedAsc.toSeq == whole.sortedAsc.toSeq)
  }

  test("kmin_strings is exact below k and bounded at k") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"u${i % 10}").toDF("v")
      .agg(KMinStrings.kmin_strings(col("v"), 64).as("arr"),
        KMinStrings.kmin_strings(col("v"), 4).as("arr4"))
    val row = df.head()
    assert(row.getSeq[String](0).sorted == (0 to 9).map(i => s"u$i"))
    assert(row.getSeq[String](1).size == 4)
  }

  test("KMV estimate lands within 4 standard errors of the truth") {
    import spark.implicits._
    val k = 64
    val n = 5000
    val est = (1 to n).map(i => s"user-$i").toDF("v")
      .agg(Sketch.kmvSketch(col("v"), k).as("arr"))
      .select(Sketch.kmvEstimate(col("arr"), k).as("est"))
      .head().getDouble(0)
    val se = n / math.sqrt(k - 2) // ~12.7% of n at k=64
    assert(math.abs(est - n) < 4 * se, s"estimate $est too far from $n")
  }

  test("KMV estimate is invariant to partitioning layout") {
    import spark.implicits._
    val data = (1 to 2000).map(i => s"id-${i % 700}")
    def estimate(parts: Int): Double =
      data.toDF("v").repartition(parts)
        .agg(Sketch.kmvSketch(col("v"), 32).as("arr"))
        .select(Sketch.kmvEstimate(col("arr"), 32).as("est"))
        .head().getDouble(0)
    assert(estimate(1) == estimate(13))
  }

  test("KMV set algebra is exact below k and tracks truth above it") {
    import spark.implicits._
    val k = 64
    // small sets: sketches hold everything -> union/intersection exact
    val small = (1 to 30).map(i => ("a", s"u$i")) ++
      (21 to 50).map(i => ("b", s"u$i")) // |A|=30 |B|=30 |A∩B|=10 |A∪B|=50
    val skSmall = small.toDF("g", "v").groupBy("g")
      .agg(Sketch.kmvSketch(col("v"), k).as("sk"))
    val rowS = skSmall.groupBy()
      .agg(first(when(col("g") === "a", col("sk")), ignoreNulls = true).as("ska"),
        first(when(col("g") === "b", col("sk")), ignoreNulls = true).as("skb"))
      .select(
        Sketch.kmvEstimate(Sketch.kmvMerge(col("ska"), col("skb"), k), k).as("u"),
        Sketch.kmvIntersectEstimate(col("ska"), col("skb"), k).as("i"))
      .head()
    assert(rowS.getDouble(0) == 50.0 && rowS.getDouble(1) == 10.0)

    // large sets: estimates within 4 standard errors (~13% at k=64)
    val nA = 4000; val nOverlap = 2000; val nB = 4000
    val large = (1 to nA).map(i => ("a", s"x$i")) ++
      (nA - nOverlap + 1 to nA - nOverlap + nB).map(i => ("b", s"x$i"))
    val rowL = large.toDF("g", "v").groupBy("g")
      .agg(Sketch.kmvSketch(col("v"), k).as("sk"))
      .groupBy()
      .agg(first(when(col("g") === "a", col("sk")), ignoreNulls = true).as("ska"),
        first(when(col("g") === "b", col("sk")), ignoreNulls = true).as("skb"))
      .select(
        Sketch.kmvEstimate(Sketch.kmvMerge(col("ska"), col("skb"), k), k).as("u"),
        Sketch.kmvIntersectEstimate(col("ska"), col("skb"), k).as("i"))
      .head()
    val trueUnion = nA + nB - nOverlap
    assert(math.abs(rowL.getDouble(0) - trueUnion) < 4 * trueUnion / math.sqrt(k - 2),
      s"union est ${rowL.getDouble(0)} vs $trueUnion")
    // intersection compounds union + jaccard error; allow a loose 3x band
    assert(rowL.getDouble(1) > nOverlap / 3.0 && rowL.getDouble(1) < nOverlap * 3.0,
      s"intersect est ${rowL.getDouble(1)} vs $nOverlap")
  }

  test("kmin_pairs keeps values of the k smallest hashes; sample is layout-invariant") {
    import spark.implicits._
    val rows = (1L to 3000L).map(i => (s"ev${i % 3}", i, (i % 97).toDouble))
      .toDF("g", "id", "value")
    def sample(parts: Int) = rows.repartition(parts)
      .groupBy("g")
      .agg(Sketch.hashSample(col("id"), col("value"), 32).as("smp"))
      .select(col("g"), col("smp"))
      .as[(String, Seq[Double])].collect().sortBy(_._1).toSeq
    val once = sample(1)
    assert(once == sample(13)) // pure function of the data
    assert(once.forall(_._2.size == 32))
    // below k the sample is exhaustive → quantiles exact
    val small = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "value")
      .agg(Sketch.hashSample(col("id"), col("value"), 128).as("smp"))
      .select(Sketch.sampleQuantile(col("smp"), 0.5).as("p50"),
        Sketch.sampleQuantile(col("smp"), 1.0).as("p100"))
      .head()
    assert(small.getDouble(0) == 5.0 && small.getDouble(1) == 10.0)
  }

  test("KMinPairsBuffer serde round-trips and merge equals single ingest") {
    val all = (1 to 200).map(i => (f"h$i%04d", i.toDouble))
    val (l, r) = scala.util.Random.shuffle(all).splitAt(100)
    val a = new graft.functions.KMinPairsBuffer(16)
    l.foreach { case (h, v) => a.add(h, v) }
    val b = new graft.functions.KMinPairsBuffer(16)
    r.foreach { case (h, v) => b.add(h, v) }
    a.addAll(graft.functions.KMinPairsBuffer.fromBytes(16, b.toBytes))
    val whole = new graft.functions.KMinPairsBuffer(16)
    all.foreach { case (h, v) => whole.add(h, v) }
    assert(a.valuesByHash.toSeq == whole.valuesByHash.toSeq)
    assert(a.valuesByHash.toSeq == (1 to 16).map(_.toDouble))
  }

  private def planOf(name: String): String =
    org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")).toString

  private def occurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("pair-sample merge algebra equals one-shot sampling over the union") {
    import spark.implicits._
    val k = 8
    val df = (1L to 200L).map(i => (i, i.toDouble % 37, i % 4)).toDF("id", "v", "g")
    // one-shot: sample over ALL rows
    val whole = df.agg(Sketch.pairSample(col("id"), col("v"), k).as("s"))
      .select(Sketch.pairSampleValues(col("s")).as("vs"))
      .as[Seq[Double]].head()
    // merged: per-group samples folded with pairSampleMerge
    val merged = df.groupBy("g")
      .agg(Sketch.pairSample(col("id"), col("v"), k).as("s"))
      .agg(collect_list(col("s")).as("all"))
      .select(Sketch.pairSampleValues(aggregate(col("all"),
        array().cast("array<struct<h:string,v:double>>"),
        (a, x) => Sketch.pairSampleMerge(a, x, k))).as("vs"))
      .as[Seq[Double]].head()
    assert(whole == merged && whole.size == k)
  }

  test("sample quantile over the pair sample is exact below k") {
    import spark.implicits._
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = df.agg(Sketch.pairSample(col("id"), col("v"), 64).as("s"))
      .select(
        Sketch.sampleQuantile(Sketch.pairSampleValues(col("s")), 0.5).as("p50"),
        Sketch.sampleQuantile(Sketch.pairSampleValues(col("s")), 1.0).as("p100"))
      .as[(Double, Double)].head()
    assert(r == ((5.0, 9.0)))
  }

  test("q_kmv_distinct plan keeps the sketch bounded per group") {
    val plan = planOf("q_kmv_distinct")
    // one partial + one final sketch agg, both keyed by the group column
    // alone — a (group, value) pre-agg key (the plan shape countDistinct
    // forces when it shares the sketch's aggregation) would ship one
    // buffer per distinct value across the exchange instead of <=k hashes
    // per group. The exact-count branch may keep its own (group, value)
    // pre-agg; the sketch must not ride in it.
    assert(occurrences(plan, "partial_kmin_strings") == 1, plan.take(2000))
    val offending = plan.linesIterator.filter(l =>
      l.contains("kmin_strings") && l.matches(".*keys=\\[event_type#\\d+, user_id.*"))
    assert(offending.isEmpty, offending.mkString("\n"))
  }

  test("q_sampled_quantiles plan runs the sample partially (bounded per group)") {
    val plan = planOf("q_sampled_quantiles")
    // one partial + one final kmin_pairs keyed by event_type alone: the
    // partial combine is what bounds the exchange to <=k pairs per group
    assert(occurrences(plan, "partial_kmin_pairs") == 1, plan.take(2000))
  }

  test("q_cms_topk plan combines the sketch map-side (fixed d*w state crosses)") {
    val plan = planOf("q_cms_topk")
    // one partial + one final count_min agg: each partition ships one
    // 4x256 counter array, never per-row or per-key state
    assert(occurrences(plan, "partial_count_min_longs") == 1, plan.take(2000))
  }

  test("q_table_digest plan XORs partially (one digest word per partition)") {
    val plan = planOf("q_table_digest")
    // every digest branch must partial-aggregate: the exchange carries a
    // single (count, xor) pair per partition per table, not rows
    assert(occurrences(plan, "partial_bit_xor") == 3, plan.take(3000))
  }

  test("q_top_customers plan: grouped heap runs partially, no window sort") {
    val plan = planOf("q_top_customers")
    // <=k candidates per group per partition cross the exchange; the
    // window formulation would shuffle and sort EVERY customer row
    assert(occurrences(plan, "partial_topk_by_score") == 1, plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("q_salted_join plan evaluates the salt hash once per fact row") {
    val plan = planOf("q_salted_join")
    // without KnownNotNull, InferFiltersFromConstraints duplicates the
    // pmod(xxhash64(...)) expression into a pushed-down isnotnull Filter
    assert(occurrences(plan, "xxhash64") == 1, plan.take(2000))
  }

  test("bloom-pruned semi join equals the plain semi join, prune in plan") {
    import spark.implicits._
    val fact = (1L to 3000L).map(i => (i % 500, i)).toDF("k", "payload")
    val dim = (1L to 40L).map(i => i * 7).toDF("dk") // sparse key subset
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
    val pruned = BloomJoin.semiJoinPruned(fact, dim, "k", "dk",
      expectedItems = 100L, numBits = 4096L)
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
    assert(pruned.count() == plain.count())
    // plan shape over the parquet-backed query (local Seq fixtures get
    // constant-folded by ConvertToLocalRelation, hiding the filter):
    // the bloom-probe Filter must sit BELOW the semi join, directly over
    // the fact scan — pruning before the join, not after
    val lines = planOf("q_bloom_semi_join").linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("LeftSemi"))
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    val scanIdx = lines.indexWhere(l =>
      l.contains("FileScan") && l.contains("orders.parquet"))
    assert(joinIdx >= 0 && probeIdx > joinIdx && scanIdx == probeIdx + 1,
      lines.map(_.take(120)).mkString("\n"))
  }

  test("dedup_ngram_jaccard blocks on (source, length-bin) equi-keys") {
    val plan = planOf("dedup_ngram_jaccard")
    // the candidate join must be an equi-join whose keys include the
    // width-32 length bin — source-only equi-keys would plan the length
    // band as a post-filter, making candidate generation per-source
    // all-pairs (quadratic in the dominant source at scale)
    val joinLine = plan.linesIterator.find(l =>
      l.contains("Join") && l.contains("_bin") && l.contains("_rbin"))
    assert(joinLine.isDefined, plan.take(3000))
    assert(joinLine.get.contains("source"), joinLine.get)
  }

  test("topk_by_count equals the row_number window bit-for-bit, incl. cutoff ties") {
    import spark.implicits._
    import graft.functions.TopKByCount.topk_by_count
    // engineered ties AT the k-cutoff: several keys share count 5
    val rows = (('a' to 'z').flatMap(c => Seq.fill(5)(("g1", c.toString))) ++
      (1 to 40).flatMap(i => Seq.fill(i % 7 + 1)(("g2", s"k$i"))))
      .toDF("g", "key")
    val counts = rows.groupBy("g", "key").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("n").desc, col("key"))
    val windowed = counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10).select("g", "key", "n", "rnk")
      .as[(String, String, Long, Int)].collect().toSet
    val agged = counts.groupBy("g")
      .agg(topk_by_count(struct(col("n"), col("key")), 10).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), col("col.key"), col("col.n"), (col("pos") + 1).cast("int"))
      .as[(String, String, Long, Int)].collect().toSet
    assert(agged == windowed)
  }

  test("topk_by_count buffer serde round-trips and merge equals single ingest") {
    import graft.functions.TopKCountBuffer
    val a = new TopKCountBuffer(5)
    val b = new TopKCountBuffer(5)
    val single = new TopKCountBuffer(5)
    val items = Seq((3L, "c"), (9L, "x"), (9L, "a"), (1L, "z"), (7L, "m"),
      (9L, "b"), (2L, "q"), (7L, "d"))
    items.take(4).foreach { case (n, k) => a.add(n, k) }
    items.drop(4).foreach { case (n, k) => b.add(n, k) }
    items.foreach { case (n, k) => single.add(n, k) }
    val merged = TopKCountBuffer.fromBytes(5, a.toBytes)
    merged.addAll(TopKCountBuffer.fromBytes(5, b.toBytes))
    assert(merged.ranked.toSeq == single.ranked.toSeq)
    // rank order is (count DESC, key ASC)
    assert(single.ranked.head == ((9L, "a")))
    assert(single.ranked.toSeq.take(3) == Seq((9L, "a"), (9L, "b"), (9L, "x")))
  }

  test("topk_by_count detects non-pre-aggregated input loudly") {
    import graft.functions.TopKCountBuffer
    val buf = new TopKCountBuffer(5)
    buf.add(9L, "a")
    buf.add(9L, "a") // exact duplicate stays idempotent
    assert(buf.ranked.toSeq == Seq((9L, "a")))
    // same key, different count while retained: the precondition (one
    // pre-aggregated (count, key) row per key) is provably violated
    val e = intercept[IllegalStateException](buf.add(7L, "a"))
    assert(e.getMessage.contains("pre-aggregated"))
  }

  test("txt_top_terms plans the bounded aggregate, never a vocab-wide window") {
    val plan = graft.SparkEntry.queries("txt_top_terms")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort over the vocabulary:\n${plan.take(3000)}")
    assert(plan.contains("topk_by_count"), plan.take(3000))
  }

  test("txt_zipf_fit plans the bounded aggregate, never a vocab-wide window") {
    val plan = graft.SparkEntry.queries("txt_zipf_fit")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort over the vocabulary:\n${plan.take(3000)}")
    assert(plan.contains("topk_by_count"), plan.take(3000))
  }

  test("salted equi-join equals the plain join result") {
    import spark.implicits._
    // skewed fact: key 1 carries half the rows
    val fact = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 500).map(i => ((i % 50 + 2).toLong, i.toLong + 1000)))
      .toDF("k", "payload")
    val dim = (1L to 60L).map(i => (i, s"dim-$i")).toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk",
        buckets = 8, factSaltOn = Seq("k", "payload"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
    assert(salted.count() == plain.count())
  }
}
