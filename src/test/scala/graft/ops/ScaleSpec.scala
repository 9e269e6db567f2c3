package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale mechanics: salting equivalence, compaction file counts, bucketed
  * shuffle-free joins. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("scale rehearsal replication preserves distributions, disjoint ids") {
    val src = "/root/testdata/sf0.001"
    val dst = java.nio.file.Files.createTempDirectory("rehearsal").toString
    graft.ScaleRehearsal.replicate(spark, src, dst, copies = 2)

    // counts double; ids stay unique (remapped, not duplicated)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = spark.read.parquet(s"$src/events.parquet")
    val ev2 = spark.read.parquet(s"$dst/events.parquet")
    assert(ev2.count() == 2 * ev0.count())
    assert(ev2.select("event_id").distinct().count() == ev2.count())

    // documents: per-replica token counts are preserved (suffixing tokens
    // must not change tokenization), so total tokens exactly double
    def totTokens(path: String) = spark.read.parquet(path)
      .select(sum(size(split(trim(col("text")), "\\s+")))).as[Long].head()
    assert(totTokens(s"$dst/documents.parquet") == 2 * totTokens(s"$src/documents.parquet"))
    val d2 = spark.read.parquet(s"$dst/documents.parquet")
    assert(d2.select("doc_id").distinct().count() == d2.count())
    // n_chars recomputed for the perturbed text
    assert(d2.filter(length(col("text")) =!= col("n_chars")).count() == 0)

    // embeddings: cyclic rotation preserves the norm of every replica
    def norms(path: String) = spark.read.parquet(path)
      .select(round(aggregate(transform(col("embedding").cast("array<double>"),
        x => x * x), lit(0.0), (a, x) => a + x), 6).as("n2"))
      .groupBy("n2").count().orderBy("n2")
      .as[(Double, Long)].collect().toSeq
    val base = norms(s"$src/embeddings.parquet")
    assert(norms(s"$dst/embeddings.parquet") == base.map { case (n, c) => (n, 2 * c) })

    // passthrough tables copied byte-identically
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$src/region.parquet")),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dst/region.parquet"))))
  }

  test("brute-force similarity refuses an oversized query set unless opted in") {
    val emb = (0L until 40L).map(i => (i, Array.tabulate(4)(d => (i + d).toDouble)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding",
        "vec_id", "embedding", k = 3, maxQueryRows = 16)
    }
    assert(e.getMessage.contains("acceptQuadraticCost"))
    // explicit opt-in runs the same call
    val rows = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, maxQueryRows = 16, acceptQuadraticCost = true)
    assert(rows.count() == 40 * 3)
    // under the bound: no opt-in needed
    val ok = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", "vec_id", "embedding", k = 3, maxQueryRows = 16)
    assert(ok.count() == 5 * 3)
  }

  test("every broadcast-query ANN scan refuses an oversized query set unless opted in") {
    val emb = (0L until 40L).map(i => (i, Array.tabulate(4)(d => (i + d).toDouble)))
      .toDF("vec_id", "embedding")
    val packed = emb.select(col("vec_id"),
      graft.functions.GraftFunctions.pack_i8(
        col("embedding").cast("array<double>"), lit(1.0)).as("code"))
    def trips(f: => org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("acceptQuadraticCost"))
    }
    trips(Similarity.int8TopK(packed, packed, "vec_id", "code",
      "vec_id", "code", k = 3, maxQueryRows = 16))
    trips(Similarity.binaryTopK(emb, emb, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, maxQueryRows = 16))
    trips(Similarity.pqTopK(emb, emb, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, m = 2, maxQueryRows = 16))
    trips(Similarity.mmrRerank(packed, packed, "vec_id", "code",
      "vec_id", "code", shortlist = 4, m = 2, maxQueryRows = 16))
    // explicit opt-in runs the same calls; under-bound sets need no opt-in
    assert(Similarity.int8TopK(packed, packed, "vec_id", "code",
      "vec_id", "code", k = 3, maxQueryRows = 16,
      acceptQuadraticCost = true).count() == 40 * 3)
    assert(Similarity.mmrRerank(packed, packed.filter(col("vec_id") < 5),
      "vec_id", "code", "vec_id", "code", shortlist = 4, m = 2,
      maxQueryRows = 16).count() == 5 * 2)
  }

  test("exact selection matches the sorted reference on duplicates and negatives") {
    val xs = (1 to 3000).map(i => ((i * 2654435761L) % 997) - 498)
    val df = xs.toDF("v")
    val sorted = xs.sorted
    for (k <- Seq(1, 2, 500, 1500, 2999, 3000))
      assert(Selection.kthSmallest(df, "v", k.toLong) == sorted(k - 1))
    // a tiny bucket count forces several refinement passes
    assert(Selection.kthSmallest(df, "v", 1500L, buckets = 4) == sorted(1499))
    // quantiles: k = ceil(p*n/100) order statistics, actual data values
    val qs = Selection.quantiles(df, "v", Seq(50, 100))
    assert(qs == Seq((50, 1500L, sorted(1499)), (100, 3000L, sorted(2999))))
    // the simultaneous-selector refinement is bit-equal to the
    // per-selector loop, including under forced multi-pass refinement
    val ps = Seq(25, 50, 75, 99)
    val sim = Selection.quantiles(df, "v", ps, buckets = 4)
    assert(sim == ps.map { p =>
      val k = ((BigInt(p) * 3000 + 99) / 100).toLong
      (p, k, Selection.kthSmallest(df, "v", k, buckets = 4))
    })
    intercept[IllegalArgumentException](Selection.kthSmallest(df, "v", 0L))
  }

  test("grouped exact median matches the sorted reference per group") {
    // per-group sizes both even and odd, duplicates, negatives; one
    // single-row group and one constant group (range collapses instantly)
    val rows = (1 to 701).map { i =>
      (s"g${i % 7}", ((i * 2654435761L) % 499) - 249)
    } ++ Seq(("solo", 42L), ("flat", 5L), ("flat", 5L), ("flat", 5L))
    val df = rows.toDF("g", "v")
    val got = Selection.groupedMedian(df, "g", "v", buckets = 8)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val s = vs.map(_._2).sorted
      val med2x = s((s.length - 1) / 2) + s(s.length / 2)
      assert(got(g) == (s.length.toLong, med2x),
        s"group $g: got ${got(g)}, want (${s.length}, $med2x)")
    }
    // the low-cardinality gate trips loudly
    intercept[IllegalArgumentException](
      Selection.groupedMedian(df, "v", "v", maxGroups = 3))
  }

  test("BPE-ish subword count: letter runs, digit runs, punctuation marks") {
    val got = Seq("hello, world42 x-ray").toDF("t")
      .select(graft.ops.TextAnalysis.subwordCount(col("t"))).as[Int].head()
    // [hello][,][world][42][x][-][ray] = 7
    assert(got == 7)
  }

  test("salted aggregation equals direct aggregation (skew-safe)") {
    // 90% of rows share one hot key
    val df = (1 to 2000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble))
      .toDF("key", "value")
    val direct = df.groupBy("key")
      .agg(sum("value").as("total"), count(lit(1)).as("n"))
      .orderBy("key").as[(String, Double, Long)].collect().toSeq
    val salted = Scale.saltedSumCount(df, col("key"), col("value"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    assert(salted.map(r => (r._1, r._2, r._3)) == direct)
  }

  test("compaction controls output file count") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/out"
    val df = spark.range(0, 10000).toDF("id")
    Scale.compactWrite(df, dir, targetFiles = 4, maxRecordsPerFile = 5000)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 4)
  }

  test("sorted layout: each output file covers a narrow key range") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/out"
    val df = spark.range(0, 100000).toDF("id")
      .withColumn("shuffled", col("id") * 48271 % 100000) // scrambled key
    Scale.sortedLayoutWrite(df, dir, partitions = 8, sortCols = Seq("shuffled"))
    // every file's (min,max) span must be ~1/8 of the domain, not ~all of it
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg((fmax("shuffled") - fmin("shuffled")).as("span"))
      .select("span").as[Long].collect()
    assert(spans.length == 8)
    assert(spans.forall(_ < 100000 / 4), s"file spans too wide: ${spans.toSeq}")
    // and the data survives intact
    assert(spark.read.parquet(dir).count() == 100000)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh != null)
    val a = spark.range(0, 1000).toDF("id").withColumn("va", col("id") * 2)
    val b = spark.range(0, 1000).toDF("id").withColumn("vb", col("id") * 3)
    Scale.writeBucketed(a, "bkt_a", "id", 8)
    Scale.writeBucketed(b, "bkt_b", "id", 8)
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
