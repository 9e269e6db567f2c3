package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.config.PipelineConfig

final case class TestEnvelope(partitionKey: String, sequenceNumber: String,
                              data: Array[Byte])

final case class DimUpdate(cust_id: Long, tier: String, uts: java.sql.Date)

final case class IncomingDoc(doc_id: Long, text: String)

/** Streaming semantics (SURVEY.md §2.6): micro-batch boundaries, replayed
  * duplicates, watermark-bounded dedup state, windowed rollups. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def log(id: Int, ts: String = "2020-09-15T10:21:33Z", typ: String = "nginx") =
    s"""{"log_type":"$typ","time":"$ts","log_id":"id-$id"}"""

  private def env(i: Int, payload: String) =
    TestEnvelope(s"pk-$i", s"seq-$i", payload.getBytes(UTF_8))

  test("streaming pipeline: two micro-batches through decode/route/sinks") {
    val dir = Files.createTempDirectory("stream").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEnvelope]
    val q = StreamingPipeline.run(mem.toDF(), cfg,
      graft.Pipeline.fileTransport(s"$dir/bulk"), s"$dir/ckpt",
      Trigger.ProcessingTime(0))
    try {
      mem.addData(env(1, log(1)), env(2, log(2)), env(3, "busted"))
      q.processAllAvailable()
      mem.addData(env(4, log(4)))
      q.processAllAvailable()
    } finally q.stop()

    val bodies = new java.io.File(s"$dir/bulk").listFiles()
      .map(f => new String(Files.readAllBytes(f.toPath), UTF_8)).mkString
    Seq(1, 2, 4).foreach(i => assert(bodies.contains(s"id-$i")))
    assert(spark.read.text(s"$dir/dl/failed_validation").count() == 1)
  }

  test("streaming CDC apply: per-batch SCD2 merge keeps full version history") {
    implicit val sqlCtx = spark.sqlContext
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-06-01")
    val d3 = java.sql.Date.valueOf("2024-09-01")
    var hist = Seq((1L, "silver", Option(d1), Option.empty[java.sql.Date]))
      .toDF("cust_id", "tier", "valid_from", "valid_to").localCheckpoint()
    val mem = MemoryStream[DimUpdate]
    val q = mem.toDS().toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the streaming CDC loop: each micro-batch merges into the
        // dimension; localCheckpoint materializes the new version so
        // lineage doesn't grow across batches
        hist = graft.ops.Scd2.merge(hist, batch, "cust_id", "uts", Seq("tier"))
          .localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(DimUpdate(1L, "gold", d2), DimUpdate(2L, "new", d2))
      q.processAllAvailable()
      mem.addData(DimUpdate(1L, "platinum", d3),
        DimUpdate(2L, "new", d3)) // no-op echo for key 2
      q.processAllAvailable()
    } finally q.stop()
    val rows = hist.orderBy("cust_id", "valid_from")
      .as[(Long, String, Option[java.sql.Date], Option[java.sql.Date])]
      .collect().toSeq
    assert(rows == Seq(
      (1L, "silver", Some(d1), Some(d2)),
      (1L, "gold", Some(d2), Some(d3)),
      (1L, "platinum", Some(d3), None),
      (2L, "new", Some(d2), None)))
  }

  test("streaming incremental dedup: near-dups of the growing reference drop") {
    implicit val sqlCtx = spark.sqlContext
    def doc(prefix: String, last: String): String =
      (1 to 11).map(i => s"$prefix$i").mkString(" ") + " " + last
    var reference = Seq((1L, doc("w", "w12"))).toDF("doc_id", "text")
      .localCheckpoint()
    val mem = MemoryStream[IncomingDoc]
    val q = mem.toDS().toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the incremental-ingest dedup loop: LSH-screen each micro-batch
        // against everything accepted so far, append only the survivors
        val contaminated = graft.ops.Dedup.againstReference(
          batch, reference, "doc_id", "text")
        val fresh = batch.join(contaminated.select("doc_id"),
          Seq("doc_id"), "left_anti")
        reference = reference.unionByName(fresh.select("doc_id", "text"))
          .localCheckpoint()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(IncomingDoc(2L, doc("w", "CHANGED")), // near-dup of ref 1
        IncomingDoc(3L, doc("x", "x12")))               // novel
      q.processAllAvailable()
      mem.addData(IncomingDoc(4L, doc("x", "ALTERED")), // near-dup of 3 (accepted last batch)
        IncomingDoc(5L, doc("y", "y12")))               // novel
      q.processAllAvailable()
    } finally q.stop()
    val ids = reference.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L, 5L))
  }

  test("watermark dedup collapses redelivered log_ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEnvelope]
    val deduped = StreamingPipeline.dedupWithinWatermark(mem.toDF(), PipelineConfig())
    val q = deduped.select("log_id").writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(env(1, log(1)), env(2, log(1))) // dup within batch
      q.processAllAvailable()
      mem.addData(env(3, log(1)), env(4, log(2))) // dup across batches
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").as[String].collect().toSeq.sorted
    assert(ids == Seq("id-1", "id-2"))
  }

  test("streaming frequent-value monitor surfaces the heavy value per window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEnvelope]
    val freq = StreamingPipeline.frequentValuesPerWindow(
      mem.toDF(), PipelineConfig(), jsonPath = "$.user", k = 4)
    val q = freq.writeStream
      .format("memory").queryName("freq_out").outputMode("complete").start()
    try {
      // skewed: "hot" dominates; 8 distinct users exceed the k=4 counters
      val payloads = (1 to 40).map { i =>
        val u = if (i % 2 == 0) "hot" else s"u${i % 8}"
        s"""{"log_type":"nginx","time":"2020-09-15T10:0${i % 6}:00Z","log_id":"id-$i","user":"$u"}"""
      }
      mem.addData(payloads.zipWithIndex.map { case (p, i) => env(i, p) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("freq_out")
      .selectExpr("log_type", "candidates").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cands = r.getSeq[String](1)
      assert(cands.size <= 4, s"state not bounded: $cands")
      assert(cands.head == "hot", s"heavy value lost: $cands") // freq > n/k survives MG
    }
  }

  test("watermark dedup runs on the RocksDB state store (the 100 TB provider)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamingPipeline.useRocksDbStateStore(spark)
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[TestEnvelope]
      val deduped = StreamingPipeline.dedupWithinWatermark(mem.toDF(), PipelineConfig())
      val q = deduped.select("log_id").writeStream
        .format("memory").queryName("rocks_out").outputMode("append").start()
      try {
        mem.addData(env(1, log(1)), env(2, log(1)), env(3, log(2)))
        q.processAllAvailable()
        mem.addData(env(4, log(2)), env(5, log(3))) // cross-batch dup + new
        q.processAllAvailable()
        // the running query's state operator really is RocksDB
        val providers = q.lastProgress.stateOperators
        assert(providers.nonEmpty)
        import scala.jdk.CollectionConverters._
        val metrics = providers(0).customMetrics.asScala
        assert(metrics.keys.exists(_.toLowerCase.contains("rocksdb")),
          s"expected RocksDB state metrics, got ${metrics.keys.toSeq}")
      } finally q.stop()
      val ids = spark.table("rocks_out").as[String].collect().toSeq.sorted
      assert(ids == Seq("id-1", "id-2", "id-3"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("windowed daily counts with watermark (append mode, late data)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEnvelope]
    val counts = StreamingPipeline.dailyIndexCounts(mem.toDF(), PipelineConfig(),
      watermark = "1 day")
    val q = counts.writeStream
      .format("memory").queryName("daily_out").outputMode("append").start()
    try {
      mem.addData(env(1, log(1, "2020-09-15T01:00:00Z")),
        env(2, log(2, "2020-09-15T02:00:00Z")),
        env(3, log(3, "2020-09-16T01:00:00Z")))
      q.processAllAvailable()
      // advance watermark far past the 09-15 window so it closes
      mem.addData(env(4, log(4, "2020-09-20T00:00:00Z")))
      q.processAllAvailable()
      mem.addData(env(5, log(5, "2020-09-21T00:00:00Z")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("daily_out")
      .select("index_name", "n").as[(String, Long)].collect().toMap
    assert(rows.get("logs-nginx-20200915").contains(2L))
  }

  test("stateful sessionizer: gap closes sessions, timeout flushes state") {
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._
    val mem = MemoryStream[Event]
    def ev(user: Long, minute: Int) =
      Event(user, java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"))
    val q = Sessionize.sessions(mem.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 0), ev(1, 10)) // one open session [0,10]
      q.processAllAvailable()
      mem.addData(ev(1, 120)) // >30min gap → closes [0,10], opens [120]
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 1)
      val s = spark.table("sessions_out").as[Session].head()
      assert(s.user_id == 1L && s.n_events == 2L)
      // push the watermark far past 120+gap → timeout flushes the open one
      mem.addData(ev(2, 600))
      q.processAllAvailable()
      mem.addData(ev(2, 610))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() >= 2)
    } finally q.stop()
  }

  test("sessionizer: event far before the open session becomes its own session") {
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._
    def at(hms: String) = Event(1L, java.sql.Timestamp.valueOf(s"2024-01-01 $hms"))
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(mem.toDS(), gapMs = 60 * 1000) // 1 min gap
      .writeStream.format("memory").queryName("iso_out").outputMode("append").start()
    try {
      mem.addData(at("10:00:00"), at("10:00:05"))
      q.processAllAvailable()
      // 9:52:00 is 8 min before the open session start (gap 1 min) but
      // above the 10-min watermark: isolated older session, start must
      // NOT be dragged back
      mem.addData(at("09:52:00"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("iso_out").as[Session].collect()
    assert(rows.exists(s => s.start.toString.contains("09:52:00") &&
      s.end.toString.contains("09:52:00") && s.n_events == 1))
    assert(!rows.exists(s => s.start.toString.contains("09:52") && s.n_events > 1))
  }

  test("stream-static dimension enrichment joins per micro-batch (broadcast)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("nginx", "web"), ("app", "mobile")).toDF("dim_type", "family")
    val mem = MemoryStream[TestEnvelope]
    val enriched = StreamingPipeline.enrichWithDimension(
      mem.toDF(), graft.config.PipelineConfig(), dim, "log_type", "dim_type")
    val q = enriched.select("log_id", "family").writeStream
      .format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData(env(1, log(1, typ = "nginx")), env(2, log(2, typ = "other")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enrich_out").as[(String, Option[String])].collect().toMap
    assert(rows("id-1").contains("web"))
    assert(rows("id-2").isEmpty) // left join: unknown dim → null
  }

  test("per-key quota admits exactly quota per window, resets next window, keys independent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RateLimit.Keyed]
    def ev(key: String, minute: Int, sec: Int, id: String) = RateLimit.Keyed(
      key, java.sql.Timestamp.valueOf(f"2020-09-15 10:$minute%02d:$sec%02d"), id)
    val decisions = RateLimit.admit(mem.toDS(), quota = 3, windowMs = 600000L)
    val q = decisions.writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      mem.addData(
        // key A: 5 events in window [10:00,10:10) -> first 3 admitted
        ev("a", 1, 0, "a1"), ev("a", 2, 0, "a2"), ev("a", 3, 0, "a3"),
        ev("a", 4, 0, "a4"), ev("a", 5, 0, "a5"),
        // key B: 2 events same window -> all admitted
        ev("b", 1, 0, "b1"), ev("b", 2, 0, "b2"))
      q.processAllAvailable()
      // key A next window -> budget resets (cross-batch state)
      mem.addData(ev("a", 11, 0, "a6"), ev("a", 12, 0, "a7"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quota_out")
      .select("id", "admitted").as[(String, Boolean)].collect().toMap
    assert(got == Map(
      "a1" -> true, "a2" -> true, "a3" -> true, "a4" -> false, "a5" -> false,
      "b1" -> true, "b2" -> true, "a6" -> true, "a7" -> true))
  }

  test("quota decisions are replay-deterministic (same batch, same admitted set)") {
    implicit val sqlCtx = spark.sqlContext
    // out-of-order arrival within the batch: decisions follow event time,
    // not arrival order
    def run(tag: String, shuffled: Boolean): Map[String, Boolean] = {
      val mem = MemoryStream[RateLimit.Keyed]
      def ev(min: Int, id: String) = RateLimit.Keyed(
        "k", java.sql.Timestamp.valueOf(f"2020-09-15 10:$min%02d:00"), id)
      val data = Seq(ev(1, "e1"), ev(2, "e2"), ev(3, "e3"), ev(4, "e4"))
      val q = RateLimit.admit(mem.toDS(), quota = 2, windowMs = 600000L)
        .writeStream.format("memory").queryName(s"rd_$tag")
        .outputMode("append").start()
      try {
        mem.addData((if (shuffled) data.reverse else data): _*)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(s"rd_$tag").select("id", "admitted")
        .as[(String, Boolean)].collect().toMap
    }
    val a = run("fwd", shuffled = false)
    val b = run("rev", shuffled = true)
    assert(a == b)
    assert(a == Map("e1" -> true, "e2" -> true, "e3" -> false, "e4" -> false))
  }

  test("stream-stream LEFT OUTER correlation emits unmatched rows after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEnvelope]
    def typed(id: Int, typ: String, minute: Int, user: Int) = env(id,
      s"""{"log_type":"$typ","time":"2020-09-15T${10 + minute / 60}:${f"${minute % 60}%02d"}:00Z","log_id":"id-$id","user_id":$user}""")
    val joined = StreamingPipeline.correlateTypes(
      mem.toDF(), graft.config.PipelineConfig(),
      "click", "purchase", "$.user_id", within = "30 minutes",
      joinType = "left_outer")
    val q = joined.select("id_a", "id_b").writeStream
      .format("memory").queryName("corr_outer_out").outputMode("append").start()
    try {
      mem.addData(
        typed(1, "click", 0, 7),
        typed(2, "purchase", 10, 7), // matches click 1
        typed(3, "click", 0, 8))     // never purchases
      q.processAllAvailable()
      // advance the watermark far past click 3's join window on BOTH
      // sides (each filtered branch tracks its own watermark; the global
      // one is their min) so the engine can prove no purchase can still
      // match and emit the null-extended row
      mem.addData(typed(9, "click", 600, 99), typed(10, "purchase", 600, 99))
      q.processAllAvailable()
      mem.addData(typed(11, "click", 1200, 98), typed(12, "purchase", 1200, 98))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("corr_outer_out")
      .select("id_a", "id_b").as[(String, Option[String])].collect().toSet
    assert(rows.contains(("id-1", Some("id-2"))))
    assert(rows.contains(("id-3", None)), s"missing null-extended row: $rows")
  }

  test("stream-stream correlation joins typed events on key within window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEnvelope]
    def typed(id: Int, typ: String, minute: Int, user: Int) = env(id,
      s"""{"log_type":"$typ","time":"2020-09-15T${10 + minute / 60}:${f"${minute % 60}%02d"}:00Z","log_id":"id-$id","user_id":$user}""")
    val joined = StreamingPipeline.correlateTypes(
      mem.toDF(), graft.config.PipelineConfig(),
      "click", "purchase", "$.user_id", within = "30 minutes")
    val q = joined.select("id_a", "id_b").writeStream
      .format("memory").queryName("corr_out").outputMode("append").start()
    try {
      mem.addData(
        typed(1, "click", 0, 7),
        typed(2, "purchase", 10, 7),  // same user, within 30min → match
        typed(3, "purchase", 10, 8),  // other user → no match
        typed(4, "click", 0, 9),
        typed(5, "purchase", 50, 9))  // same user, beyond 30min → no match
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("corr_out").as[(String, String)].collect().toSet
    assert(pairs == Set(("id-1", "id-2")))
  }

  test("file-replay source streams the events table through the pipeline") {
    val dir = Files.createTempDirectory("replay").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl")
    val stream = StreamingPipeline.eventsReplayStream(spark, "/root/testdata/sf0.001")
    val q = StreamingPipeline.run(stream, cfg,
      graft.Pipeline.fileTransport(s"$dir/bulk"), s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination(120000)
    val nActions = new java.io.File(s"$dir/bulk").listFiles()
      .map(f => Files.readAllLines(f.toPath).size / 2).sum
    assert(nActions == 1000) // sf0.001 events rows

    // restart against the same checkpoint: offsets recover, nothing is
    // reprocessed (the Spark analog of the ESM shard iterator)
    val q2 = StreamingPipeline.run(
      StreamingPipeline.eventsReplayStream(spark, "/root/testdata/sf0.001"), cfg,
      graft.Pipeline.fileTransport(s"$dir/bulk"), s"$dir/ckpt", Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val nAfterRestart = new java.io.File(s"$dir/bulk").listFiles()
      .map(f => Files.readAllLines(f.toPath).size / 2).sum
    assert(nAfterRestart == 1000)
  }
}
