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
