package graft.streaming

import java.nio.file.Files
import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.config.PipelineConfig

/** S1: the Kinesis-shaped DSv2 shim — shard partitioning, per-shard
  * ordering across micro-batches, ESM batch_size admission control,
  * startingPosition semantics, checkpoint resume
  * (reference main.tf:58-64, variables.tf:16-18,54-57). */
class KinesisShimSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val nEvents = 1000

  private def stream(cfg: PipelineConfig) =
    StreamingPipeline.kinesisShimStream(spark, sf, cfg)

  test("TRIM_HORIZON replays every record exactly once, honoring batch_size") {
    val cfg = PipelineConfig(sourceShards = 4, sourceBatchSize = 50)
    KinesisShimSpec.batches.clear()
    val q = stream(cfg).writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select("partitionKey", "sequenceNumber").collect()
          .map(r => (r.getString(0), r.getString(1)))
        KinesisShimSpec.batches.add(id -> rows)
        ()
      }.start()
    q.awaitTermination(120000)

    val all = (0 until KinesisShimSpec.batches.size)
      .flatMap(i => KinesisShimSpec.batches.get(i)._2)
    assert(all.size == nEvents)
    assert(all.map(_._2).distinct.size == nEvents) // no duplicate sequence numbers

    // batch_size: no micro-batch exceeds batchSize × nShards records, and
    // the stream needed multiple batches (admission control actually bit)
    val sizes = (0 until KinesisShimSpec.batches.size)
      .map(i => KinesisShimSpec.batches.get(i)._2.length)
    assert(sizes.forall(_ <= 50 * 4), s"batch sizes: $sizes")
    assert(sizes.length >= nEvents / (50 * 4), s"expected ≥5 batches, got ${sizes.length}")
  }

  test("per-shard sequence order is preserved across micro-batches") {
    // sequence numbers are zero-padded "<shard>-<seq>"; for each shard the
    // concatenation of its records across batches (in batch order) must be
    // strictly increasing — the Kinesis per-shard ordering contract
    val byShard = scala.collection.mutable.Map.empty[String, Vector[String]]
    (0 until KinesisShimSpec.batches.size).sortBy(KinesisShimSpec.batches.get(_)._1)
      .foreach { i =>
        KinesisShimSpec.batches.get(i)._2.foreach { case (_, seq) =>
          val shard = seq.split("-")(0)
          byShard(shard) = byShard.getOrElse(shard, Vector.empty) :+ seq
        }
      }
    assert(byShard.size == 4)
    byShard.foreach { case (shard, seqs) =>
      assert(seqs == seqs.sorted, s"shard $shard out of order")
    }
    // shard assignment is consistent: every pk maps to exactly one shard
    val pkShards = (0 until KinesisShimSpec.batches.size)
      .flatMap(i => KinesisShimSpec.batches.get(i)._2)
      .groupBy(_._1).view.mapValues(_.map(_._2.split("-")(0)).distinct.size)
    assert(pkShards.values.forall(_ == 1))
  }

  test("LATEST starts at the stream end: a pure replay yields no records") {
    val out = Files.createTempDirectory("shim-latest").toString
    val q = stream(PipelineConfig(startingPosition = "LATEST")).writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt").start()
    q.awaitTermination(60000)
    val files = Option(new java.io.File(s"$out/data").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    val n = if (files.isEmpty) 0L else spark.read.parquet(s"$out/data").count()
    assert(n == 0L)
  }

  test("checkpoint resume: stop mid-stream, restart, no loss and no reprocessing") {
    val dir = Files.createTempDirectory("shim-resume").toString
    val cfg = PipelineConfig(sourceShards = 4, sourceBatchSize = 25)
    // first run: small trigger cadence, stop after at least one batch lands
    val q1 = stream(cfg).writeStream
      .trigger(Trigger.ProcessingTime(0))
      .format("parquet").option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt").start()
    val deadline = System.currentTimeMillis() + 60000
    def readable(): Long =
      try spark.read.parquet(s"$dir/data").count() catch { case _: Exception => 0L }
    var consumed = 0L
    while (consumed == 0 && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      consumed = readable()
    }
    q1.stop()
    assert(consumed > 0, "first run should consume at least one batch")

    // resume from the same checkpoint and drain
    val q2 = stream(cfg).writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q2.awaitTermination(120000)

    val all = spark.read.parquet(s"$dir/data")
    assert(all.count() == nEvents, "every record delivered")
    assert(all.select("sequenceNumber").distinct().count() == nEvents,
      "no record reprocessed after resume")
  }

  test("shim envelopes flow through the full pipeline unchanged (source-agnostic)") {
    val dir = Files.createTempDirectory("shim-pipe").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl")
    val q = StreamingPipeline.run(stream(cfg), cfg,
      graft.Pipeline.fileTransport(s"$dir/bulk"), s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination(120000)
    val nActions = new java.io.File(s"$dir/bulk").listFiles()
      .map(f => Files.readAllLines(f.toPath).size / 2).sum
    assert(nActions == nEvents)
  }

  test("partitions carry coordinates only; readers fetch their own shard slice") {
    val path = s"$sf/events.parquet"
    // the partition object ships NO record data (compile-level: coordinates
    // only); here: the executor-side fetch covers the stream exactly
    val all = (0 until 4).flatMap { sh =>
      val recs = KinesisShim.readShardSlice(path, 4, sh, 0, Long.MaxValue)
      val ids = recs.map(_.pk.toLong)
      assert(ids.sameElements(ids.sorted), s"shard $sh not in event order")
      assert(ids.forall(id => KinesisShim.shardOf(id.toString, 4) == sh))
      ids
    }
    assert(all.sorted == (0L until nEvents.toLong))
    // a mid-stream slice is the contiguous window of the shard's order
    val s0 = KinesisShim.readShardSlice(path, 4, 0, 0, Long.MaxValue).map(_.pk)
    val win = KinesisShim.readShardSlice(path, 4, 0, 10, 25).map(_.pk)
    assert(win.toSeq == s0.slice(10, 25).toSeq)
    // driver-side offset state agrees with the executor-side fetches
    val counts = KinesisShim.shardCounts(spark, path, 4)
    assert(counts.toSeq == (0 until 4).map(sh =>
      KinesisShim.readShardSlice(path, 4, sh, 0, Long.MaxValue).length.toLong))
    // payload parses as a routable record
    val payload = new String(
      KinesisShim.readShardSlice(path, 4, 1, 0, 1).head.data, "UTF-8")
    assert(payload.contains("\"log_type\":") && payload.contains("\"time\":") &&
      payload.contains("\"log_id\":"))
  }

  test("unclustered input takes the external sort-merge fallback within a capped heap") {
    // a DESCENDING-id copy of the fixture: every record after the first
    // violates the clustered fast path, so the spill must fall back —
    // with the sort cap forced to 0 MB every single record flushes as its
    // own sorted run, so the merge runs at the maximum run count and the
    // in-memory buffer never holds more than one record (the bounded-heap
    // claim, exercised at its extreme)
    val dir = Files.createTempDirectory("shim-shuffled")
    val out = dir.resolve("events.parquet").toString
    graft.Tables.events(spark, sf).orderBy(desc("event_id")).coalesce(1)
      .write.mode("overwrite").parquet(out)
    sys.props("SPARK_GRAFT_SHIM_SORT_MB") = "0"
    try {
      (0 until 4).foreach { sh =>
        val ref = KinesisShim.readShardSlice(s"$sf/events.parquet", 4, sh, 0, Long.MaxValue)
        val got = KinesisShim.readShardSlice(out, 4, sh, 0, Long.MaxValue)
        // same records, same per-shard sequence order...
        assert(got.map(_.pk).toSeq == ref.map(_.pk).toSeq, s"shard $sh order differs")
        // ...and byte-identical wire payloads — the stream downstream
        // cannot tell the layouts apart
        assert(got.map(_.data.toSeq).toSeq == ref.map(_.data.toSeq).toSeq,
          s"shard $sh payloads differ")
      }
    } finally sys.props -= "SPARK_GRAFT_SHIM_SORT_MB"
  }

  test("spill builds are shard-owned: disjoint builders, identical results") {
    // a fresh fixture copy → fresh cache keys, so this spec observes the
    // build states from scratch
    val dir = Files.createTempDirectory("shim-owned")
    val path = dir.resolve("events.parquet").toString
    graft.Tables.events(spark, sf).coalesce(1).write.parquet(path)
    val n = 4
    assert((0 until n).forall(!KinesisShim.shardSpillPublished(path, n, _)))
    // builder A owns shards {0, 2}: first touch builds THOSE spills only —
    // the other shards' spills do not exist on this "machine"
    val a = Seq(0, 2).map(sh =>
      sh -> KinesisShim.readShardSlice(path, n, sh, 0, Long.MaxValue))
    assert(KinesisShim.shardSpillPublished(path, n, 0))
    assert(KinesisShim.shardSpillPublished(path, n, 2))
    assert(!KinesisShim.shardSpillPublished(path, n, 1), "unowned shard was built")
    assert(!KinesisShim.shardSpillPublished(path, n, 3), "unowned shard was built")
    // builder B owns the complement {1, 3}
    val b = Seq(1, 3).map(sh =>
      sh -> KinesisShim.readShardSlice(path, n, sh, 0, Long.MaxValue))
    assert((0 until n).forall(KinesisShim.shardSpillPublished(path, n, _)))
    // the union of the disjoint builds serves exactly the reference
    // stream: same records, same per-shard order, byte-identical payloads
    for ((sh, got) <- a ++ b) {
      val ref = KinesisShim.readShardSlice(s"$sf/events.parquet", n, sh, 0, Long.MaxValue)
      assert(got.map(_.pk).toSeq == ref.map(_.pk).toSeq, s"shard $sh order differs")
      assert(got.map(_.data.toSeq).toSeq == ref.map(_.data.toSeq).toSeq,
        s"shard $sh payloads differ")
    }
    assert((a ++ b).map(_._2.length).sum == nEvents)
  }

  test("rejects an unknown startingPosition") {
    intercept[IllegalArgumentException] {
      PipelineConfig(startingPosition = "AT_TIMESTAMP")
    }
  }
}

object KinesisShimSpec {
  /** Static so foreachBatch writes survive closure serialization. */
  val batches = new CopyOnWriteArrayList[(Long, Array[(String, String)])]()
}
