package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.Compact.Upd

/** Streaming key compaction: change-only emission, snapshot merge,
  * last-write-wins semantics with deterministic (ts, id) tiebreak. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[Upd]]): (String, Seq[Long]) = {
    val dir = Files.createTempDirectory("compact-spec").toString
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Upd]
    val emitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = Compact.latestPerKey(mem.toDS()).toDF().writeStream
      .foreachBatch((changes: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     batchId: Long) => {
        val df = changes.toDF().cache()
        emitted += df.count()
        Compact.mergeBatch(df, s"$dir/table", batchId)
        df.unpersist()
        ()
      })
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    (s"$dir/table", emitted.toSeq)
  }

  test("emits only on change; snapshot is last-write-wins by (ts, id)") {
    val (table, emitted) = runBatches(Seq(
      // batch 0: two keys
      Seq(Upd(1L, 100L, 1L, "click", 1.0), Upd(2L, 100L, 2L, "view", 2.0)),
      // batch 1: key 1 advances, key 2 gets a STALE update (no emission)
      Seq(Upd(1L, 200L, 3L, "purchase", 3.0), Upd(2L, 50L, 4L, "click", 4.0)),
      // batch 2: event-time tie on key 2 — higher id wins
      Seq(Upd(2L, 100L, 9L, "purchase", 9.0))))
    assert(emitted == Seq(2L, 1L, 1L))
    val snap = Compact.snapshot(spark, table)
      .orderBy("key").as[Upd].collect().toSeq
    assert(snap == Seq(Upd(1L, 200L, 3L, "purchase", 3.0),
      Upd(2L, 100L, 9L, "purchase", 9.0)))
  }

  test("mergeBatch is idempotent on retry and keeps unrelated keys") {
    val dir = Files.createTempDirectory("compact-merge").toString
    val t = s"$dir/table"
    Compact.mergeBatch(Seq(Upd(1L, 10L, 1L, "a", 1.0)).toDF(), t, 0L)
    Compact.mergeBatch(Seq(Upd(2L, 20L, 2L, "b", 2.0)).toDF(), t, 1L)
    // retry of batch 1 reads v0 again (not v1) and rewrites v1 identically
    Compact.mergeBatch(Seq(Upd(2L, 20L, 2L, "b", 2.0)).toDF(), t, 1L)
    val snap = Compact.snapshot(spark, t).orderBy("key").as[Upd].collect().toSeq
    assert(snap == Seq(Upd(1L, 10L, 1L, "a", 1.0), Upd(2L, 20L, 2L, "b", 2.0)))
  }
}
