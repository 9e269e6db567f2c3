package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.NearDupStream.{BandVerdict, BandedDoc}

/** Streaming banded-SimHash near-dup dedup: first occurrence passes, a
  * near copy is flagged — including across batch boundaries — and
  * verdicts depend on seq order, not slicing. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // sigs chosen by hand: b is a within hamming 2 (bits 0,1 flipped — both
  // in band 0, so bands 1-3 still collide); c is far from both
  private val sigA = 0x0123456789ABCDEFL
  private val sigB = sigA ^ 0x3L
  private val sigC = ~sigA

  private def bands(sig: Long, seq: Long, id: Long): Seq[BandedDoc] =
    (0 until 4).map { b =>
      BandedDoc(b.toLong * 65536L + ((sig >>> (b * 16)) & 0xFFFFL),
        seq, id, "s", sig, new Timestamp((seq + 1) * 1000L))
    }

  private def run(batches: Seq[Seq[BandedDoc]], maxHamming: Int = 3): Map[Long, Boolean] = {
    val dir = Files.createTempDirectory("neardup-spec").toString
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[BandedDoc]
    val out = scala.collection.mutable.ArrayBuffer[BandVerdict]()
    val q = NearDupStream.verdicts(mem.toDS(), maxHamming, watermark = "3650 days")
      .toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        out ++= b.as[BandVerdict].collect(); ()
      })
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    // per-doc verdict = OR over band rows (what the sink reader computes)
    out.groupBy(_.doc_id).map { case (id, vs) => id -> vs.exists(_.dup) }
  }

  test("first occurrence passes; near copy and exact copy are flagged") {
    val got = run(Seq(bands(sigA, 0, 10) ++ bands(sigB, 1, 11) ++
      bands(sigC, 2, 12) ++ bands(sigA, 3, 13)))
    assert(got == Map(10L -> false, 11L -> true, 12L -> false, 13L -> true))
  }

  test("near-dup state crosses batch boundaries") {
    val got = run(Seq(bands(sigA, 0, 10), bands(sigB, 1, 11)))
    assert(got == Map(10L -> false, 11L -> true))
  }

  test("verdicts follow seq order, not arrival order within a batch") {
    // doc 11 (seq 1) arrives listed BEFORE doc 10 (seq 0) in the batch:
    // the bucket group sorts by seq, so 10 is still the original
    val got = run(Seq(bands(sigB, 1, 11) ++ bands(sigA, 0, 10)))
    assert(got == Map(10L -> false, 11L -> true))
  }

  test("hamming beyond the threshold in every shared band is kept") {
    val far = sigA ^ 0xFFL // 8 bits flipped in band 0, others collide
    val got = run(Seq(bands(sigA, 0, 10) ++ bands(far, 1, 11)), maxHamming = 3)
    assert(got == Map(10L -> false, 11L -> false))
  }
}
