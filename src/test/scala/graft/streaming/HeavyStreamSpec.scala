package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.HeavyStream.{Hit, TopRow}

/** Streaming Misra-Gries heavy hitters: exact below k regardless of batch
  * slicing, bounded counters with the MG survival guarantee above k. */
class HeavyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def hit(day: Long, key: String, seq: Long): Hit =
    Hit(day, key, new Timestamp(day * 86400000L + seq + 1))

  private def run(batches: Seq[Seq[Hit]], k: Int, top: Int): Seq[TopRow] = {
    val dir = Files.createTempDirectory("heavy-spec").toString
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Hit]
    val out = scala.collection.mutable.ArrayBuffer[TopRow]()
    val q = HeavyStream.topTalkers(mem.toDS(), k, top, watermark = "3650 days")
      .toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        out ++= b.as[TopRow].collect(); ()
      })
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    out.toSeq
  }

  private def finalTop(rows: Seq[TopRow], day: Long): Seq[(Long, String, Long)] = {
    val n = rows.filter(_.day == day).map(_.n_events).max
    rows.filter(r => r.day == day && r.n_events == n)
      .sortBy(_.rnk).map(r => (r.rnk, r.key, r.n))
  }

  test("below k: exact counts, rank by (count desc, key asc), batch-slice-invariant") {
    val hits = Seq.tabulate(9)(i => hit(1L, s"u${i % 3}", i)) ++ // u0..u2 ×3
      Seq(hit(1L, "u0", 20), hit(1L, "u0", 21),                  // u0 → 5
        hit(1L, "u1", 22),                                       // u1 → 4
        hit(2L, "z", 30))                                        // other day
    val want = Seq((1L, "u0", 5L), (2L, "u1", 4L), (3L, "u2", 3L))
    for (slices <- Seq(Seq(hits), Seq(hits.take(5), hits.slice(5, 9), hits.drop(9)))) {
      val got = run(slices, k = 16, top = 3)
      assert(finalTop(got, 1L) == want)
      assert(finalTop(got, 2L) == Seq((1L, "z", 1L)))
    }
  }

  test("above k: ≤ k counters survive and every key with freq > n/k is retained") {
    // one heavy key (freq 40) in a sea of 60 singletons; k = 8 → state is
    // bounded at 8 counters, MG guarantees the heavy key survives
    // (40 > n/k = 100/8) — its count is a lower bound, rank 1 regardless
    val hits = (1 to 40).map(i => hit(1L, "heavy", i.toLong)) ++
      (1 to 60).map(i => hit(1L, s"one$i", 100L + i))
    val got = run(Seq(hits.take(50), hits.drop(50)), k = 8, top = 8)
    val fin = finalTop(got, 1L)
    assert(fin.size <= 8)
    assert(fin.head._2 == "heavy")
    assert(fin.head._3 <= 40L && fin.head._3 > 40L - 100L / 8)
  }

  test("windows are independent: same key on different days keeps separate state") {
    val got = run(Seq(Seq(hit(1L, "a", 1), hit(2L, "a", 2), hit(2L, "a", 3))),
      k = 16, top = 2)
    assert(finalTop(got, 1L) == Seq((1L, "a", 1L)))
    assert(finalTop(got, 2L) == Seq((1L, "a", 2L)))
  }
}
