package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.CardinalityStream.{Estimate, Hit}

/** Streaming KMV cardinality: exact below k (dedup across batches),
  * plausible estimate above k, monotone event counts. */
class CardinalityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hit(key: String, day: Long, user: Long): Hit =
    Hit(key, day, md5(user.toString), new Timestamp(day * 86400000L + user + 1))

  private def run(batches: Seq[Seq[Hit]], k: Int): Seq[Estimate] = {
    val dir = Files.createTempDirectory("card-spec").toString
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Hit]
    val out = scala.collection.mutable.ArrayBuffer[Estimate]()
    val q = CardinalityStream.estimates(mem.toDS(), k, watermark = "3650 days")
      .toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        out ++= b.as[Estimate].collect(); ()
      })
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    out.toSeq
  }

  test("below k: exact distinct count, deduped across batches, monotone events") {
    val got = run(Seq(
      Seq(hit("click", 1L, 1), hit("click", 1L, 2), hit("click", 1L, 1)),
      Seq(hit("click", 1L, 2), hit("click", 1L, 3), hit("view", 1L, 9))), k = 16)
    val click = got.filter(e => e.key == "click").sortBy(_.n_events)
    assert(click.map(_.n_events) == Seq(3L, 5L)) // one row per batch, monotone
    assert(click.map(_.n_users_est) == Seq(2L, 3L)) // users 1,2 then +3 only
    val view = got.filter(_.key == "view")
    assert(view == Seq(Estimate("view", 1L, 1L, 1L)))
  }

  test("windows are independent: same key, different day, separate state") {
    val got = run(Seq(Seq(hit("click", 1L, 1), hit("click", 2L, 1))), k = 16)
    assert(got.toSet ==
      Set(Estimate("click", 1L, 1L, 1L), Estimate("click", 2L, 1L, 1L)))
  }

  test("above k: bounded state yields a plausible KMV estimate") {
    val users = (1L to 400L).map(u => hit("click", 1L, u))
    val got = run(Seq(users.take(200), users.drop(200)), k = 16)
    val last = got.filter(_.key == "click").maxBy(_.n_events)
    assert(last.n_events == 400L)
    // KMV with k=16 has ~27% relative sd; 400 true distinct must land in
    // a generous 3-sigma band, never at the k floor or wildly beyond
    assert(last.n_users_est > 100L && last.n_users_est < 1600L,
      s"estimate ${last.n_users_est} implausible for 400 distinct")
  }
}
