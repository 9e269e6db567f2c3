package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.PipelineConfig
import graft.functions.{GzipUtil, Kpl}
import graft.route.Router
import graft.sink.RejectingTransport

/** End-to-end micro-batch runs (SURVEY.md §3.1) and idempotent replay. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def log(id: Int, typ: String = "nginx") =
    s"""{"log_type":"$typ","time":"2020-09-15T10:21:33Z","log_id":"id-$id","v":$id}"""

  private def env(payloads: Array[Byte]*) =
    payloads.zipWithIndex.map { case (p, i) => (s"pk-$i", s"seq-$i", p) }
      .toSeq.toDF("partitionKey", "sequenceNumber", "data")

  test("runBatch routes, pushes, dead-letters, and counts") {
    val dir = Files.createTempDirectory("pipe").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl")
    val batch = env(
      log(1).getBytes(UTF_8),
      GzipUtil.gzipString(log(2)),
      Kpl.aggregate(Seq(log(3).getBytes(UTF_8), log(4).getBytes(UTF_8))),
      "not json".getBytes(UTF_8),
      """{"log_type":"nginx"}""".getBytes(UTF_8))
    val res = Pipeline.runBatch(batch, cfg, Pipeline.fileTransport(s"$dir/bulk"))
    assert(res == Pipeline.BatchResult(pushed = 4, failed = 2, rejected = 0, dropped = 0))
    // bulk bodies carry all 4 ids
    val bodies = new java.io.File(s"$dir/bulk").listFiles()
      .map(f => new String(Files.readAllBytes(f.toPath), UTF_8)).mkString
    (1 to 4).foreach(i => assert(bodies.contains(s"id-$i")))
    // dead-letter captured the 2 failures
    val dl = spark.read.option("compression", "gzip")
      .text(s"$dir/dl/failed_validation").count()
    assert(dl == 2)
  }

  test("ES rejects are captured and dead-lettered (K2→K4)") {
    val dir = Files.createTempDirectory("pipe2").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl")
    val batch = env((1 to 5).map(i => log(i).getBytes(UTF_8)): _*)
    val res = Pipeline.runBatch(batch, cfg,
      () => new RejectingTransport(_.id == "id-2"))
    assert(res.pushed == 4 && res.rejected == 1)
    val rej = spark.read.text(s"$dir/dl/es_rejected").count()
    assert(rej == 1)
  }

  test("at-least-once replay is idempotent by log_id (F5 fix)") {
    val batch = env((1 to 3).map(i => log(i).getBytes(UTF_8)): _*)
    val twice = batch.union(batch)
    val routed = Pipeline.transform(twice, PipelineConfig())
    val ids = Router.good(routed).dropDuplicates("log_id")
      .select("log_id").as[String].collect().toSeq.sorted
    assert(ids == Seq("id-1", "id-2", "id-3"))
  }

  test("whitelist drops do not reach any sink") {
    val dir = Files.createTempDirectory("pipe3").toString
    val cfg = PipelineConfig(deadLetterPath = s"$dir/dl",
      logTypeWhitelist = Some(Set("app")))
    val batch = env(log(1, "nginx").getBytes(UTF_8), log(2, "app").getBytes(UTF_8))
    val res = Pipeline.runBatch(batch, cfg, Pipeline.fileTransport(s"$dir/bulk"))
    assert(res == Pipeline.BatchResult(pushed = 1, failed = 0, rejected = 0, dropped = 1))
  }

  test("events replay through the full pipeline matches the raw table") {
    val sf = "/root/testdata/sf0.001"
    val routed = Pipeline.transform(Pipeline.eventsAsEnvelopes(spark, sf), PipelineConfig())
    val nGood = Router.good(routed).count()
    assert(nGood == Tables.events(spark, sf).count())
    assert(Router.failed(routed).count() == 0)
  }
}
