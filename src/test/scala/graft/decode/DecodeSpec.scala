package graft.decode

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.functions.{GzipUtil, Kpl}

/** D1–D5 decode matrix (FIXTURES.md §B; SURVEY.md §2.2). */
class DecodeSpec extends SparkSpec {
  import spark.implicits._

  private def envelopes(payloads: Array[Byte]*): DataFrame =
    payloads.zipWithIndex
      .map { case (p, i) => (s"pk-$i", s"seq-$i", p) }
      .toSeq.toDF("partitionKey", "sequenceNumber", "data")

  private def decoded(payloads: Array[Byte]*): Seq[String] =
    Decode.normalize(envelopes(payloads: _*))
      .select("payload").as[String].collect().toSeq

  private val log = """{"log_type":"nginx","time":"2020-09-15T10:21:33Z","log_id":"a1"}"""

  test("plain UTF-8 JSON payload passes through 1:1") {
    assert(decoded(log.getBytes(UTF_8)) == Seq(log))
  }

  test("gzip payload is inflated (magic-sniffed)") {
    assert(decoded(GzipUtil.gzipString(log)) == Seq(log))
  }

  test("corrupt gzip passes through as raw bytes (dead-letter downstream)") {
    val corrupt = GzipUtil.gzipString(log).take(5) ++ Array[Byte](1, 2, 3)
    assert(decoded(corrupt).size == 1)
  }

  test("KPL aggregate fans out to N user records") {
    val agg = Kpl.aggregate(Seq(log.getBytes(UTF_8), log.getBytes(UTF_8), "x".getBytes(UTF_8)))
    assert(decoded(agg) == Seq(log, log, "x"))
  }

  test("KPL aggregate with bad checksum degrades to pass-through") {
    val agg = Kpl.aggregate(Seq(log.getBytes(UTF_8)))
    agg(agg.length - 1) = (agg(agg.length - 1) ^ 0x01).toByte
    assert(decoded(agg).size == 1) // 1 undecodable blob, not 1 record
  }

  test("CloudWatch Logs DATA_MESSAGE unwraps every logEvents message") {
    val cwl =
      s"""{"messageType":"DATA_MESSAGE","owner":"0123","logGroup":"g","logStream":"s",
         |"subscriptionFilters":["f"],"logEvents":[
         |{"id":"1","timestamp":1599999999000,"message":${jstr(log)}},
         |{"id":"2","timestamp":1599999999001,"message":${jstr(log)}}]}""".stripMargin
    assert(decoded(GzipUtil.gzipString(cwl)) == Seq(log, log))
  }

  test("CloudWatch Logs CONTROL_MESSAGE is skipped entirely") {
    val cwl =
      """{"messageType":"CONTROL_MESSAGE","logEvents":[{"id":"1","timestamp":1,"message":"CWL CONTROL MESSAGE"}]}"""
    assert(decoded(GzipUtil.gzipString(cwl)).isEmpty)
  }

  test("mixed batch: plain + gzip + KPL + CWL control in one pass") {
    val kpl = Kpl.aggregate(Seq("a".getBytes(UTF_8), "b".getBytes(UTF_8)))
    val control = GzipUtil.gzipString("""{"messageType":"CONTROL_MESSAGE","logEvents":[]}""")
    val out = decoded(log.getBytes(UTF_8), GzipUtil.gzipString(log), kpl, control)
    assert(out.sorted == Seq(log, log, "a", "b").sorted)
  }

  test("KPL records containing gzip payloads inflate per record (D2→D3)") {
    val agg = Kpl.aggregate(Seq(GzipUtil.gzipString(log), log.getBytes(UTF_8)))
    assert(decoded(agg) == Seq(log, log))
  }

  test("KPL records containing CWL bundles unwrap per record (D2→D3→D4)") {
    val cwl =
      s"""{"messageType":"DATA_MESSAGE","logEvents":[
         |{"id":"1","timestamp":1,"message":${jstr(log)}},
         |{"id":"2","timestamp":2,"message":${jstr(log)}}]}""".stripMargin
    val agg = Kpl.aggregate(Seq(GzipUtil.gzipString(cwl), log.getBytes(UTF_8)))
    assert(decoded(agg) == Seq(log, log, log))
  }

  test("base64 text envelopes (D1) decode identically") {
    val b64 = java.util.Base64.getEncoder.encodeToString(GzipUtil.gzipString(log))
    val df = Seq(("pk", "seq", b64)).toDF("partitionKey", "sequenceNumber", "data")
    assert(Decode.normalizeBase64(df).select("payload").as[String].collect().toSeq == Seq(log))
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
