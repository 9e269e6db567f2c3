package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.Base64

/** The CLI surface: JSON-lines envelopes in, bulk bodies + dead letters
  * out (reference parity: the Lambda handler end to end). */
class MainSpec extends SparkSpec {

  test("batch mode processes an envelope file end to end") {
    spark.version // force the shared local session so Main reuses it
    val dir = Files.createTempDirectory("main").toString
    val log = """{"log_type":"nginx","time":"2020-09-15T10:21:33Z","log_id":"cli-1"}"""
    val b64 = Base64.getEncoder.encodeToString(log.getBytes(UTF_8))
    val lines = Seq(
      s"""{"partitionKey":"pk","sequenceNumber":"1","data":"$b64"}""",
      s"""{"partitionKey":"pk","sequenceNumber":"2","data":"${Base64.getEncoder
        .encodeToString("junk".getBytes(UTF_8))}"}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/envelopes.json"),
      lines.mkString("\n"))

    // spark session already active → Main's getOrCreate reuses it
    Main.main(Array(
      "--input", s"$dir/envelopes.json",
      "--bulk-out", s"$dir/bulk",
      "--dead-letter", s"$dir/dlq",
      "--mode", "batch"))

    val bodies = new java.io.File(s"$dir/bulk").listFiles()
      .map(f => new String(Files.readAllBytes(f.toPath), UTF_8)).mkString
    assert(bodies.contains("cli-1"))
    assert(spark.read.text(s"$dir/dlq/failed_validation").count() == 1)
  }

  test("--es-endpoint switches the sink to the HTTP _bulk transport") {
    spark.version
    val es = new graft.sink.StubEsServer()
    val dir = Files.createTempDirectory("main-http").toString
    val log = """{"log_type":"app","time":"2020-09-15T10:21:33Z","log_id":"cli-http-1"}"""
    val b64 = Base64.getEncoder.encodeToString(log.getBytes(UTF_8))
    Files.writeString(java.nio.file.Paths.get(s"$dir/envelopes.json"),
      s"""{"partitionKey":"pk","sequenceNumber":"1","data":"$b64"}""")
    try {
      Main.main(Array(
        "--input", s"$dir/envelopes.json",
        "--es-endpoint", es.endpoint,
        "--dead-letter", s"$dir/dlq",
        "--mode", "batch"))
      assert(es.requestCount == 1)
      assert(es.requests.get(0).contains("cli-http-1"))
    } finally es.stop()
  }
}
