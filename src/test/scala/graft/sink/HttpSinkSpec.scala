package graft.sink

import java.nio.file.Files
import java.util.concurrent.CopyOnWriteArrayList

import graft.SparkSpec
import graft.config.PipelineConfig

/** K1 over a REAL HTTP `_bulk` endpoint (localhost stub): chunked POSTs,
  * per-action reject parsing from an ES-shaped response body, bounded
  * retry/backoff on 429/5xx/IO errors, timeout, SigV4 signing
  * (reference lambda/main.py:29-30,52-58,76-84,127-155). */
class HttpSinkSpec extends SparkSpec {
  import spark.implicits._

  private def goodDf(n: Int, bad: Set[Int] = Set.empty) =
    (1 to n).map { i =>
      val marker = if (bad(i)) ""","poison":"yes"""" else ""
      (s"logs-t-20200915", s"id-$i", s"""{"log_id":"id-$i"$marker}""")
    }.toDF("index_name", "log_id", "payload")

  test("HTTP transport: all actions indexed, one POST per 500-chunk") {
    val es = new StubEsServer()
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(1200).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep))
      assert(rejects.count() == 0)
      assert(es.requestCount == 3) // 500+500+200
      val sizes = (0 until es.requests.size).map(i =>
        es.requests.get(i).split('\n').count(_.nonEmpty) / 2).sorted
      assert(sizes == Seq(200, 500, 500))
    } finally es.stop()
  }

  test("partial rejects parsed from real bulk response, round-trip to K4 dead letter") {
    val es = new StubEsServer(rejectIf = _.contains("poison"))
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(20, bad = Set(3, 17)), PipelineConfig(),
        () => new HttpBulkTransport(ep))
      val got = rejects.collect()
      assert(got.map(_.id).sorted.toSeq == Seq("id-17", "id-3"))
      assert(got.forall(_.error == "mapper_parsing_exception: failed to parse field"))
      assert(got.forall(_.source.contains("poison"))) // source preserved for replay

      // K4: rejected actions land in the dead-letter sink
      val dir = Files.createTempDirectory("dl-es").toString
      DeadLetterSink.writeRejected(rejects.toDF(), PipelineConfig(deadLetterPath = dir))
      val found = Files.walk(new java.io.File(dir).toPath).iterator()
      var sawGz = false
      while (found.hasNext) { if (found.next().toString.endsWith(".gz")) sawGz = true }
      assert(sawGz)
    } finally es.stop()
  }

  test("malformed 2xx body rejects the chunk WITHOUT re-POSTing it") {
    // JsonProcessingException extends IOException; it must not fall into
    // the transport's retry loop — the chunk was ACCEPTED (2xx), so a
    // resend would redo indexed work (reference fails here, main.py:145-148)
    val es = new StubEsServer(malformedBody = true)
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(3).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, maxRetries = 3, sleeper = _ => ()))
      val got = rejects.collect()
      assert(got.length == 3)
      assert(got.forall(_.error.startsWith("bulk_response_unparseable")))
      assert(got.forall(_.status == 200)) // the chunk-level HTTP status
      assert(es.requestCount == 1, "an accepted chunk must never be re-POSTed")
    } finally es.stop()
  }

  test("mixed per-action statuses (409/429) surface in rejects and the dead-letter record") {
    val es = new StubEsServer(statusIf = s =>
      if (s.contains("id-2")) Some(409) else if (s.contains("id-4")) Some(429) else None)
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(5).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep))
      val got = rejects.collect().sortBy(_.id)
      assert(got.map(r => (r.id, r.status)).toSeq == Seq(("id-2", 409), ("id-4", 429)))

      // the reference-layout error record carries the real status, not a
      // hardcoded 400 (reference BulkIndexError entries, main.py:149-153)
      val dir = Files.createTempDirectory("dl-status").toString
      val fixed = java.time.Instant.parse("2020-09-15T10:00:00Z").toEpochMilli
      DeadLetterSink.writeRejectedReferenceLayout(
        rejects.coalesce(1), PipelineConfig(deadLetterPath = dir), () => fixed)
      val day = new java.io.File(s"$dir/es_rejected/2020-09/15")
      val f = Option(day.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".gz")).getOrElse(fail("no dead-letter object"))
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
      val lines = new String(in.readAllBytes(), "UTF-8").split('\n').sorted
      in.close()
      assert(lines.length == 2)
      assert(lines(0).contains(""""_id":"id-2","status":409"""))
      assert(lines(1).contains(""""_id":"id-4","status":429"""))
    } finally es.stop()
  }

  test("503s retried with exponential backoff, then succeed") {
    val es = new StubEsServer(failFirstN = 2)
    val ep = es.endpoint
    HttpSinkSpec.sleeps.clear()
    try {
      val rejects = BulkSink.push(goodDf(5).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, maxRetries = 3,
          backoffBaseMs = 200, sleeper = ms => { HttpSinkSpec.sleeps.add(ms); () }))
      assert(rejects.count() == 0)
      assert(es.requestCount == 3) // 2 failures + 1 success
      val slept = HttpSinkSpec.sleeps
      assert((0 until slept.size).map(slept.get) == Seq(200L, 400L))
    } finally es.stop()
  }

  test("exhausted retries fail the task (at-least-once: Spark retry takes over)") {
    val es = new StubEsServer(failFirstN = Int.MaxValue)
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(5).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, maxRetries = 1, sleeper = _ => ()))
      val e = intercept[org.apache.spark.SparkException] { rejects.count() }
      assert(e.getMessage.contains("failed after") || e.getCause != null)
    } finally es.stop()
  }

  test("non-retryable status (400) rejects the chunk as data, no infinite retry") {
    val es = new StubEsServer(failFirstN = Int.MaxValue, failCode = 400)
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(4).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, sleeper = _ => ()))
      val got = rejects.collect()
      assert(got.length == 4)
      assert(got.forall(_.error == "bulk_request_failed: HTTP 400"))
      assert(es.requestCount == 1)
    } finally es.stop()
  }

  test("auth failure (403) fails the task instead of dead-lettering the corpus") {
    val es = new StubEsServer(failFirstN = Int.MaxValue, failCode = 403)
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(4).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, sleeper = _ => ()))
      val e = intercept[org.apache.spark.SparkException] { rejects.count() }
      assert(e.getMessage.contains("rejected credentials") ||
        Option(e.getCause).exists(_.getMessage.contains("rejected credentials")))
      assert(es.requestCount == 1) // no pointless retry on a hard auth error
    } finally es.stop()
  }

  test("request timeout (ES_TIMEOUT analogue) trips retry") {
    val es = new StubEsServer(delayMs = 2500)
    val ep = es.endpoint
    try {
      val rejects = BulkSink.push(goodDf(2).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, timeoutSec = 1,
          maxRetries = 0, sleeper = _ => ()))
      intercept[org.apache.spark.SparkException] { rejects.count() }
    } finally es.stop()
  }

  test("SigV4 headers attached when credentials configured") {
    val es = new StubEsServer()
    val ep = es.endpoint
    try {
      val creds = SigV4Credentials("AKIDEXAMPLE", "secret", "ap-northeast-1",
        sessionToken = Some("tok"))
      val rejects = BulkSink.push(goodDf(3).coalesce(1), PipelineConfig(),
        () => new HttpBulkTransport(ep, creds = Some(creds)))
      assert(rejects.count() == 0)
      val hs = es.headers.get(0)
      assert(hs("authorization").startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/"))
      assert(hs("authorization").contains("/ap-northeast-1/es/aws4_request"))
      assert(hs.contains("x-amz-date"))
      assert(hs.contains("x-amz-content-sha256"))
      assert(hs("x-amz-security-token") == "tok")
      // signed-header list must cover what we actually sign
      assert(hs("authorization").contains(
        "SignedHeaders=content-type;host;x-amz-date;x-amz-security-token"))
    } finally es.stop()
  }

  test("SigV4 matches the published AWS documentation test vector") {
    // AWS General Reference, SigV4 signing example: GET iam ListUsers,
    // 2015-08-30T12:36:00Z, us-east-1 — published expected signature.
    val creds = SigV4Credentials(
      "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "us-east-1", "iam")
    val at = java.time.Instant.parse("2015-08-30T12:36:00Z").toEpochMilli
    val out = SigV4.signedHeaders(
      creds, "GET",
      java.net.URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      Map("content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      Array.emptyByteArray, at)
    assert(out("x-amz-date") == "20150830T123600Z")
    assert(out("Authorization") ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("SigV4 percent-encodes non-ASCII bytes in path and query") {
    val creds = SigV4Credentials("AKIDEXAMPLE", "secret", "us-east-1", "es")
    val out = SigV4.signedHeaders(
      creds, "GET",
      java.net.URI.create("https://example.com/caf%C3%A9/doc?q=caf%C3%A9"),
      Map.empty, Array.emptyByteArray,
      java.time.Instant.parse("2020-09-15T10:00:00Z").toEpochMilli)
    // must not throw and must produce a stable signature: the canonical
    // request re-encodes the decoded path bytes as %XX (Latin-1 letters
    // like 0xC3/0xA9 are NOT unreserved despite Char.isLetterOrDigit)
    assert(out("Authorization").contains("Signature="))
    val again = SigV4.signedHeaders(
      creds, "GET",
      java.net.URI.create("https://example.com/caf%C3%A9/doc?q=caf%C3%A9"),
      Map.empty, Array.emptyByteArray,
      java.time.Instant.parse("2020-09-15T10:00:00Z").toEpochMilli)
    assert(out == again)
  }

  test("per-chunk metrics mirror X-Ray chunk annotations (K5)") {
    val es = new StubEsServer(rejectIf = _.contains("poison"))
    val ep = es.endpoint
    try {
      val acc = spark.sparkContext.collectionAccumulator[ChunkMetric]("chunks")
      val cfg = PipelineConfig(bulkChunkSize = 10)
      val rejects = BulkSink.push(goodDf(25, bad = Set(7)).coalesce(1), cfg,
        () => new HttpBulkTransport(ep), chunkMetrics = Some(acc))
      assert(rejects.count() == 1)
      val ms = (0 until acc.value.size).map(acc.value.get).sortBy(_.chunkNumber)
      assert(ms.map(m => (m.chunkNumber, m.chunkSize, m.rejectCount)) ==
        Seq((0, 10, 1), (1, 10, 0), (2, 5, 0)))
    } finally es.stop()
  }
}

object HttpSinkSpec {
  /** Static so executor-side writes are visible in-JVM despite closure
    * serialization in local mode. */
  val sleeps = new CopyOnWriteArrayList[Long]()
}
