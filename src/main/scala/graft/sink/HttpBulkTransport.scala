package graft.sink

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** K1: real HTTP Elasticsearch `_bulk` transport.
  *
  * Mirrors the reference's client contract (reference lambda/main.py:76-84,
  * 145-153): a 30 s timeout, one `_bulk` POST per chunk, and per-action
  * error extraction from the bulk response body (the equivalent of
  * `BulkIndexError.errors`). Differences are deliberate Spark-isms:
  *
  *  - Retries with bounded exponential backoff happen HERE, per chunk, on
  *    transport-level failures (connect/IO errors, HTTP 429/5xx). The
  *    reference leans on Lambda+Kinesis re-invocation for this; in Spark the
  *    analogue (task retry) would re-send every chunk in the partition, so
  *    chunk-local retry is strictly cheaper.
  *  - Per-action rejects (HTTP 200 with `"errors":true`) are NOT retried —
  *    they are data errors (mapper_parsing_exception etc.), returned to the
  *    caller and routed to the dead-letter sink (K4), exactly like the
  *    reference's `failed_data_es` path (lambda/main.py:149-153,163-172).
  *  - When retries are exhausted the chunk send THROWS, failing the Spark
  *    task: Spark's task retry + the sink's at-least-once contract take over
  *    (same effective semantics as a failed Lambda invocation being re-driven
  *    by the event source mapping).
  *
  * Optionally signs each request with AWS SigV4 (the reference's AWS4Auth,
  * lambda/main.py:52-58) — see [[SigV4]].
  *
  * Instantiated per partition via the `() => BulkTransport` factory; the
  * HttpClient is built lazily on first use so the instance itself stays
  * trivially serializable.
  */
final class HttpBulkTransport(
    endpoint: String,
    timeoutSec: Int = 30,
    maxRetries: Int = 3,
    backoffBaseMs: Long = 200,
    creds: Option[SigV4Credentials] = None,
    /** Injectable for deterministic tests; default wall clock. */
    clockMillis: () => Long = () => System.currentTimeMillis(),
    /** Injectable for tests; default real sleep. */
    sleeper: Long => Unit = Thread.sleep) extends BulkTransport {

  // one JVM-wide client per timeout: a JDK HttpClient owns a selector
  // thread and connection pool, and Java 17 has no close() — building one
  // per partition task would leak threads on long-lived executors
  @transient private lazy val client: HttpClient =
    HttpBulkTransport.sharedClient(timeoutSec)

  @transient private lazy val mapper = new ObjectMapper()

  private def bulkUri: URI = {
    val base = if (endpoint.endsWith("/")) endpoint.dropRight(1) else endpoint
    URI.create(s"$base/_bulk")
  }

  override def sendChunk(body: String, actions: Seq[BulkAction]): Seq[BulkReject] = {
    val bytes = body.getBytes(UTF_8)
    val uri = bulkUri
    var attempt = 0
    var lastErr: String = ""
    while (attempt <= maxRetries) {
      if (attempt > 0) sleeper(backoffBaseMs << (attempt - 1)) // 200,400,800…
      try {
        val builder = HttpRequest.newBuilder(uri)
          .timeout(Duration.ofSeconds(timeoutSec.toLong))
          .header("Content-Type", "application/x-ndjson")
          .POST(HttpRequest.BodyPublishers.ofByteArray(bytes))
        creds.foreach { c =>
          SigV4.signedHeaders(c, "POST", uri,
            Map("content-type" -> "application/x-ndjson"), bytes, clockMillis())
            .foreach { case (k, v) => builder.header(k, v) }
        }
        val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case code @ (200 | 201) =>
            // A 2xx means ES ACCEPTED the chunk — from here on, failure to
            // parse the response body must NOT fall into the retry loop
            // (JsonProcessingException extends IOException): re-POSTing an
            // already-indexed chunk would redo the work the effectively-once
            // `_id` story exists to avoid. Unknowable per-action outcomes are
            // surfaced as rejects for reconciliation (replaying a reject is
            // idempotent under `_id`), not resent.
            return (try parseRejects(resp.body(), actions) catch {
              case e: com.fasterxml.jackson.core.JsonProcessingException =>
                actions.map(a => BulkReject(a.indexName, a.id, a.source,
                  s"bulk_response_unparseable: ${e.getOriginalMessage}", code))
            })
          case code if code == 429 || code >= 500 =>
            lastErr = s"HTTP $code: ${resp.body().take(200)}" // retryable
          case code if code == 401 || code == 403 =>
            // auth/credential misconfiguration is an OPERATIONAL failure:
            // fail the task immediately (not IOException — that would be
            // swallowed into the retry loop) rather than silently
            // dead-lettering the entire corpus as "data errors"
            throw new IllegalStateException(
              s"ES bulk endpoint rejected credentials: HTTP $code ${resp.body().take(200)}")
          case code =>
            // other non-retryable envelope failures (e.g. 400 bad request):
            // the chunk is rejected as data — do not fail the task forever
            return actions.map(a =>
              BulkReject(a.indexName, a.id, a.source, s"bulk_request_failed: HTTP $code", code))
        }
      } catch {
        case e: java.io.IOException => lastErr = s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"ES bulk chunk failed after ${maxRetries + 1} attempts: $lastErr")
  }

  /** Extract per-action rejects from a real `_bulk` response body:
    * `{"errors":true,"items":[{"index":{"status":400,"error":{...}}},…]}`.
    * Items align positionally with the request's actions. */
  private def parseRejects(responseBody: String, actions: Seq[BulkAction]): Seq[BulkReject] = {
    val root = mapper.readTree(responseBody)
    if (root == null || !root.path("errors").asBoolean(false)) return Nil
    val items = root.path("items")
    actions.iterator.zipWithIndex.flatMap { case (a, i) =>
      val op = items.path(i).path("index")
      val status = op.path("status").asInt(200)
      if (status >= 300) {
        val err: JsonNode = op.path("error")
        val msg =
          if (err.isMissingNode || err.isNull) s"HTTP $status"
          else if (err.isTextual) err.asText()
          else s"${err.path("type").asText("unknown")}: ${err.path("reason").asText("")}"
        Some(BulkReject(a.indexName, a.id, a.source, msg, status))
      } else None
    }.toVector
  }
}

object HttpBulkTransport {
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Int, HttpClient]()

  /** One HttpClient per (JVM, connect-timeout): thread-safe by contract,
    * reused across all partition tasks and micro-batches. */
  private[sink] def sharedClient(timeoutSec: Int): HttpClient =
    clients.computeIfAbsent(timeoutSec, t => HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(t.toLong))
      .build())
}
