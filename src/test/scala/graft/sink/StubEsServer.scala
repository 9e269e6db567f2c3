package graft.sink

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-test localhost Elasticsearch `_bulk` stub (JDK HttpServer — no deps,
  * no egress). Parses real NDJSON bulk bodies and answers with a real
  * ES-shaped bulk response: `{"took":…,"errors":…,"items":[{"index":
  * {"_index":…,"_id":…,"status":…,"error":{…}}},…]}`, so the transport's
  * reject parsing is exercised against the actual wire format.
  *
  * Knobs:
  *  - `rejectIf`: source lines matching this predicate get status 400 with a
  *    mapper_parsing_exception error object (partial failure, K2).
  *  - `statusIf`: per-source status override — Some(409/429/…) makes the
  *    item fail with that status (mixed-status reject plumbing).
  *  - `failFirstN`: first N requests answered 503 (retry path).
  *  - `failNthMod`: if > 0, every Nth request answered `failCode` — the
  *    transient-chaos knob (bursty 503s mid-stream; retries must recover).
  *  - `delayMs`: per-request artificial latency (timeout path).
  *  - `malformedBody`: answer 200 with a non-JSON body (the transport must
  *    NOT re-POST an accepted chunk it cannot parse the outcome of).
  */
final class StubEsServer(
    rejectIf: String => Boolean = _ => false,
    statusIf: String => Option[Int] = _ => None,
    failFirstN: Int = 0,
    failNthMod: Int = 0,
    failCode: Int = 503,
    delayMs: Long = 0,
    malformedBody: Boolean = false) {

  val requests = new CopyOnWriteArrayList[String]()           // bodies seen
  val headers = new CopyOnWriteArrayList[Map[String, String]]() // headers seen
  /** (request body, response code) appended atomically per exchange —
    * `requests` and a separate code list could interleave differently
    * under concurrent POSTs. */
  val exchanges = new CopyOnWriteArrayList[(String, Int)]()
  private val hits = new AtomicInteger(0)

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/_bulk", (ex: HttpExchange) => handle(ex))
    s.start()
    s
  }

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def requestCount: Int = hits.get()

  private def handle(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val n = hits.incrementAndGet()
    if (delayMs > 0) Thread.sleep(delayMs)
    requests.add(body)
    val hs = ex.getRequestHeaders
    val keys = hs.keySet().toArray(Array.empty[String])
    headers.add(keys.map(k => k.toLowerCase -> hs.getFirst(k)).toMap)

    if (n <= failFirstN || (failNthMod > 0 && n % failNthMod == 0)) {
      respond(ex, failCode, """{"error":"es_rejected_execution_exception"}""", body)
    } else if (malformedBody) {
      respond(ex, 200, "<html>definitely not a bulk response</html>", body)
    } else {
      // NDJSON: meta line + source line per action
      val lines = body.split('\n').filter(_.nonEmpty)
      val items = new StringBuilder
      var anyError = false
      var i = 0
      var first = true
      while (i + 1 < lines.length + 1 && i < lines.length) {
        val meta = lines(i)
        val source = if (i + 1 < lines.length) lines(i + 1) else ""
        val idx = extract(meta, "_index").getOrElse("unknown")
        val id = extract(meta, "_id")
        if (!first) items.append(',')
        first = false
        if (statusIf(source).nonEmpty) {
          val st = statusIf(source).get
          anyError = true
          items.append(s"""{"index":{"_index":"$idx"${id.map(v => s""","_id":"$v"""").getOrElse("")},"status":$st,"error":{"type":"status_$st","reason":"per-action status"}}}""")
        } else if (rejectIf(source)) {
          anyError = true
          items.append(s"""{"index":{"_index":"$idx"${id.map(v => s""","_id":"$v"""").getOrElse("")},"status":400,"error":{"type":"mapper_parsing_exception","reason":"failed to parse field","caused_by":{"type":"illegal_argument_exception"}}}}""")
        } else {
          items.append(s"""{"index":{"_index":"$idx"${id.map(v => s""","_id":"$v"""").getOrElse("")},"status":201,"result":"created"}}""")
        }
        i += 2
      }
      respond(ex, 200, s"""{"took":7,"errors":$anyError,"items":[${items.toString}]}""", body)
    }
  }

  /** Pull a string field out of the one-line action meta without a JSON dep
    * (test-side only; the meta is produced by BulkSink.bulkBody). */
  private def extract(meta: String, field: String): Option[String] = {
    val key = s""""$field":""""
    val at = meta.indexOf(key)
    if (at < 0) None
    else {
      val from = at + key.length
      val sb = new StringBuilder
      var i = from
      var done = false
      while (i < meta.length && !done) {
        meta.charAt(i) match {
          case '\\' if i + 1 < meta.length => sb.append(meta.charAt(i + 1)); i += 2
          case '"' => done = true
          case c => sb.append(c); i += 1
        }
      }
      Some(sb.toString)
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      requestBody: String = ""): Unit = {
    exchanges.add((requestBody, code))
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  def stop(): Unit = server.stop(0)
}
