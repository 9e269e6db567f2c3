package graft.sink

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

import graft.config.PipelineConfig

/** One indexable action: ES `_bulk` meta + source document. */
final case class BulkAction(indexName: String, id: String, source: String)

/** Outcome of pushing one action (K2 partial-failure capture;
  * reference lambda/main.py:149-153). `status` is the per-action HTTP
  * status from the bulk response item (409/429/503/…) — the reference's
  * `BulkIndexError.errors` entries carry it; 400 when the transport can
  * only classify the failure as a data error. */
final case class BulkReject(indexName: String, id: String, source: String, error: String,
                            status: Int = 400)

/** K5: per-chunk send annotation — the Spark analogue of the reference's
  * X-Ray `chunk_number`/`chunk_size` subsegment annotations
  * (reference lambda/main.py:134-143). `partitionId` replaces the Lambda
  * invocation as the unit of parallelism; `chunkNumber` is 0-based within
  * the partition, like the reference's `enumerate(split_list(...))`. */
final case class ChunkMetric(partitionId: Int, chunkNumber: Int, chunkSize: Int, rejectCount: Int)

/** Transport behind the bulk sink. Instantiated once per partition
  * (mirroring the reference's one ES client per invocation,
  * lambda/main.py:76-84); implementations must be cheap to construct or
  * pool internally.
  *
  * Offline/test implementations write NDJSON bulk bodies to files; a
  * production implementation would POST to `_bulk` with SigV4 auth.
  */
trait BulkTransport extends Serializable {
  /** Send one chunk (≤ chunkSize actions) as an ES bulk request.
    * @param body NDJSON: action-meta line + source line per action
    * @param actions the actions, aligned with the body
    * @return per-action rejects (empty = all indexed) */
  def sendChunk(body: String, actions: Seq[BulkAction]): Seq[BulkReject]
  def close(): Unit = ()
}

/** Writes each bulk body to a uniquely named NDJSON file under `dir` —
  * the zero-egress stand-in for the ES `_bulk` endpoint, and the golden-
  * test observable (byte-exact bulk bodies, SURVEY.md §5.2). */
final class FileBulkTransport(dir: String) extends BulkTransport {
  override def sendChunk(body: String, actions: Seq[BulkAction]): Seq[BulkReject] = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val f = java.io.File.createTempFile("bulk-", ".ndjson", d)
    java.nio.file.Files.write(f.toPath, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Nil
  }
}

/** Test transport rejecting actions by predicate — exercises K2. */
final class RejectingTransport(rejectIf: BulkAction => Boolean) extends BulkTransport {
  override def sendChunk(body: String, actions: Seq[BulkAction]): Seq[BulkReject] =
    actions.filter(rejectIf).map(a => BulkReject(a.indexName, a.id, a.source, "mapper_parsing_exception"))
}

/** K1: ES bulk sink. Distributed — each partition chunks its actions into
  * ≤`bulkChunkSize` NDJSON bodies and sends them through the transport;
  * rejects stream back as a DataFrame (no driver-side collect anywhere).
  * At 100 TB scale the parallelism is the partition count; there is no
  * shuffle on this path.
  */
object BulkSink {

  /** Build the exact `_bulk` NDJSON body for a chunk. Meta matches the
    * reference's action envelope (lambda/main.py:116) plus `_id` (F5 fix);
    * `legacyType = true` adds the reference's ES 7.x `"_type":"_doc"`.
    * JSON string escaping is delegated to the source being already-JSON and
    * ids being JSON-escaped here. */
  def bulkBody(actions: Seq[BulkAction], legacyType: Boolean = false): String = {
    val sb = new StringBuilder(actions.iterator.map(_.source.length + 64).sum)
    actions.foreach { a =>
      sb.append("{\"index\":{\"_index\":\"").append(jsonEscape(a.indexName)).append('"')
      if (legacyType) sb.append(",\"_type\":\"_doc\"")
      if (a.id != null) sb.append(",\"_id\":\"").append(jsonEscape(a.id)).append('"')
      sb.append("}}\n").append(a.source).append('\n')
    }
    sb.toString
  }

  private[sink] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Push `good` (needs columns index_name, log_id, payload) through the
    * transport; returns the rejects as a Dataset (route to the dead-letter
    * sink, K4). Lazily evaluated — the caller must run EXACTLY ONE action
    * on the result (the send is a side effect; task retries re-send their
    * partition, the reference's at-least-once semantics).
    *
    * @param rejectCounter optional accumulator so callers get the reject
    *        count from the same single pass that writes them — a second
    *        counting action would re-send every chunk, and collecting
    *        rejects to the driver is unbounded when rejection is systemic.
    * @param chunkMetrics optional accumulator receiving one [[ChunkMetric]]
    *        per chunk sent — the reference's per-chunk X-Ray annotations
    *        (K5, lambda/main.py:134-143). Bounded: one entry per ≤500-action
    *        chunk, not per row.
    */
  def push(good: DataFrame, cfg: PipelineConfig, transport: () => BulkTransport,
           rejectCounter: Option[org.apache.spark.util.LongAccumulator] = None,
           chunkMetrics: Option[org.apache.spark.util.CollectionAccumulator[ChunkMetric]] = None)
      : Dataset[BulkReject] = {
    val chunkSize = cfg.bulkChunkSize
    val legacyType = cfg.esLegacyType
    implicit val rejectEnc = Encoders.product[BulkReject]
    implicit val actionEnc = Encoders.product[BulkAction]
    good
      .selectExpr("index_name as indexName", "log_id as id", "payload as source")
      .as[BulkAction]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val t = transport()
          val rejects = it.grouped(chunkSize).zipWithIndex.flatMap { case (chunk, i) =>
            val rs = t.sendChunk(bulkBody(chunk, legacyType), chunk)
            chunkMetrics.foreach(_.add(ChunkMetric(pid, i, chunk.size, rs.size)))
            rs
          }
          // exhaust before close: grouped is lazy
          val out = rejects.toVector
          t.close()
          rejectCounter.foreach(_.add(out.size))
          out.iterator
        }
      }
  }
}
