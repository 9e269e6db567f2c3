package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import graft.config.PipelineConfig

/** K1–K4: bulk body format, 500-chunking, reject capture, dead-letter
  * layout + skip-if-empty (SURVEY.md §2.5, fixes F3/F4/F5). */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def goodDf(n: Int) =
    (1 to n).map(i => (s"logs-t-20200915", s"id-$i", s"""{"log_id":"id-$i"}"""))
      .toDF("index_name", "log_id", "payload")

  test("bulk body is exact ES _bulk NDJSON with _id") {
    val body = BulkSink.bulkBody(Seq(
      BulkAction("logs-nginx-20200915", "id-1", """{"a":1}"""),
      BulkAction("logs-app-20200915", null, """{"b":2}""")))
    assert(body ==
      "{\"index\":{\"_index\":\"logs-nginx-20200915\",\"_id\":\"id-1\"}}\n{\"a\":1}\n" +
        "{\"index\":{\"_index\":\"logs-app-20200915\"}}\n{\"b\":2}\n")
  }

  test("ES 7.x legacyType emits the reference's _type:_doc byte-for-byte") {
    // reference meta shape (lambda/main.py:116): _index, then _type, then
    // our idempotency _id — and through the whole sink path via cfg
    val body = BulkSink.bulkBody(Seq(
      BulkAction("logs-nginx-20200915", "id-1", """{"a":1}""")), legacyType = true)
    assert(body ==
      "{\"index\":{\"_index\":\"logs-nginx-20200915\",\"_type\":\"_doc\",\"_id\":\"id-1\"}}\n{\"a\":1}\n")

    val dir = Files.createTempDirectory("bulk-es7").toString
    val rejects = BulkSink.push(goodDf(2).coalesce(1),
      PipelineConfig(esLegacyType = true), () => new FileBulkTransport(dir))
    assert(rejects.count() == 0)
    val sent = new java.io.File(dir).listFiles().toSeq
      .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
    assert(sent.contains("\"_type\":\"_doc\""))
  }

  test("bulk meta JSON-escapes quotes, backslashes, and control chars in ids") {
    val body = BulkSink.bulkBody(Seq(
      BulkAction("idx-\"quoted\"", "id\\with\"specials\nand\tctrl", "{}")))
    // the meta must stay ONE valid JSON line (raw control chars would
    // break the NDJSON bulk framing)
    val metaLine = body.split('\n').head
    val expected = "{\"index\":{\"_index\":\"idx-\\\"quoted\\\"\"," +
      "\"_id\":\"id\\\\with\\\"specials\\u000aand\\u0009ctrl\"}}"
    assert(metaLine == expected)
  }

  test("501 actions split into chunks of 500+1 (reference BULK_CHUNK_SIZE)") {
    val dir = Files.createTempDirectory("bulk").toString
    val rejects = BulkSink.push(goodDf(501).coalesce(1), PipelineConfig(),
      () => new FileBulkTransport(dir))
    assert(rejects.count() == 0)
    val files = new java.io.File(dir).listFiles().toSeq
    val sizes = files.map(f =>
      Files.readAllLines(f.toPath).size / 2).sorted // 2 lines per action
    assert(sizes == Seq(1, 500))
  }

  test("per-action rejects stream back as a Dataset (K2)") {
    val rejects = BulkSink.push(goodDf(10), PipelineConfig(),
      () => new RejectingTransport(a => a.id == "id-3" || a.id == "id-7"))
    assert(rejects.collect().map(_.id).sorted.toSeq == Seq("id-3", "id-7"))
  }

  test("K4 reference layout: processing-time key %Y-%m/%d/%Y-%m-%d-%H:%M:%S.gz") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dl-ref").toString
    val cfg = PipelineConfig(deadLetterPath = dir)
    val rejects = Seq(
      BulkReject("logs-a-20200915", "id-1", """{"log_id":"id-1"}""", "mapper_parsing_exception"),
      BulkReject("logs-a-20200915", "id-2", """{"log_id":"id-2"}""", "mapper_parsing_exception"))
      .toDS().coalesce(1)
    val fixed = java.time.Instant.parse("2020-09-15T10:00:00Z").toEpochMilli
    DeadLetterSink.writeRejectedReferenceLayout(rejects, cfg, () => fixed)
    val day = new java.io.File(s"$dir/es_rejected/2020-09/15")
    val files = Option(day.listFiles()).getOrElse(Array.empty)
    // processing-time key + partition + task-attempt disambiguator
    val f = files.find(_.getName.matches("2020-09-15-10:00:00-p0-a\\d+\\.gz"))
      .getOrElse(fail(s"expected reference-keyed object, found ${files.map(_.getName).toSeq}"))
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
    val lines = new String(in.readAllBytes(), "UTF-8").split('\n')
    in.close()
    assert(lines.length == 2)
    assert(lines(0) == """{"index":{"_index":"logs-a-20200915","_id":"id-1","status":400,"error":"mapper_parsing_exception","data":{"log_id":"id-1"}}}""")

    // skip-if-empty: no object for an empty reject set
    val dir2 = Files.createTempDirectory("dl-ref2").toString
    DeadLetterSink.writeRejectedReferenceLayout(
      rejects.limit(0), cfg.copy(deadLetterPath = dir2), () => fixed)
    assert(!new java.io.File(s"$dir2/es_rejected").exists())
  }

  test("dead-letter layout {log_type}/{yyyy-MM}/{dd}, gzip, skip-if-empty") {
    val dir = Files.createTempDirectory("dl").toString
    val cfg = PipelineConfig(deadLetterPath = dir)
    val failed = Seq(
      ("unknown", java.sql.Timestamp.valueOf("2020-09-15 10:00:00"), """{"x":1}"""),
      ("nginx", java.sql.Timestamp.valueOf("2020-10-01 00:00:00"), """{"y":2}"""))
      .toDF("log_type", "event_ts", "payload")
    DeadLetterSink.writeFailed(failed, cfg, "failed_validation")
    val root = new java.io.File(s"$dir/failed_validation")
    val parts = Files.walk(root.toPath).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var dirs = List.empty[String]
    while (parts.hasNext) { val p = parts.next(); if (p.toFile.isDirectory) dirs ::= root.toPath.relativize(p).toString }
    assert(dirs.exists(_.contains("log_type=unknown/ym=2020-09/dd=15")))
    assert(dirs.exists(_.contains("log_type=nginx/ym=2020-10/dd=01")))
    // gzip'd part files
    val gz = Files.walk(root.toPath).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var sawGz = false
    while (gz.hasNext) { if (gz.next().toString.endsWith(".gz")) sawGz = true }
    assert(sawGz)

    // skip-if-empty (F4 fix): empty write leaves no new partition dirs
    val dir2 = Files.createTempDirectory("dl2").toString
    DeadLetterSink.writeFailed(failed.limit(0), cfg.copy(deadLetterPath = dir2), "r")
    val out2 = new java.io.File(s"$dir2/r")
    val leafDirs = Option(out2.listFiles()).map(_.filter(_.isDirectory)).getOrElse(Array.empty)
    assert(leafDirs.isEmpty)
  }
}
