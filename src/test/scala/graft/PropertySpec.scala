package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.config.PipelineConfig
import graft.decode.Decode
import graft.functions.{GzipUtil, Kpl}
import graft.route.Router

/** Property-based invariants (SURVEY.md §5.2.2). Raw ScalaCheck generators
  * sampled with fixed seeds (the scalatest-scalacheck bridge isn't in the
  * offline dependency cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = PipelineConfig()

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val payloadGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s"""{"log_type":"t$s","time":"2020-09-15T10:21:33Z","log_id":"$s"}"""),
    Gen.alphaNumStr, // junk
    Gen.alphaNumStr.map(s => s"""{"log_type":"t$s"}"""),
    Gen.alphaNumStr.map(s => s"""{"time":"2020-09-15T10:21:33Z","log_id":"$s"}"""))

  test("routing totality: channels partition every batch") {
    val payloads = samples(payloadGen, 40)
    assert(payloads.size >= 30)
    val routed = Router.route(payloads.toDF("payload"), cfg)
    val n = routed.count()
    val parts = Router.good(routed).count() + Router.failed(routed).count() +
      Router.dropped(routed).count()
    assert(n == payloads.size && parts == n)
  }

  test("day-name parse roundtrip: format(t) parses back to t for random instants") {
    import java.time.format.DateTimeFormatter
    import java.time.{Instant, ZoneOffset}
    import java.util.Locale
    val fmts = Seq(
      DateTimeFormatter.RFC_1123_DATE_TIME,
      DateTimeFormatter.ofPattern("EEE MMM d HH:mm:ss uuuu", Locale.US),
      DateTimeFormatter.ofPattern("EEE MMM d HH:mm:ss 'GMT' uuuu", Locale.US),
      DateTimeFormatter.ofPattern("EEEE, d MMMM uuuu HH:mm:ss", Locale.US))
    val instants = samples(Gen.chooseNum(0L, 4102444800L), 50) // 1970..2100
      .map(Instant.ofEpochSecond(_))
    instants.foreach { t =>
      fmts.foreach { f =>
        val s = f.withZone(ZoneOffset.UTC).format(t)
        val parsed = graft.functions.DateUtilParse.parseMicros(s)
        assert(parsed != null && parsed == t.getEpochSecond * 1000000L,
          s"roundtrip failed for '$s'")
      }
    }
  }

  test("decode invariance: gzip(payload) decodes identically to payload") {
    val ps = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 25)
    val plain = ps.zipWithIndex.map { case (p, i) => (s"$i", s"$i", p.getBytes(UTF_8)) }
      .toDF("partitionKey", "sequenceNumber", "data")
    val zipped = ps.zipWithIndex.map { case (p, i) => (s"$i", s"$i", GzipUtil.gzipString(p)) }
      .toDF("partitionKey", "sequenceNumber", "data")
    val a = Decode.normalize(plain).select("payload").as[String].collect().sorted.toSeq
    val b = Decode.normalize(zipped).select("payload").as[String].collect().sorted.toSeq
    assert(a == b)
  }

  test("KPL roundtrip: aggregate then deaggregate preserves payloads") {
    (0 until 50).foreach { i =>
      val ps = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 1 + i % 7)
      val agg = Kpl.aggregate(ps.map(_.getBytes(UTF_8)))
      val out = Kpl.deaggregate(agg).map(new String(_, UTF_8)).toSeq
      assert(out == ps, s"roundtrip failed for $ps")
    }
  }

  test("KPL parser never throws on adversarial bytes (fuzz)") {
    val rnd = new java.util.Random(42)
    (0 until 500).foreach { i =>
      val len = rnd.nextInt(200)
      val bytes = new Array[Byte](len + 4)
      rnd.nextBytes(bytes)
      if (i % 2 == 0) { // force the magic prefix half the time
        bytes(0) = 0xF3.toByte; bytes(1) = 0x89.toByte
        bytes(2) = 0x9A.toByte; bytes(3) = 0xC2.toByte
      }
      val out = Kpl.deaggregate(bytes) // must not throw
      assert(out.nonEmpty)
    }
  }

  test("KPL parser rejects MD5-valid aggregates with hostile varint lengths") {
    // magic + field-3 key + varint encoding 2^64-12 (toInt would be -12)
    val body = new java.io.ByteArrayOutputStream()
    body.write(26) // field 3, wire type 2
    val huge = -12L // unsigned 2^64-12
    var v = huge
    var i = 0
    while (i < 9) { body.write((((v & 0x7f) | 0x80)).toInt); v >>>= 7; i += 1 }
    body.write(v.toInt)
    val bodyBytes = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte), 0, 4)
    out.write(bodyBytes, 0, bodyBytes.length)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bodyBytes)
    out.write(md5, 0, md5.length)
    val crafted = out.toByteArray
    // must terminate and degrade to pass-through, not hang or fabricate
    val res = Kpl.deaggregate(crafted)
    assert(res.length == 1 && (res.head sameElements crafted))
  }

  test("gunzip never throws on adversarial bytes (fuzz)") {
    val rnd = new java.util.Random(7)
    (0 until 500).foreach { i =>
      val bytes = new Array[Byte](rnd.nextInt(100) + 2)
      rnd.nextBytes(bytes)
      if (i % 2 == 0) { bytes(0) = 0x1f.toByte; bytes(1) = 0x8b.toByte }
      GzipUtil.gunzipIfNeeded(bytes) // must not throw
    }
  }

  test("index-name grammar: {prefix}-{type}-{8 digits}") {
    val routed = Pipeline.transform(
      Pipeline.eventsAsEnvelopes(spark, "/root/testdata/sf0.001"), cfg)
    val names = Router.good(routed).select("index_name").distinct().as[String].collect()
    val re = "^logs-[a-z]+-\\d{8}$".r
    assert(names.nonEmpty && names.forall(n => re.findFirstIn(n).isDefined))
  }
}
