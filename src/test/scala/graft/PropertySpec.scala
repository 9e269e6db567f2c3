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

  test("prefix filtering is lossless on random corpora (property)") {
    import org.apache.spark.sql.functions._
    // random docs over a small vocabulary — worst case for prefix
    // selectivity, best case for finding a recall bug
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hog")
    val docGen: Gen[String] =
      Gen.chooseNum(4, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
        .map(_.mkString(" "))
    (0 until 3).foreach { round =>
      val texts = (0 until 30).flatMap(i =>
        docGen.apply(Gen.Parameters.default, Seed(round * 100L + i)))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val all = (for (a <- texts.indices; b <- a + 1 until texts.size)
        yield (a.toLong, b.toLong)).toDF("id_a", "id_b")
      val truth = graft.ops.Dedup.jaccardVerify(all, df, "doc_id", "text")
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val got = graft.ops.Dedup.jaccardVerify(
          graft.ops.Dedup.prefixJaccardCandidates(df, "doc_id", "text", 0.6),
          df, "doc_id", "text")
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == truth, s"round $round: prefix filter dropped ${truth -- got}")
    }
  }

  test("winnowing detection guarantee holds on random strings (property)") {
    import org.apache.spark.sql.functions._
    // random docs sharing a random >= w+k-1 run must always share a
    // fingerprint; k=5, w=4 -> guaranteed at 8 shared chars
    val alpha = Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString)
    val run = Gen.listOfN(9, Gen.alphaLowerChar).map(_.mkString)
    (0 until 10).foreach { i =>
      val p1 = alpha.apply(Gen.Parameters.default, Seed(900L + 3 * i)).get
      val p2 = alpha.apply(Gen.Parameters.default, Seed(901L + 3 * i)).get
      val shared = run.apply(Gen.Parameters.default, Seed(902L + 3 * i)).get
      val df = Seq((1L, p1 + shared), (2L, shared + p2)).toDF("doc_id", "text")
      val fps = df.select(col("doc_id"),
          graft.ops.TextAnalysis.winnowFingerprints(col("text"), 5, 4).as("f"))
        .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
      assert(fps(1L).intersect(fps(2L)).nonEmpty,
        s"iteration $i: no shared fingerprint for shared run '$shared'")
    }
  }

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

  test("morton z-value round-trips through a reference deinterleave") {
    import org.apache.spark.sql.functions.col
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until 32) {
        if (((z >> (2 * i)) & 1L) == 1L) x |= 1L << i
        if (((z >> (2 * i + 1)) & 1L) == 1L) y |= 1L << i
      }
      (x, y)
    }
    val rnd = new java.util.Random(11)
    val pts = (0 until 300).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val zs = pts.toDF("x", "y")
      .select(graft.ops.Layout.zValue2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(zs.map(deinterleave) == pts)
  }

  test("edit-distance blocking is complete on randomly perturbed strings") {
    import org.apache.spark.sql.functions.col
    // random base words + <=2 random edits each: every true pair within
    // distance 2 must come out of the segment-blocked join
    val rnd = new java.util.Random(23)
    val alpha = "abcdefgh"
    def word(len: Int): String =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = rnd.nextInt(3) match {
      case 0 if s.length > 3 => // delete
        val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1)
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
      case _ => // substitute
        val i = rnd.nextInt(s.length)
        s.updated(i, alpha(rnd.nextInt(alpha.length)))
    }
    val names = (0 until 60).flatMap { _ =>
      val base = word(5 + rnd.nextInt(8))
      Seq(base, edit(base), edit(edit(base)))
    }.distinct.filter(_.length >= 3)
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b
      dd = ed(a, b) if dd <= 2
    } yield (a, b, dd)).toSet
    val got = graft.ops.EntityResolution.fuzzySelfJoin(
        names.toDF("n"), "n", tau = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == want, s"missing=${want -- got}\nextra=${got -- want}")
  }

  test("scd2 invariants: one open row per key, ordered validity, idempotent") {
    import org.apache.spark.sql.functions.col
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val rnd = new java.util.Random(31)
    val hist = (1L to 40L).map(i =>
        (i, s"t${rnd.nextInt(4)}", Some(d0), Option.empty[java.sql.Date]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val batches = (1 to 3).map { b =>
      (1L to 50L).filter(_ => rnd.nextBoolean()).map(i =>
        (i, s"t${rnd.nextInt(4)}",
          java.sql.Date.valueOf(s"2024-0${b + 1}-15")))
        .toDF("k", "attr", "uts")
    }
    val merged = batches.foldLeft(hist) { (h, b) =>
      graft.ops.Scd2.merge(h, b, "k", "uts", Seq("attr")).localCheckpoint()
    }
    val openPerKey = merged.filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(openPerKey == 0, "a key has multiple open rows")
    val disordered = merged.filter(col("valid_to").isNotNull &&
      col("valid_from") >= col("valid_to")).count()
    assert(disordered == 0, "closed row with valid_from >= valid_to")
    // replaying the last batch changes nothing
    val replay = graft.ops.Scd2.merge(merged, batches.last, "k", "uts", Seq("attr"))
    assert(replay.except(merged).isEmpty && merged.except(replay).isEmpty)
  }

  test("span dedup invariants on random corpora (property)") {
    import org.apache.spark.sql.functions._
    // small vocabulary maximizes duplicated k-grams — the stress case
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docGen: Gen[String] =
      Gen.chooseNum(2, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
        .map(_.mkString(" "))
    (0 until 3).foreach { round =>
      val texts = (0 until 25).flatMap(i =>
        docGen.apply(Gen.Parameters.default, Seed(round * 1000L + i)))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 3
      // 1. coverage is bounded by the doc: 0 <= n_dup <= n_tokens
      val cov = graft.ops.SpanDedup.coverage(docs, "doc_id", "text", k)
        .as[(Long, Long, Long, Double)].collect()
      assert(cov.forall(c => c._3 >= 0 && c._3 <= c._2), s"round $round: $cov")
      assert(cov.length == texts.length)
      // 2. cleaned text is a SUBSEQUENCE of the original (removal can
      // reorder or invent nothing), and survivors <= originals
      val cleaned = graft.ops.SpanDedup.removeDupSpans(docs, "doc_id", "text", k)
        .as[(Long, String)].collect().toMap
      def isSubseq(sub: Seq[String], sup: Seq[String]): Boolean = {
        var i = 0
        sup.foreach(t => if (i < sub.length && sub(i) == t) i += 1)
        i == sub.length
      }
      texts.zipWithIndex.foreach { case (orig, id) =>
        val after = cleaned.get(id.toLong).filter(_.nonEmpty)
          .map(_.split(" ").toSeq).getOrElse(Seq.empty)
        assert(isSubseq(after, orig.split(" ").toSeq),
          s"round $round doc $id: '$after' not a subsequence of '$orig'")
      }
      // 3. removal never exceeds coverage: only tokens inside SOME
      // duplicated k-gram occurrence may be dropped, so per doc
      // survivors >= n_tokens - n_dup (a first occurrence is only ever
      // lost to a DIFFERENT overlapping duplicated k-gram, which
      // coverage already counts)
      cov.foreach { case (id, nTok, nDup, _) =>
        val after = cleaned.get(id).filter(_.nonEmpty)
          .map(_.split(" ").length.toLong).getOrElse(0L)
        assert(after >= nTok - nDup && after <= nTok,
          s"round $round doc $id: $after survivors outside [$nTok-$nDup, $nTok]")
      }
    }
  }
}
