package graft.route

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.PipelineConfig

/** P1–P6 parse/validate/route (SURVEY.md §2.3) including the F6/F7 fixes. */
class RouterSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = PipelineConfig()

  private def routeOf(payloads: String*): Seq[(String, String)] = {
    val df = payloads.toSeq.toDF("payload")
    Router.route(df, cfg).select("payload", "route").as[(String, String)].collect().toSeq
  }

  private val good = """{"log_type":"nginx","time":"2020-09-15T10:21:33.123456+09:00","log_id":"id-1"}"""

  test("valid record routes good") {
    assert(routeOf(good) == Seq(good -> Router.Route.Good))
  }

  test("non-JSON routes failed:not_json (README contract, defect F7 fixed)") {
    assert(routeOf("plaintext, not json").head._2 == Router.Route.NotJson)
  }

  test("missing log_type routes failed:missing_type") {
    assert(routeOf("""{"time":"2020-09-15T10:21:33Z"}""").head._2 == Router.Route.MissingType)
  }

  test("missing time routes failed:missing_timestamp") {
    assert(routeOf("""{"log_type":"nginx"}""").head._2 == Router.Route.MissingTimestamp)
  }

  test("unparseable time routes failed:bad_timestamp") {
    assert(routeOf("""{"log_type":"nginx","time":"never oclock"}""").head._2 ==
      Router.Route.BadTimestamp)
  }

  test("whitelist drops unlisted types; empty whitelist allows all (F6)") {
    val wl = cfg.copy(logTypeWhitelist = Some(Set("nginx")))
    val other = good.replace("nginx", "apache")
    val df = Seq(good, other).toDF("payload")
    val routed = Router.route(df, wl).select("payload", "route").as[(String, String)].collect().toMap
    assert(routed(good) == Router.Route.Good)
    assert(routed(other) == Router.Route.NotWhitelisted)

    val emptyWl = cfg.copy(logTypeWhitelist = Some(Set.empty))
    val routed2 = Router.route(df, emptyWl).filter(col("route") === Router.Route.Good).count()
    assert(routed2 == 2)
  }

  test("typeless records get the unknown prefix as grouping key (P5)") {
    val r = Router.route(Seq("""{"time":"2020-09-15T10:21:33Z"}""").toDF("payload"), cfg)
    assert(r.select("log_type").as[String].head() == "unknown")
  }

  test("configurable field names (renamed contract fields)") {
    val renamed = cfg.copy(logIdField = "id", logTypeField = "kind", logTimestampField = "at")
    val p = """{"kind":"nginx","at":"2020-09-15 10:21:33","id":"x9"}"""
    val r = Router.route(Seq(p).toDF("payload"), renamed)
    val row = r.select("route", "log_type", "log_id").as[(String, String, String)].head()
    assert(row == ((Router.Route.Good, "nginx", "x9")))
  }

  test("timestamp ladder: ISO, space-separated, CLF, compact, epoch s/ms") {
    val ok = Seq(
      "2020-09-15T10:21:33.123456+09:00",
      "2020-09-15 10:21:33",
      "2020/09/15 10:21:33",
      "15/Sep/2020:10:21:33 +0900",
      "20200915T102133Z",
      "1600164093",
      "1600164093123")
    val df = ok.toDF("ts")
    val parsed = df.select(Router.lenientTimestamp(col("ts")).isNotNull).as[Boolean].collect()
    assert(parsed.forall(identity), s"ladder failed on some of $ok")
  }

  test("timestamp ladder tail: day-name forms parse to the right instant (P3)") {
    val expect = java.sql.Timestamp.valueOf("2020-09-15 10:21:33") // session TZ = UTC
    val forms = Seq(
      "Tue, 15 Sep 2020 10:21:33 GMT",        // RFC-1123
      "Tue, 15 Sep 2020 19:21:33 +0900",      // RFC-1123 with offset
      "tue, 15 sep 2020 10:21:33 gmt",        // dateutil is case-insensitive
      "Tue Sep 15 10:21:33 2020",             // asctime
      "Tue Sep  15 10:21:33 2020",            // asctime space-padded day
      "Tue Sep 15 10:21:33 UTC 2020",         // date(1)
      "Tuesday, 15 September 2020 10:21:33",  // full names
      "Tue, 15 September 2020 10:21:33",      // MIXED: abbrev day, full month
      "Tuesday, 15 Sep 2020 10:21:33 GMT")    // MIXED: full day, abbrev month
    val got = forms.toDF("ts")
      .select(Router.lenientTimestamp(col("ts"))).as[Option[java.sql.Timestamp]].collect()
    forms.zip(got).foreach { case (f, t) =>
      assert(t.contains(expect), s"'$f' parsed to $t")
    }
    // still-unparseable day-name junk dead-letters (null), not mis-parses;
    // '…Sep 20…' guards that text-leniency did NOT relax numeric widths
    // (whole-formatter parseLenient would read it as year 20 AD)
    val bad = Seq("Xyz, 15 Sep 2020 10:21:33 GMT", "Tuesday the fifteenth",
      "Tue, 15 Sep 20 10:21:33")
      .toDF("ts").select(Router.lenientTimestamp(col("ts"))).as[Option[java.sql.Timestamp]].collect()
    assert(bad.forall(_.isEmpty))
  }

  test("routing totality: every record lands in exactly one channel") {
    val payloads = Seq(good, "junk", """{"log_type":"a"}""", """{"time":"2020-01-01T00:00:00Z"}""",
      """{"log_type":"b","time":"nope"}""")
    val routed = Router.route(payloads.toDF("payload"), cfg)
    val n = routed.count()
    val sum = Router.good(routed).count() + Router.failed(routed).count() +
      Router.dropped(routed).count()
    assert(n == payloads.size && sum == n)
  }

  test("routeVariant matches route row-for-row, including non-object JSON edges") {
    val payloads = Seq(
      good,                                             // good
      "definitely not json",                            // not_json (unparseable)
      "42", "[1,2]", "null", "\"str\"",                 // not_json (parses, not an object)
      """{"time":"2020-09-15T10:21:33Z"}""",            // missing_type
      """{"log_type":null,"time":"2020-09-15T10:21:33Z"}""", // JSON-null type
      """{"log_type":"nginx"}""",                       // missing_timestamp
      """{"log_type":"nginx","time":"never oclock"}""", // bad_timestamp
      """{"log_type":"apache","time":"2020-09-15T10:21:33Z","log_id":"x"}""")
    for (c <- Seq(cfg, cfg.copy(logTypeWhitelist = Some(Set("nginx"))))) {
      val df = payloads.toDF("payload")
      val cols = Seq("payload", "log_type", "log_id", "event_ts", "route")
      val a = Router.route(df, c).select(cols.map(col): _*)
        .as[(String, String, Option[String], Option[java.sql.Timestamp], String)]
        .collect().sortBy(_._1)
      val b = Router.routeVariant(df, c).select(cols.map(col): _*)
        .as[(String, String, Option[String], Option[java.sql.Timestamp], String)]
        .collect().sortBy(_._1)
      assert(a.toSeq == b.toSeq)
    }
  }
}
