package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-06-01")
  private val d3 = Date.valueOf("2024-09-01")

  private def hist = Seq(
    (1L, "gold", Some(d1), Option.empty[Date]),   // open
    (2L, "silver", Some(d1), Option.empty[Date]), // open
    (3L, "bronze", Some(d1), Some(d2)),           // already closed
    (3L, "silver", Some(d2), Option.empty[Date])  // its successor, open
  ).toDF("cust_id", "tier", "valid_from", "valid_to")

  test("merge closes superseded rows, inserts versions, drops no-ops") {
    val updates = Seq(
      (1L, "platinum", d3), // change -> close + insert
      (2L, "silver", d3),   // no-op -> dropped
      (9L, "gold", d3)      // new key -> insert only
    ).toDF("cust_id", "tier", "uts")
    val got = Scd2.merge(hist, updates, "cust_id", "uts", Seq("tier"))
      .orderBy("cust_id", "valid_from")
      .as[(Long, String, Option[Date], Option[Date])].collect().toSeq
    assert(got == Seq(
      (1L, "gold", Some(d1), Some(d3)),
      (1L, "platinum", Some(d3), None),
      (2L, "silver", Some(d1), None),
      (3L, "bronze", Some(d1), Some(d2)),
      (3L, "silver", Some(d2), None),
      (9L, "gold", Some(d3), None)))
  }

  test("merge is idempotent: replaying the same batch changes nothing") {
    val updates = Seq((1L, "platinum", d3), (9L, "gold", d3))
      .toDF("cust_id", "tier", "uts")
    val once = Scd2.merge(hist, updates, "cust_id", "uts", Seq("tier"))
    val twice = Scd2.merge(once, updates, "cust_id", "uts", Seq("tier"))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
    assert(once.count() == twice.count())
  }

  test("multiple updates per key resolve to the latest") {
    val updates = Seq(
      (1L, "plat-early", d2), (1L, "plat-late", d3)
    ).toDF("cust_id", "tier", "uts")
    val got = Scd2.merge(hist, updates, "cust_id", "uts", Seq("tier"))
      .filter(col("cust_id") === 1L && col("valid_to").isNull)
      .select("tier").as[String].collect().toSeq
    assert(got == Seq("plat-late"))
  }

  test("null attributes compare null-safely") {
    val h = Seq((1L, Option.empty[String], Some(d1), Option.empty[Date]))
      .toDF("cust_id", "tier", "valid_from", "valid_to")
    val noop = Seq((1L, Option.empty[String], d3)).toDF("cust_id", "tier", "uts")
    assert(Scd2.merge(h, noop, "cust_id", "uts", Seq("tier")).count() == 1)
    val change = Seq((1L, Some("gold"), d3)).toDF("cust_id", "tier", "uts")
    assert(Scd2.merge(h, change, "cust_id", "uts", Seq("tier")).count() == 2)
  }
}
