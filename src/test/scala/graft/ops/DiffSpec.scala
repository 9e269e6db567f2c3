package graft.ops

import graft.SparkSpec

class DiffSpec extends SparkSpec {

  import spark.implicits._

  test("snapshot diff classifies inserted/deleted/changed, drops unchanged") {
    val oldV = Seq(
      (1L, "a", Some(1.0)), (2L, "b", Some(2.0)),
      (3L, "c", Some(3.0)), (4L, null: String, Option.empty[Double])
    ).toDF("k", "s", "v")
    val newV = Seq(
      (1L, "a", Some(1.0)),                      // unchanged -> dropped
      (2L, "B", Some(2.0)),                      // attr changed
      (4L, null: String, Option.empty[Double]),  // null == null, unchanged
      (5L, "e", Some(5.0))                       // inserted
    ).toDF("k", "s", "v")                        // 3 deleted
    val got = Diff.snapshotDiff(oldV, newV, "k", Seq("s", "v"))
      .orderBy("k")
      .select("k", "change_type", "old_s", "new_s")
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      (2L, "changed", Some("b"), Some("B")),
      (3L, "deleted", Some("c"), None),
      (5L, "inserted", None, Some("e"))))
  }

  test("diff plan is a single full-outer equi-join, no window") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("q_snapshot_diff")(
        spark, "/root/testdata/sf0.001")).toString
    assert(plan.contains("FullOuter"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }
}
