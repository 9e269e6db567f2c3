package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  /** reference edit distance for the brute-force cross-check */
  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("segment blocking finds exactly the brute-force pair set") {
    // adversarial neighborhood of a seed: edits at the start, middle and
    // end, insertions and deletions, plus unrelated strings
    val names = Seq(
      "conveyor", "Xonveyor", "cXnveyor", "convXyor", "conveyoX", // subst
      "onveyor", "cnveyor", "conveyr", "conveyo",                 // del
      "Xconveyor", "coXnveyor", "conveyorX", "cconveyyor",        // ins
      "cnvyor", "conv", "belt", "beltline", "beltlines", "bell",
      "tape", "tapes", "grape", "graph", "graphs")
    val got = EntityResolution.fuzzySelfJoin(names.toDF("n"), "n", tau = 2)
      .select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet
    val eligible = names.distinct.filter(_.length >= 3)
    val want = (for {
      a <- eligible; b <- eligible if a < b
      d = ed(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want,
      s"missing=${want -- got}\nextra=${got -- want}")
  }

  test("blocking is layout-invariant and dedups candidate multiplicity") {
    val names = (1 to 300).map(i => s"item-${i % 40}-v${i % 7}")
    def run(parts: Int) =
      EntityResolution.fuzzySelfJoin(names.toDF("n").repartition(parts), "n", 2)
        .orderBy("name_a", "name_b")
        .as[(String, String, Int)].collect().toSeq
    val once = run(1)
    assert(once == run(13))
    // no duplicate pairs despite multi-segment matches
    assert(once.map(p => (p._1, p._2)).distinct.size == once.size)
  }

  test("q_fuzzy_name_pairs plan: equi-join candidates, no nested-loop scan") {
    val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
      graft.SparkEntry.queries("q_fuzzy_name_pairs")(
        spark, "/root/testdata/sf0.001")).toString
    // the candidate join must hash on the (l, slot, seg) equi-keys; a
    // cartesian/nested-loop product would mean the blocking key was lost
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("seg"), plan.take(3000))
  }
}
