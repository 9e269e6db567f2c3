package graft.tools

/** One-off probe: shuffle-exchange counts of named queries at sf0.001,
  * for setting PlanBudgetSpec budgets. Run with
  * `sbt "Test/runMain graft.tools.BudgetProbe q1 q2 ..."`. */
object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    args.foreach { name =>
      val plan = org.apache.spark.sql.graft.Bridge.executedPlan(
        graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
        .toString
      val n = ("Exchange hashpartitioning|Exchange rangepartitioning|" +
        "Exchange RoundRobinPartitioning").r.findAllIn(plan).length
      println(s"PROBE $name exchanges=$n")
    }
    spark.stop()
  }
}
