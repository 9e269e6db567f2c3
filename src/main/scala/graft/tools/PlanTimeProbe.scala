package graft.tools

/** Planning-vs-execution split for declared queries: per invocation,
  * how much of a bench row's wall is Catalyst work (analyze + optimize +
  * physical planning, forced via `queryExecution.executedPlan` WITHOUT
  * running a job) versus the action itself. The job/stage census
  * (JobCountProbe) cannot see planning — it happens before any job is
  * submitted — yet the bench's min-of-repeats pays it on every sample,
  * so a row whose plan is rebuilt from a large DataFrame expression tree
  * can be planning-bound at fixture scale. Usage:
  *   runMain graft.tools.PlanTimeProbe <q1,q2,...> [sfDir]
  * Prints one line per query: plan seconds, action seconds, total.
  * Methodology matches Bench: one untimed warm invocation per query
  * (codegen/JIT), then min over 3 timed invocations of each phase.
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    if (args.isEmpty) {
      System.err.println("usage: PlanTimeProbe <q1,q2,...> [sfDir]\n" +
        s"valid query names:\n  ${all.mkString("\n  ")}")
      sys.exit(2)
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(all.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"valid query names:\n  ${all.mkString("\n  ")}")
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local(logLevel = "ERROR")
    // same one-time warm as Bench: ingest re-layouts + page cache
    for (t <- Seq("events", "documents", "embeddings", "lineitem",
        "orders", "customer", "part", "supplier", "nation", "region"))
      graft.Tables.table(spark, sfDir, t).count()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // untimed warm cycle (codegen + JIT)
      var consMin = Double.MaxValue
      var planMin = Double.MaxValue
      var execMin = Double.MaxValue
      for (_ <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // construction (eager gate work runs here)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // Catalyst: analyze+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        consMin = math.min(consMin, (t1 - t0) / 1e9)
        planMin = math.min(planMin, (t2 - t1) / 1e9)
        execMin = math.min(execMin, (t3 - t2) / 1e9)
      }
      println(f"PLANTIME $name%-28s construct=$consMin%6.3f catalyst=$planMin%6.3f exec=$execMin%6.3f total=${consMin + planMin + execMin}%6.3f")
    }
    spark.stop()
  }
}
