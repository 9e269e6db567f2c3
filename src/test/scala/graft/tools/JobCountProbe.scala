package graft.tools

/** Per-query job/stage/task census: how many Spark jobs (driver actions)
  * each SparkEntry query fires, with wall time — the round-12 measurement
  * lens for action-overhead-dominated rows (a tiny-input query firing 15
  * jobs is paying scheduler floor, not data work). Run:
  * `sbt "Test/runMain graft.tools.JobCountProbe <sfDir> <q1,q2,...|top>"`.
  * Each query runs once untimed (codegen/JIT) then once measured. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.Sessions.local(logLevel = "ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks); ()
        }
      })
    // warm base tables like Bench does
    for (t <- Seq("events", "documents", "embeddings", "lineitem",
        "orders", "customer", "part", "supplier", "nation", "region"))
      graft.Tables.table(spark, dir, t).count()
    val qs = graft.SparkEntry.queries
    for (name <- names if qs.contains(name)) {
      try {
        qs(name)(spark, dir).count() // warm (codegen, JIT, feed caches)
        Thread.sleep(50)
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        qs(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        Thread.sleep(200)
        println(f"PROBE $name%-28s ${dt}%6.2f s  jobs=${jobs.get}%3d " +
          f"stages=${stages.get}%3d tasks=${tasks.get}%5d")
      } catch {
        case e: Throwable =>
          println(s"PROBE $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
