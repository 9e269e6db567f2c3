package graft.tools

/** One-query job trace: prints every Spark job's call site fired by a
  * warm run of one SparkEntry query — pinpoints WHICH code line each tiny
  * job of an action-heavy row comes from. Run:
  * `sbt "Test/runMain graft.tools.JobTraceProbe <query> [sfDir]"`. */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local(logLevel = "ERROR")
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          sites.add(j.stageInfos.lastOption.map(_.name).getOrElse("?")); ()
        }
      })
    val q = graft.SparkEntry.queries(name)
    q(spark, dir).count() // warm: MV caches, codegen
    Thread.sleep(300)
    sites.clear()
    val t0 = System.nanoTime()
    q(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"TRACE $name warm run ${dt}%.2f s, ${sites.size} jobs:")
    import scala.jdk.CollectionConverters._
    sites.asScala.zipWithIndex.foreach { case (s, i) =>
      println(f"TRACE   job#$i%3d $s")
    }
    spark.stop()
  }
}
