package graft

/** Batch plan capture for the optimization receipts:
  * `runMain graft.ExplainMany <outDir> <suffix> <q1,q2,...> [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` with the formatted physical plan
  * of each named SparkEntry query — the file shape the round deliverable
  * (`plans/r12/<query>_{before,after}.txt`) expects. One JVM for the
  * whole list, so capturing dozens of plans does not pay per-query sbt
  * spin-up. */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.local(logLevel = "ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"EXPLAINED $name -> ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
