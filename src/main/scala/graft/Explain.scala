package graft

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan (pushdown / broadcast / codegen spans) for one
  * SparkEntry query — the feedback loop for scale tuning. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(logLevel = "ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
