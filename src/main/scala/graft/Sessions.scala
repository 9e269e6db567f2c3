package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session factory for the tool mains (Verify/Bench/Explain):
  * local[cpus], matching shuffle partitions, UTC, no UI. */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(Runtime.getRuntime.availableProcessors, 32).toString)

  def local(logLevel: String = "WARN"): SparkSession = {
    val n = cpus
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
