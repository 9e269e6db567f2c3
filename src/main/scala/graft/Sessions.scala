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
      // The driver-gate parity contracts (Graph/Similarity small-input
      // solves use Math.addExact/multiplyExact and THROW on overflow)
      // assume distributed long arithmetic also fails loudly rather than
      // wrapping. Spark 4 defaults ANSI on, but pin it so a deployment
      // that flips the default can't silently break the spec-proven
      // local-vs-distributed bit-equality under overflow.
      .config("spark.sql.ansi.enabled", "true")
      // INT96 (Spark's compatibility default) is deprecated, stats-hostile
      // and unreadable by plain parquet-mr getLong; everything this engine
      // writes — including the ingest re-layout the Kinesis shim seeks
      // over — uses the standard annotated INT64 micros
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    // SPARK_GRAFT_STATE_STORE=rocksdb flips every stateful streaming row
    // onto the RocksDB provider (state spills to local disk, heap bounded
    // by block cache — the 100 TB-cardinality provider; see
    // StreamingPipeline.useRocksDbStateStore). Default stays the
    // HDFS-backed in-memory provider. Results must be provider-invariant:
    // the A/B gate runs the whole Verify suite under both and diffs
    // hashes.
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").exists(_.equalsIgnoreCase("rocksdb")))
      graft.streaming.StreamingPipeline.useRocksDbStateStore(spark)
    spark
  }
}
