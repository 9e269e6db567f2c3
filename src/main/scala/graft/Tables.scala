package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet testdata (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * schema converter rejects outright. We flip the legacy nanos-as-long
  * conversion (runtime-settable) and rebuild the µs timestamp with integer
  * arithmetic (`div 1000` — not double division, which loses ns precision
  * at 2^61 magnitudes). DuckDB performs the identical ns→µs truncation, so
  * the oracle sees the same instants.
  */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
