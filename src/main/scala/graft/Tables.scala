package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Readers for the driver's parquet testdata (TESTDATA.md).
  *
  * `events.parquet` has shipped with two physical encodings of `ts` across
  * fixture generations, so the reader adapts to what the file actually
  * contains instead of assuming one:
  *
  *   - parquet TIMESTAMP(NANOS), which Spark's schema converter rejects
  *     outright: we flip the legacy nanos-as-long conversion
  *     (runtime-settable) and rebuild the µs timestamp with integer
  *     arithmetic (`div 1000` — not double division, which loses ns
  *     precision at 2^61 magnitudes). DuckDB performs the identical ns→µs
  *     truncation, so the oracle sees the same instants.
  *   - parquet TIMESTAMP(MICROS) (NTZ or UTC-adjusted): cast straight to
  *     the session TimestampType. Sessions are pinned to UTC
  *     (Sessions.scala), so the NTZ wall clock IS the instant and the cast
  *     is lossless — again exactly what DuckDB reads.
  */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/events.parquet"))
  }

  /** `ts` → session-zone TimestampType whatever the file's encoding was
    * (see object doc). Shared by the batch reader, the streaming file
    * replay, and test fixtures so every path makes the same choice. */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
}
