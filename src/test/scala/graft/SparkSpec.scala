package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // plan-shape guards count expression occurrences in plan strings;
      // default truncation (25 fields) could elide duplicates and make
      // those assertions vacuously pass
      .config("spark.sql.debug.maxToStringFields", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Sessions.local: the engine writes annotated INT64 micros,
      // never deprecated INT96 (the Kinesis shim's parquet-mr readers and
      // any stats-based ts filtering depend on it)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
