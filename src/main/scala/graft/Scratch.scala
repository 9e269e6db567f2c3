package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"[scratch] $name: ${(System.nanoTime() - t0) / 1e9} sec"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.cache().count()
    val keyed = d.select(col("doc_id"), col("source"), col("n_chars"))
    val a = keyed.toDF("id_a", "source", "nc_a")
    val b = keyed.toDF("id_b", "source_b", "nc_b")
    val pairs = a.join(b,
      col("source") === col("source_b") && col("id_a") < col("id_b") &&
        abs(col("nc_a") - col("nc_b")) <= 32).select("id_a", "id_b")
    time("pairs.count")(println(pairs.count()))
    val sh = d.select(col("doc_id").as("_id"),
      transform(Dedup.wordShingles(col("text"), 3), s => xxhash64(s)).as("_sh"))
      .withColumn("_n", size(col("_sh")))
    time("shingles.count")(println(sh.count()))
    time("shingles.agg")(println(sh.agg(sum("_n")).collect().head))
    val jac = Dedup.jaccardVerify(pairs, d, "doc_id", "text")
    time("jaccardVerify.count")(println(jac.count()))
    val full = jac.filter(col("jaccard") >= 0.2)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b")).limit(100)
    time("full.collect")(println(full.collect().length))
    spark.stop()
  }
}
