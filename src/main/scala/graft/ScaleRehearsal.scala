package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-rehearsal data builder: replicate the big tables of an sf0.1
  * directory `copies`× into a new directory, so Bench can measure how each
  * query's cost scales with data volume (the cheapest proof the 100×-safe
  * plan claims hold).
  *
  * Replication preserves per-row DISTRIBUTIONS instead of duplicating rows
  * verbatim — verbatim copies would make every replica an exact near-dup
  * of the original and blow the dedup/ANN pair counts up quadratically,
  * measuring a data-distribution change rather than scale:
  *
  *  - `events`: ids and user ids remapped per replica (per-user event
  *    counts stay constant); timestamps/types/values untouched.
  *  - `documents`: doc ids remapped; every token of replica k>0 gets a
  *    `_rk` suffix — token/char counts scale linearly while shingle sets
  *    across replicas stay disjoint (no synthetic near-dup clusters).
  *  - `embeddings`: vec ids remapped; replica k's vectors are cyclically
  *    rotated by k dimensions — norms and per-dim distributions survive,
  *    replicas decorrelate (cosine ≈ random) so ANN candidate density
  *    scales linearly.
  *
  * TPC-H relational tables are copied through unchanged (held at source
  * scale): their FK web would need a full generator to scale faithfully,
  * and the q_* relational queries exercise Spark's own operators whose
  * scaling is not in question here.
  */
object ScaleRehearsal {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local()
    // optional 4th arg "graph": build the graph-table weak-scaling dir
    if (args.length > 3 && args(3) == "graph") replicateGraph(spark, src, dst, copies)
    else replicate(spark, src, dst, copies)
    spark.stop()
  }

  def replicate(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    require(copies >= 1, "copies must be >= 1")
    new java.io.File(dst).mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$dst/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    // events: pass ts through in the fixture's own encoding (INT64 nanos
    // or µs timestamp), so Tables.normalizeTs applies identically to the
    // replica
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val nEv = ev.agg(max("event_id")).head.getLong(0) + 1
    val nUser = ev.agg(max("user_id")).head.getLong(0) + 1
    union((0 until copies).map { k =>
      ev.select(
        (col("event_id") + lit(k * nEv)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * nUser)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }).repartitionByRange(32, col("event_id")).sortWithinPartitions("event_id")
      // key-clustered like the engine's own ingest layout (Layout.scala):
      // tight per-file event_id ranges are what let the Kinesis shim's
      // iterator seeks skip whole files on footer stats
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    union((0 until copies).map { k =>
      val text =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1_r" + k)
      docs.select(
        (col("doc_id") + lit(k * nDoc)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }).repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    union((0 until copies).map { k =>
      val rotated =
        if (k == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
          s"slice(embedding, 1, $k))")
      emb.select(
        (col("vec_id") + lit(k * nVec)).as("vec_id"),
        rotated.as("embedding"),
        col("label"))
    }).repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  /** GRAPH-scale rehearsal: the co-purchase / purchase-bipartite graph
    * rows read lineitem/orders, which [[replicate]] deliberately holds at
    * source scale (the relational FK web). This variant replicates those
    * two tables with per-replica KEY OFFSETS — disjoint order / part /
    * customer id spaces per replica — so the purchase graph gains
    * `copies` disjoint isomorphic components: weak scaling for the
    * iterative graph ops (round count constant, per-round edge volume
    * ×copies, hub degrees preserved). Every other table copies through
    * unchanged. Written to its OWN directory; the main rehearsal
    * methodology (README) is untouched. */
  def replicateGraph(spark: SparkSession, src: String, dst: String,
                     copies: Int): Unit = {
    require(copies >= 1, "copies must be >= 1")
    new java.io.File(dst).mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$dst/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val or = spark.read.parquet(s"$src/orders.parquet")
    val offO = or.agg(max("o_orderkey")).head.getLong(0) + 1
    val offP = li.agg(max("l_partkey")).head.getLong(0) + 1
    val offC = or.agg(max("o_custkey")).head.getLong(0) + 1
    val liCols = li.columns
    union((0 until copies).map { k =>
      li.select(liCols.map {
        case "l_orderkey" => (col("l_orderkey") + lit(k * offO)).as("l_orderkey")
        case "l_partkey"  => (col("l_partkey") + lit(k * offP)).as("l_partkey")
        case c            => col(c)
      }: _*)
    }).repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    val orCols = or.columns
    union((0 until copies).map { k =>
      or.select(orCols.map {
        case "o_orderkey" => (col("o_orderkey") + lit(k * offO)).as("o_orderkey")
        case "o_custkey"  => (col("o_custkey") + lit(k * offC)).as("o_custkey")
        case c            => col(c)
      }: _*)
    }).repartition(32).write.mode("overwrite").parquet(s"$dst/orders.parquet")
  }

  private def union(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionAll _)
}
