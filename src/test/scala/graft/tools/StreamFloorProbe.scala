package graft.tools

import org.apache.spark.sql.functions._

/** Per-trigger floor attribution for the AvailableNow streaming rows:
  * runs a MINIMAL 3-slice stateful stream (watermark + windowed count —
  * the pipe_stream_hll shape with trivial data) on tmpfs and prints every
  * micro-batch's durationMs breakdown (triggerExecution, queryPlanning,
  * walCommit, addBatch, commitOffsets, getBatch, latestOffset) from the
  * recent progress — the receipt for what one trigger costs on THIS box
  * and which component dominates. Run:
  * `sbt "Test/runMain graft.tools.StreamFloorProbe [reps] [partitions]
  * [k=v ...]"` — trailing `key=value` args are applied via
  * `spark.conf.set` before the runs (round-13 knob A/Bs: state-store
  * maintenance interval, async progress tracking, checkpoint FS class,
  * no-data micro-batches...), and echoed into the FLOOR lines so a
  * committed receipt names its configuration. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val parts = if (args.length > 1) args(1).toInt else 8
    val (optArgs, confArgs) = args.drop(2).filter(_.contains("="))
      .partition(_.startsWith("option:"))
    val knobs = confArgs.map { a => val Array(k, v) = a.split("=", 2); (k, v) }
    // `option:k=v` args become writeStream OPTIONS (e.g.
    // asyncProgressTrackingEnabled, which is per-query, not a conf)
    val wopts = optArgs.map { a =>
      val Array(k, v) = a.stripPrefix("option:").split("=", 2); (k, v)
    }
    val spark = graft.Sessions.local(logLevel = "ERROR")
    knobs.foreach { case (k, v) => spark.conf.set(k, v) }
    if (knobs.nonEmpty || wopts.nonEmpty)
      println("FLOOR knobs: " +
        (knobs.map(kv => s"${kv._1}=${kv._2}") ++
          wopts.map(kv => s"option:${kv._1}=${kv._2}")).mkString(" "))
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-floor")
    // 3 one-row-group slices of 1000 tiny rows each
    val src = tmp.resolve("src")
    java.nio.file.Files.createDirectories(src)
    for (i <- 0 until 3) {
      (0 until 1000).map(j => (i * 1000L + j, s"k${j % 5}",
          new java.sql.Timestamp(86400000L * (i + 1) + j)))
        .toDF("id", "k", "ts")
        .coalesce(1).write.parquet(tmp.resolve(s"w$i").toString)
      val f = new java.io.File(tmp.resolve(s"w$i").toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath, src.resolve(f"part-$i%04d.parquet"))
    }
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    for (r <- 1 to reps) {
      val ckpt = tmp.resolve(s"ckpt$r").toString
      val out = tmp.resolve(s"out$r").toString
      val stream = spark.readStream
        .schema("id long, k string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
      val agg = stream.withWatermark("ts", "1 second")
        .groupBy(window(col("ts"), "1 day"), col("k"))
        .agg(count(lit(1)).as("n"))
        .select(col("k"), col("n"))
      val t0 = System.nanoTime()
      val w0 = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = wopts.foldLeft(w0) { case (w, (k, v)) => w.option(k, v) }
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"FLOOR run#$r total ${dt}%.2f s, partitions=$parts")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def g(k: String) = Option(d.get(k)).map(_.longValue).getOrElse(-1L)
        println(s"FLOOR   batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${g("triggerExecution")} plan=${g("queryPlanning")} " +
          s"addBatch=${g("addBatch")} walCommit=${g("walCommit")} " +
          s"commitOffsets=${g("commitOffsets")} getBatch=${g("getBatch")} " +
          s"latestOffset=${g("latestOffset")}")
      }
    }
    spark.stop()
  }
}
