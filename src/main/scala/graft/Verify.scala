package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name subset (fast local
    // iteration on one operator; the driver always runs the full map)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    // Overlap independent dumps (guide §2.6): the gate wall was ~575 s at
    // sf0.01 because 262 queries ran strictly serially — each small job's
    // tail left the other cores idle. Every worker thread gets its OWN
    // spark.newSession() (shared SparkContext, separate SQLConf/temp
    // views), which is what makes the session-scoped conf mutations
    // (withFewShufflePartitions, the nanos-as-long flip) safe to overlap
    // — the round-12 blocker. The op-level one-generation caches
    // (Graph/Dedup/Affinity) are process-global and single-threaded by
    // contract: under concurrency they degrade to recompute (persist
    // keeps lineage), never to a wrong result — acceptable in a
    // correctness dump. The write-once re-layouts are NOT safe to race
    // (TrieMap.getOrElseUpdate can evaluate the builder twice), so they
    // are resolved serially first. SPARK_GRAFT_VERIFY_THREADS=1 restores
    // the fully serial dump.
    val threads = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS",
      "4").toInt)
    if (threads > 1) {
      for (t <- Seq("events", "documents", "embeddings", "lineitem",
          "orders", "customer", "part", "supplier", "nation", "region"))
        if (new java.io.File(s"$sfDir/$t.parquet").exists())
          Tables.table(spark, sfDir, t) // construction triggers the re-layout
      if (new java.io.File(s"$sfDir/embeddings.parquet").exists()) {
        Tables.embeddingsPacked(spark, sfDir)
        Tables.embeddingsInt8(spark, sfDir)
      }
    }
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    selected.foreach(kv => queue.add(kv))
    def drain(session: SparkSession): Unit = {
      var next = queue.poll()
      while (next != null) {
        val (name, fn) = next
        session.sparkContext.setJobDescription(s"verify: $name")
        try fn(session, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        next = queue.poll()
      }
    }
    if (threads == 1) drain(spark)
    else {
      val pool = (1 to threads).map { _ =>
        val worker = new Thread(() => {
          val session = spark.newSession()
          // newSession() starts from the SparkContext conf: re-apply the
          // post-creation runtime conf Sessions.local set on the parent
          // (the RocksDB state-store flip), or A/B gates under
          // SPARK_GRAFT_STATE_STORE would silently test the default
          if (sys.env.get("SPARK_GRAFT_STATE_STORE")
              .exists(_.equalsIgnoreCase("rocksdb")))
            graft.streaming.StreamingPipeline.useRocksDbStateStore(session)
          drain(session)
        })
        worker.setDaemon(true)
        worker.start()
        worker
      }
      pool.foreach(_.join())
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
