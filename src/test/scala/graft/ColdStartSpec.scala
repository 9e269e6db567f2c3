package graft

/** Scoped cold-start purge: a cold bench of one fixture must delete ONLY
  * that fixture's cross-JVM cache entries — a concurrent JVM benching a
  * different fixture keeps its published re-layouts and shard spills
  * (round-9 advisor item; the old host-wide rm required running alone). */
class ColdStartSpec extends SparkSpec {

  test("scoped cold purge deletes this fixture's caches and spares a concurrent run's") {
    val src = new java.io.File("/root/testdata/sf0.001/events.parquet")
    def mkFixture(): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-cold").toFile
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(d, "events.parquet").toPath)
      d.getAbsolutePath
    }
    val a = mkFixture(); val b = mkFixture()
    // two "runs" (stand-ins for two JVMs) publish their re-layouts
    Tables.events(spark, a).count()
    Tables.events(spark, b).count()
    val la = Tables.layoutCacheDirsFor(a)
    val lb = Tables.layoutCacheDirsFor(b)
    assert(la.nonEmpty && lb.nonEmpty)
    // published shard spills attributed by marker: one fed by a's
    // re-layout, one fed by b's fixture directly (the two source shapes)
    def spill(name: String, source: String): java.io.File = {
      val d = new java.io.File(s"/tmp/graft-shards/$name"); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "_graft_source").toPath,
        source.getBytes("UTF-8"))
      new java.io.FileOutputStream(new java.io.File(d, "_SUCCESS")).close()
      d
    }
    val sa = spill("coldspec-a", la.head.getAbsolutePath + "/events.parquet")
    val sb = spill("coldspec-b", s"$b/events.parquet")
    def rmAll(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmAll))
      f.delete(); ()
    }
    try {
      val deleted = ColdStart.purge(a)
      // a's entries are gone...
      assert(la.forall(!_.exists()), "a's re-layout should be purged")
      assert(!sa.exists(), "the spill fed by a's re-layout should be purged")
      assert(deleted.exists(_.endsWith("coldspec-a")))
      // ...and the concurrent run's published caches survive untouched
      assert(lb.forall(_.exists()), "b's re-layout must survive a's cold purge")
      assert(sb.exists(), "b's published spill must survive a's cold purge")
      assert(new java.io.File(sb, "_SUCCESS").isFile)
    } finally {
      Seq(sa, sb).foreach(rmAll)
      (la ++ lb).foreach(rmAll)
      Seq(a, b).foreach(p => rmAll(new java.io.File(p)))
    }
  }

  test("real shim spills carry the ownership marker") {
    val dir = "/root/testdata/sf0.001"
    val path = Tables.eventsDataPath(spark, dir)
    // touch the shim source so at least one shard spill publishes
    val stream = graft.streaming.StreamingPipeline.kinesisShimStream(
      spark, dir, graft.config.PipelineConfig(sourceShards = 2))
    val tmp = java.nio.file.Files.createTempDirectory("coldspec-shim")
    val q = stream.writeStream.format("noop")
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // every published spill fed by this events path is marker-attributed
    val owned = Option(new java.io.File("/tmp/graft-shards").listFiles)
      .getOrElse(Array.empty[java.io.File])
      .filter(d => new java.io.File(d, "_SUCCESS").isFile)
      .filter { d =>
        val m = new java.io.File(d, "_graft_source")
        m.isFile && new String(
          java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim ==
          new java.io.File(path).getAbsolutePath
      }
    assert(owned.nonEmpty,
      s"expected a marker-attributed spill for $path under /tmp/graft-shards")
  }
}
