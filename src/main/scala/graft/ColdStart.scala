package graft

/** SCOPED cold-start purge of the cross-JVM disk caches.
  *
  * `SPARK_GRAFT_COLD=1` must reproduce a first-run environment for THIS
  * run's inputs — but /tmp/graft-layout and /tmp/graft-shards are shared
  * across JVMs (the shim's atomic-publish protocol exists exactly so a
  * bench and a test run can share them), so a host-wide `rm -rf` could
  * yank a published spill out from under a concurrently running JVM
  * benching a DIFFERENT fixture. This purge deletes only the entries
  * keyed to `sfDir`'s inputs:
  *
  *  - **ingest re-layouts**: ownership is CONTENT-KEYED, not heuristic —
  *    [[Tables.layoutCacheDirsFor]] replays the (path, size, mtime) cache
  *    key over `sfDir`'s parquet files, so exactly the hash dirs this
  *    run would reuse are deleted and nothing else;
  *  - **shim shard spills**: each published spill carries a
  *    `_graft_source` marker naming the events path that fed it; a spill
  *    is owned if that path lies under `sfDir` or under one of the
  *    re-layout dirs purged above. A marker-less spill (built by a
  *    pre-marker version) is purged too — cold correctness requires it
  *    (an unattributable entry at this run's key would silently serve a
  *    warm copy), and post-migration every published spill is marked;
  *  - **write-once partitioned/bucketed layouts** (`graft_part_events_*`,
  *    warehouse `graft_*_<tag>` tables): keyed by the fixture dir's hash
  *    tag, deleted for this tag only.
  */
object ColdStart {

  private def marker(dir: java.io.File): Option[String] = {
    val f = new java.io.File(dir, "_graft_source")
    if (f.isFile)
      Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim)
    else None
  }

  private def rm(p: java.io.File): Unit = if (p.exists()) {
    if (p.isDirectory) Option(p.listFiles).foreach(_.foreach(rm))
    p.delete(); ()
  }

  /** Purge every disk-cache entry keyed to `sfDir`'s inputs; returns the
    * deleted paths (for logging/specs). Entries owned by other fixture
    * dirs — including other VERSIONS of the same dir's files (their keys
    * embed size+mtime) — survive, so concurrent JVMs on other inputs are
    * never disturbed. */
  def purge(sfDir: String): Seq[String] = {
    val deleted = scala.collection.mutable.Buffer[String]()
    val root = new java.io.File(sfDir).getAbsolutePath
    // 1. re-layouts: the content-keyed ownership set
    val layout = Tables.layoutCacheDirsFor(sfDir)
    val layoutRoots = layout.map(_.getAbsolutePath)
    def owned(src: String): Boolean =
      src == root || src.startsWith(root + java.io.File.separator) ||
        layoutRoots.exists(r =>
          src == r || src.startsWith(r + java.io.File.separator))
    // 2. shard spills fed by sfDir's events — directly or via a re-layout
    //    dir purged below; marker-less spills are unattributable → purged
    val shards = Option(new java.io.File("/tmp/graft-shards").listFiles)
      .getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory)
      .filter(d => marker(d).forall(owned))
    (shards ++ layout).foreach { d => deleted += d.getPath; rm(d) }
    // 3. dir-tagged write-once layouts (q_partition_prune, bucketed joins)
    val tag = java.lang.Integer.toHexString(sfDir.hashCode)
    val part = new java.io.File(s"/tmp/graft_part_events_$tag")
    if (part.exists()) { deleted += part.getPath; rm(part) }
    Option(new java.io.File("spark-warehouse").listFiles)
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("graft_") && f.getName.endsWith(s"_$tag"))
      .foreach { d => deleted += d.getPath; rm(d) }
    deleted.toSeq
  }
}
