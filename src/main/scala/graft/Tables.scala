package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Readers for the driver's parquet testdata (TESTDATA.md), with two
  * adaptations the engine makes for ANY upstream writer, not just this
  * fixture:
  *
  * **1. `ts` encoding.** `events.parquet` has shipped with two physical
  * encodings of `ts` across fixture generations, so the reader adapts to
  * what the file actually contains instead of assuming one:
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
  *
  * **2. Scan layout.** A parquet ROW GROUP is the atomic unit of scan
  * parallelism — a single-row-group file is a single-task scan no matter
  * how many cores exist, and every narrow operator chained onto that scan
  * (tokenize, MinHash, vector hashing) serializes with it. The current
  * fixture generation writes exactly one row group per table. A 100-TB
  * engine never accepts a pathological upstream layout; it compacts /
  * re-clusters on ingest (ops/Layout.scala is this engine's first-class
  * statement of that). So the reader performs that ingest step once per
  * fixture file: tables with fewer than 4 row groups are rewritten to a
  * local cache, range-clustered and sorted by their primary key (tight
  * min/max stats → partition pruning), and all queries read the
  * re-clustered copy. The rewrite is cached by (path, size, mtime) under
  * /tmp/graft-layout and re-used across JVMs; it never touches the
  * read-only fixture. `SPARK_GRAFT_NO_RELAYOUT=1` disables it (the
  * layout-invariance gate proves query OUTPUTS don't depend on this).
  */
object Tables {

  /** Primary clustering key per table — the range-layout sort key. */
  private val clusterKey = Map(
    "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id",
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "customer" -> "c_custkey", "part" -> "p_partkey",
    "supplier" -> "s_suppkey", "nation" -> "n_nationkey",
    "region" -> "r_regionkey")

  private val relayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** THE re-layout cache key — one definition shared by [[read]] (which
    * populates the cache) and [[eventsDataPath]] (which resolves through
    * it), so a version bump or format change can never desync the two
    * sites. v2: layout-format version — bumped when the written format
    * changes (v2 = byte-sized splits + INT64-micros timestamps) so stale
    * cached copies from an older writer are never reused. */
  private def layoutCacheKey(src: java.io.File): String =
    s"v2:${src.getAbsolutePath}:${src.length}:${src.lastModified}"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The /tmp/graft-layout entry dirs a given fixture dir's tables
    * CURRENTLY key to — the exact ownership set [[graft.ColdStart]]
    * purges in scoped cold mode. Derived by replaying [[layoutCacheKey]]
    * (plus the f32/i8 packed-layout suffixes) over the dir's parquet
    * files, so the scoping is content-keyed, not heuristic: entries for
    * other fixture dirs, or for a different version of THIS dir's files
    * (different size/mtime → different key), are never touched. */
  private[graft] def layoutCacheDirsFor(dir: String): Seq[java.io.File] = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.flatMap { n =>
      val src = new java.io.File(s"$dir/$n.parquet")
      if (!src.isFile) Nil
      else Seq("", ":f32", ":i8").map(sfx =>
        new java.io.File(s"/tmp/graft-layout/${md5hex(layoutCacheKey(src) + sfx)}"))
    }.filter(_.exists)
  }

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else read(s, dir, name, identity)

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, dir, "events", normalizeTs)
  }

  /** Filesystem path of the events DATA the engine actually reads — the
    * range-clustered re-layout when it applies (triggered on demand, so
    * the copy exists and is key-sorted), the fixture file otherwise. For
    * consumers that scan parquet directly off-Spark (the Kinesis shim's
    * executor-side readers): the key-sorted multi-file layout is what
    * makes their event-id range seeks skip whole files via footer stats. */
  def eventsDataPath(s: SparkSession, dir: String): String = {
    events(s, dir) // reading resolves (and if needed writes) the re-layout
    val src = new java.io.File(s"$dir/events.parquet")
    relayoutCache.get(layoutCacheKey(src)).getOrElse(src.getPath)
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

  private def read(s: SparkSession, dir: String, name: String,
                   fix: DataFrame => DataFrame): DataFrame = {
    val src = new java.io.File(s"$dir/$name.parquet")
    def raw = fix(s.read.parquet(src.getPath))
    if (sys.env.contains("SPARK_GRAFT_NO_RELAYOUT") || !src.isFile) return raw
    val (rows, rowGroups) = footerLayout(src)
    if (rows < 1000 || rowGroups >= 4) return raw
    val cacheKey = layoutCacheKey(src)
    val dst = relayoutCache.getOrElseUpdate(cacheKey, {
      val hash = md5hex(cacheKey)
      val out = new java.io.File(s"/tmp/graft-layout/$hash/$name.parquet")
      // _SUCCESS is Spark's atomic completion marker: a crashed or
      // in-flight previous write leaves it absent and we rewrite
      if (!new java.io.File(out, "_SUCCESS").isFile) {
        // Split count is sized by DATA VOLUME, not a tiny row constant:
        // one split per ~64k rows or per ~32 MB of source bytes, whichever
        // demands more, clamped to [4, 32]. The round-6 rule (rows/256)
        // always hit the 32-split cap at sf0.1 (~3k rows/file) and the
        // per-task scheduling overhead inflated ~130 sub-second queries
        // ~1.9x (measured; see README's relayout A/B) — per-partition work
        // must dwarf task launch cost. The floor of 4 keeps narrow per-row
        // compute chained onto the scan parallel even for small tables;
        // at real scale the byte term dominates and converges on the
        // standard 32-128 MB scan-partition target.
        val byRows = rows / 65536L
        val byBytes = src.length / (32L << 20)
        val n = math.min(32L, math.max(4L, math.max(byRows, byBytes))).toInt
        val df = raw
        val laid = clusterKey.get(name).filter(df.columns.contains) match {
          case Some(k) =>
            df.repartitionByRange(n, col(k)).sortWithinPartitions(k)
          case None => df.repartition(n)
        }
        laid.write.mode("overwrite").parquet(out.getPath)
      }
      out.getPath
    })
    fix(s.read.parquet(dst))
  }

  /** Float32-PACKED embeddings layout: (vec_id, emb_f32 BINARY), each
    * vector as little-endian IEEE binary32 ([[graft.functions.PackF32]]).
    * The ANN / k-means family is SCAN-bound at 100 TB and `array<double>`
    * is the wrong wire format for it — 8 bytes per dimension plus
    * parquet's per-element repetition levels, for models that were
    * trained and served in float32 anyway. This is the same write-once
    * ingest-step contract as the re-layout above (cached by source
    * (path, size, mtime) + a format tag under /tmp/graft-layout, atomic
    * via Spark's _SUCCESS marker): queries that opt in
    * (`sim_ivf_topk_f32`) read half the vector bytes and unpack with a
    * codegen expression; the float32 rounding is replayed bit-for-bit by
    * the oracle's CAST(x AS FLOAT). */
  def embeddingsPacked(s: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val cacheKey = layoutCacheKey(src) + ":f32"
    val dst = relayoutCache.getOrElseUpdate(cacheKey, {
      val hash = md5hex(cacheKey)
      val out = new java.io.File(s"/tmp/graft-layout/$hash/embeddings_f32.parquet")
      if (!new java.io.File(out, "_SUCCESS").isFile)
        table(s, dir, "embeddings")
          .select(col("vec_id"), graft.functions.GraftFunctions.pack_f32(
            col("embedding").cast("array<double>")).as("emb_f32"))
          .write.mode("overwrite").parquet(out.getPath)
      out.getPath
    })
    s.read.parquet(dst)
  }

  /** Int8 scalar-quantized (SQ8) embeddings layout: (vec_id, emb_i8
    * BINARY, scale DOUBLE). One signed byte per dimension against a
    * CORPUS-GLOBAL scale (max |x| over every vector element, computed once
    * at layout-write time and stored as a constant column — RLE makes it
    * ~free on disk, and readers never re-scan the double table for it).
    * 8× fewer raw vector bytes than `array<double>`, 2× fewer than the
    * float32 packing — the first-stage scan format for a 100 TB ANN
    * corpus; [[graft.ops.Similarity.int8TopK]] ranks on exact integer
    * dot products over these codes. Same write-once cache contract as
    * the layouts above. */
  def embeddingsInt8(s: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val cacheKey = layoutCacheKey(src) + ":i8"
    val dst = relayoutCache.getOrElseUpdate(cacheKey, {
      val hash = md5hex(cacheKey)
      val out = new java.io.File(s"/tmp/graft-layout/$hash/embeddings_i8.parquet")
      if (!new java.io.File(out, "_SUCCESS").isFile) {
        val e = table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // corpus-global max |x|: order-free, exact in IEEE doubles, so the
        // oracle's max(abs(x)) over UNNEST reproduces it bit-for-bit
        val scale = e.select(max(aggregate(col("v"),
          lit(0.0), (acc, x) => greatest(acc, abs(x)))).as("scale"))
        e.crossJoin(broadcast(scale))
          .select(col("vec_id"),
            graft.functions.GraftFunctions.pack_i8(col("v"), col("scale")).as("emb_i8"),
            col("scale"))
          .write.mode("overwrite").parquet(out.getPath)
      }
      out.getPath
    })
    s.read.parquet(dst)
  }

  /** Metadata-only row count of `dir/name.parquet` straight from the
    * parquet footer — no Spark job, no scan. This is the "free" table
    * cardinality a catalog would hold at 100 TB, used by callers that
    * pick a physical strategy by input size (e.g.
    * [[graft.ops.Checks.uniquenessFor]]). */
  def footerRowCount(dir: String, name: String): Long = {
    val p = new java.io.File(s"$dir/$name.parquet")
    // fixture tables are single files; Spark-written tables (e.g. the
    // scale-rehearsal copies) are directories of part files — and a
    // partitionBy layout nests those under key=value subdirectories, so
    // recurse rather than silently returning 0 for nested layouts (an
    // undercount here would steer size-gated strategy picks like
    // Checks.uniquenessFor onto the wrong physical path)
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) footerLayout(f)._1
      else 0L
    if (p.isDirectory) walk(p) else footerLayout(p)._1
  }

  /** (row count, row-group count) from the parquet footer — a metadata
    * read, no data pages touched. */
  private def footerLayout(src: java.io.File): (Long, Int) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(src.getPath),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try (r.getRecordCount, r.getRowGroups.size) finally r.close()
  }
}
