package graft.streaming

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas

/** S1: a Kinesis-shaped Structured Streaming source (DataSource V2).
  *
  * Simulates the contract of the reference's Lambda event source mapping
  * (reference main.tf:58-64, variables.tf:16-18 `batch_size`,
  * variables.tf:54-57 `starting_position`) against a replayed events table,
  * preserving the three Kinesis invariants that matter to the pipeline:
  *
  *  1. **Shard partitioning**: records hash to `nShards` shards by
  *     partition key; one InputPartition per shard per micro-batch, so a
  *     shard's records never interleave across Spark partitions.
  *  2. **Per-shard ordering**: within a shard, records arrive in sequence-
  *     number order across micro-batches (the at-least-once resume point is
  *     the per-shard offset vector, exactly like a shard iterator).
  *  3. **Admission control**: at most `batchSize` records per shard per
  *     micro-batch (the ESM `batch_size`), via SupportsAdmissionControl.
  *
  * `startingPosition=TRIM_HORIZON` starts at each shard's oldest record;
  * `LATEST` starts at the current end (a replayed stream gains no new
  * records, so LATEST legitimately yields an empty stream — asserted in
  * StreamingSpec).
  *
  * This is a simulation shim — the sandbox has no network — but it is a
  * REAL V2 connector: a production Kinesis source implements these same
  * interfaces with GetShardIterator/GetRecords instead of a parquet replay,
  * and the pipeline downstream is source-agnostic.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.streaming.KinesisShimProvider")
  *     .option("events", s"$sfDir/events.parquet")
  *     .option("nShards", 4).option("batchSize", 100)
  *     .option("startingPosition", "TRIM_HORIZON")
  *     .load()
  * }}}
  */
class KinesisShimProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.envelope
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KinesisShimTable(new CaseInsensitiveStringMap(properties))
}

private[streaming] object KinesisShim {
  /** Shard assignment: non-negative hash of the partition key, mod shards —
    * the md5-keyspace split Kinesis does, simplified to a stable JVM hash. */
  def shardOf(partitionKey: String, nShards: Int): Int =
    math.floorMod(partitionKey.hashCode, nShards)

  /** One replayed record: (partitionKey, arrivalMicros, payload). */
  final case class Rec(pk: String, arrivalUs: Long, data: Array[Byte])

  /** Load the events table as per-shard record queues, each ordered by
    * event_id (the replay's arrival order). Driver-side eager load — the
    * shim replays a bounded fixture; a real connector streams from the
    * service instead. */
  def loadShards(spark: SparkSession, eventsPath: String, nShards: Int): Array[Vector[Rec]] = {
    import org.apache.spark.sql.functions._
    val dir = eventsPath.replaceAll("/events\\.parquet$", "")
    val ev = graft.Tables.events(spark, dir).orderBy("event_id")
    val env = graft.Pipeline.envelopeFrom(ev,
      to_json(struct(
        col("event_type").as("log_type"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
        col("event_id").cast("string").as("log_id"),
        col("user_id"), col("value"), col("props"))).cast("binary"))
      .select(col("partitionKey"),
        unix_micros(col("approximateArrival")).as("us"), col("data"))
      .collect()
    val shards = Array.fill(nShards)(Vector.newBuilder[Rec])
    env.foreach { r =>
      val pk = r.getString(0)
      shards(shardOf(pk, nShards)) += Rec(pk, r.getLong(1), r.getAs[Array[Byte]](2))
    }
    shards.map(_.result())
  }
}

/** Per-shard consumed-position vector — the shard-iterator analogue.
  * Positions are a Seq, NOT an Array: Offset equality must be structural
  * (MicroBatchExecution compares offsets with equals to decide whether new
  * data exists), and a case class over Array inherits reference equality —
  * content-equal offsets would never compare equal and every trigger would
  * claim new data. */
private[streaming] case class ShimOffset(positions: Seq[Long]) extends Offset {
  override def json(): String = positions.mkString("[", ",", "]")
}

private[streaming] object ShimOffset {
  def parse(json: String): ShimOffset = {
    val body = json.trim.stripPrefix("[").stripSuffix("]")
    ShimOffset(if (body.isEmpty) Nil else body.split(",").map(_.trim.toLong).toSeq)
  }
}

private[streaming] class KinesisShimTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"kinesis_shim(${options.get("events")})"
  override def schema(): StructType = Schemas.envelope
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = Schemas.envelope
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KinesisShimStream(
          opts.get("events"),
          opts.getInt("nShards", 4),
          opts.getInt("batchSize", 100),
          opts.getOrDefault("startingPosition", "TRIM_HORIZON"))
    }
}

private[streaming] class KinesisShimStream(eventsPath: String, nShards: Int,
                                           batchSize: Int, startingPosition: String)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  require(nShards > 0 && batchSize > 0, "nShards and batchSize must be positive")
  require(Set("TRIM_HORIZON", "LATEST").contains(startingPosition),
    s"unsupported startingPosition $startingPosition (reference variables.tf:54-57)")

  private val shards: Array[Vector[KinesisShim.Rec]] =
    KinesisShim.loadShards(SparkSession.active, eventsPath, nShards)

  /** Fixed per-shard end captured at AvailableNow start: batches keep
    * firing (each ≤ batch_size per shard) until every shard reaches it. */
  @volatile private var availableNowTarget: Option[Array[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(shards.map(_.length.toLong))

  override def initialOffset(): Offset = startingPosition match {
    case "TRIM_HORIZON" => ShimOffset(Seq.fill(nShards)(0L))
    case "LATEST" => ShimOffset(shards.map(_.length.toLong).toSeq)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize.toLong * nShards)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShimOffset].positions
    val cap = availableNowTarget.getOrElse(shards.map(_.length.toLong))
    // honor the engine's admission request: Trigger.Once passes
    // ReadLimit.allAvailable expecting EVERYTHING in one batch — capping it
    // at batchSize would silently leave the stream tail unconsumed
    val perShard: Long = limit match {
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => Long.MaxValue
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.max(1L, m.maxRows / nShards)
      case _ => batchSize.toLong
    }
    ShimOffset(Seq.tabulate(nShards)(i =>
      math.min(saturatingAdd(s(i), perShard), cap(i))))
  }

  private def saturatingAdd(a: Long, b: Long): Long =
    if (a > Long.MaxValue - b) Long.MaxValue else a + b

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def reportLatestOffset(): Offset = ShimOffset(shards.map(_.length.toLong).toSeq)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShimOffset].positions
    val e = end.asInstanceOf[ShimOffset].positions
    (0 until nShards).flatMap { i =>
      if (e(i) > s(i))
        Some(ShimInputPartition(i, s(i),
          shards(i).slice(s(i).toInt, e(i).toInt).toArray): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ShimReaderFactory

  override def deserializeOffset(json: String): Offset = {
    val off = ShimOffset.parse(json)
    // a checkpoint written with a different shard count cannot be resumed
    // meaningfully — per-shard positions would map to the wrong shards
    // (real Kinesis resharding changes shard IDENTITY, not index meaning)
    require(off.positions.length == nShards,
      s"checkpoint has ${off.positions.length} shards but source is configured " +
        s"with $nShards — start a new checkpoint or restore the original nShards")
    off
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One shard's slice for one micro-batch, already in sequence order. */
private[streaming] final case class ShimInputPartition(
    shard: Int, firstSeq: Long, recs: Array[KinesisShim.Rec]) extends InputPartition

private[streaming] class ShimReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShimInputPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.recs.length }
      override def get(): InternalRow = {
        val r = p.recs(i)
        // Kinesis sequence numbers are opaque per-shard-increasing strings;
        // zero-pad so string ordering matches numeric ordering
        val seq = f"${p.shard}%03d-${p.firstSeq + i}%019d"
        InternalRow(
          UTF8String.fromString(r.pk),
          UTF8String.fromString(seq),
          r.arrivalUs,
          r.data)
      }
      override def close(): Unit = ()
    }
  }
}
