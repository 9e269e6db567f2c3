package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The decode kernels are STUBBED (this container has no image/audio
  * codecs): [[StubKernels]] produces deterministic fake features from the
  * bytes. Everything Spark-side — the schema contract, the per-partition
  * batch iteration (the Scala analog of `mapInPandas`: one kernel instance
  * per partition, streamed row batches, no driver collect), partitioning,
  * and the typed output — is real and tested. A production deployment
  * swaps `Kernel` implementations only.
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("source", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)
  ))

  final case class MediaRow(media_id: Long, content: Array[Byte],
                            mime: String, source: String)
  final case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: String,
                                 feature: Array[Float], n_frames: Int)

  /** A per-partition decode kernel — instantiate once per partition (codec
    * contexts are expensive), feed a row iterator, emit features. */
  trait Kernel extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** Deterministic stand-in for real codecs: feature = 8 floats derived
    * from xxhash of content windows; n_frames = byte-length-based. A real
    * implementation would decode image/audio here (`???` seam). */
  object StubKernels {
    val imageFeature: Kernel = new Kernel {
      override def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
        rows.map { r =>
          val md = java.security.MessageDigest.getInstance("MD5").digest(r.content)
          val feat = Array.tabulate(8) { i =>
            java.nio.ByteBuffer.wrap(md).getInt((i % 4) * 4).toFloat / Int.MaxValue
          }
          MediaFeatures(r.media_id, r.content.length.toLong,
            md.map("%02x".format(_)).mkString, feat,
            n_frames = (r.content.length / 1024) + 1)
        }
    }
    // def realImageDecode: Kernel = ??? // would wrap an image codec library
  }

  /** Attach media columns to a table carrying text (the driver testdata has
    * no binary table; treating the UTF-8 bytes as the opaque blob exercises
    * the identical plumbing). */
  def asMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      col("source").as("source"))
      .as[MediaRow]
  }

  /** The mapInPandas-shaped stage: per-partition kernel, batched iteration.
    * Repartition first if blobs are large so a partition's working set
    * stays within executor memory (at 100 TB: partition by size budget,
    * not row count). */
  def extractFeatures(media: Dataset[MediaRow], kernel: Kernel,
                      targetPartitions: Option[Int] = None): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val repart = targetPartitions.map(media.repartition).getOrElse(media)
    repart.mapPartitions(rows => kernel.decodeBatch(rows))
  }

  /** Frame sampling plumbing: split a blob into fixed-size "frames" and
    * explode — the shape of video frame extraction (sampling every Nth
    * frame) with a deterministic stub slicer. */
  def sampleFrames(media: DataFrame, contentCol: String = "content",
                   frameBytes: Int = 256, everyNth: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col(contentCol)).cast("double") / frameBytes).cast("int"))
      // guard n_frames=0: sequence(0, -1) auto-steps DOWN to [0, -1] and
      // would fabricate a phantom frame for empty blobs
      .withColumn("frame_idx",
        explode(filter(
          when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1))
            .otherwise(array().cast("array<int>")),
          i => i % everyNth === 0)))
      .withColumn("frame",
        col(contentCol).cast("string")
          .substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop(contentCol)
}
