package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * Two kernel families ship: [[JdkKernels]] are REAL decoders — PNG/JPEG/
  * BMP/GIF via `javax.imageio` and 16-bit PCM WAV via `javax.sound.sampled`,
  * both part of the JDK, zero added dependencies — and [[StubKernels]]
  * keeps a deterministic bytes-only kernel for plumbing tests that must not
  * depend on any codec. The Spark side — the schema contract, the
  * per-partition batch iteration (the Scala analog of `mapInPandas`: one
  * kernel instance per partition, streamed row batches, no driver collect),
  * partitioning, and the typed output — is shared by both.
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

  /** Deterministic codec-free kernel: feature = 8 floats derived from an
    * MD5 of the content; n_frames = byte-length-based. Kept for plumbing
    * tests that must be independent of any codec ([[JdkKernels]] holds the
    * real decoders). */
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
  }

  /** Per-image decoded features. Undecodable content (truncated file,
    * unknown format) is reported, not thrown: `decodable = false` with
    * zeroed features — a reject channel the caller can route, mirroring
    * the pipeline's dead-letter discipline. */
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 mean_r: Double, mean_g: Double, mean_b: Double,
                                 decodable: Boolean)

  /** Per-clip decoded audio features (16-bit PCM via `javax.sound`). */
  final case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                                 n_samples: Long, rms: Double, decodable: Boolean)

  /** Box-downsampled image summary. Channel sums are INTEGERS (each
    * resized pixel is blockSum div blockCount), so the whole transform is
    * exact arithmetic an oracle recomputes from known rasters. */
  final case class ResizedImage(media_id: Long, src_w: Int, src_h: Int,
                                out_w: Int, out_h: Int,
                                sum_r: Long, sum_g: Long, sum_b: Long,
                                decodable: Boolean)

  /** Real decode kernels on JDK-shipped codecs — `javax.imageio`
    * (PNG/JPEG/BMP/GIF/TIFF) and `javax.sound.sampled` (WAV/PCM). No
    * external dependency; the same per-partition batching discipline as
    * every other kernel. */
  object JdkKernels {

    def decodeImage(r: MediaRow): ImageFeatures =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
        if (img == null) ImageFeatures(r.media_id, 0, 0, 0.0, 0.0, 0.0, decodable = false)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageFeatures(r.media_id, w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, decodable = true)
        }
      } catch {
        case _: Exception => ImageFeatures(r.media_id, 0, 0, 0.0, 0.0, 0.0, decodable = false)
      }

    /** Real decode + box downsample by `factor`: each output pixel is the
      * integer mean (sum div count) of its source block, edge blocks
      * partial. Deliberately NOT Graphics2D resampling — Java2D's filter
      * taps are implementation-defined, while the box filter is exact
      * integer arithmetic reproducible by any engine from the raster. */
    def resizeImage(r: MediaRow, factor: Int): ResizedImage =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
        if (img == null) ResizedImage(r.media_id, 0, 0, 0, 0, 0L, 0L, 0L, decodable = false)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val ow = (w + factor - 1) / factor
          val oh = (h + factor - 1) / factor
          var tr = 0L; var tg = 0L; var tb = 0L
          var by = 0
          while (by < oh) {
            var bx = 0
            while (bx < ow) {
              var sr = 0L; var sg = 0L; var sb = 0L; var cnt = 0L
              var y = by * factor
              while (y < math.min((by + 1) * factor, h)) {
                var x = bx * factor
                while (x < math.min((bx + 1) * factor, w)) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  cnt += 1
                  x += 1
                }
                y += 1
              }
              tr += sr / cnt; tg += sg / cnt; tb += sb / cnt
              bx += 1
            }
            by += 1
          }
          ResizedImage(r.media_id, w, h, ow, oh, tr, tg, tb, decodable = true)
        }
      } catch {
        case _: Exception =>
          ResizedImage(r.media_id, 0, 0, 0, 0, 0L, 0L, 0L, decodable = false)
      }

    def decodeAudio(r: MediaRow): AudioFeatures =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          val bits = fmt.getSampleSizeInBits
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          val big = fmt.isBigEndian
          val n = bytes.length / 2
          var sumSq = 0L
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1) & 0xff
            val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
            sumSq += s.toLong * s
            i += 1
          }
          val frames = n / fmt.getChannels
          AudioFeatures(r.media_id, fmt.getSampleRate.toInt, fmt.getChannels,
            frames.toLong, if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n),
            decodable = true)
        } finally in.close()
      } catch {
        case _: Exception => AudioFeatures(r.media_id, 0, 0, 0L, 0.0, decodable = false)
      }

    /** [[Kernel]]-conforming real image kernel for the generic
      * `extractFeatures` seam: feature = [w, h, meanR, meanG, meanB]. */
    val imageFeature: Kernel = new Kernel {
      override def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val md = java.security.MessageDigest.getInstance("MD5").digest(r.content)
          val f = decodeImage(r)
          MediaFeatures(r.media_id, r.content.length.toLong,
            md.map("%02x".format(_)).mkString,
            Array(f.width.toFloat, f.height.toFloat,
              f.mean_r.toFloat, f.mean_g.toFloat, f.mean_b.toFloat),
            n_frames = if (f.decodable) 1 else 0)
        }
      }
    }
  }

  /** Deterministic media synthesizers for fixtures and oracled probes: the
    * raster/sample values are pure integer functions of the id, so an
    * external engine can compute the EXPECTED decoded features analytically
    * while Spark proves the real encode→decode codec round-trip (PNG and
    * PCM are lossless). */
  object Synth {
    def rasterPixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((id * 31 + x * 7 + y * 13) % 256).toInt,
      ((id * 17 + x * 11 + y * 3) % 256).toInt,
      ((id * 23 + x * 5 + y * 19) % 256).toInt)

    def rasterWidth(id: Long): Int = 8 + (id % 9).toInt
    def rasterHeight(id: Long): Int = 8 + (id % 5).toInt

    def png(id: Long): Array[Byte] = {
      val w = rasterWidth(id)
      val h = rasterHeight(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = rasterPixel(id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** A NEAR-DUPLICATE of `baseId`'s raster: the (7,7) red channel is
      * nudged by +8 (mod 256) — a perceptual-hash distance of a few bits
      * at most, for exercising image near-dup detection with a
      * formula-reproducible perturbation. */
    def pngNear(baseId: Long): Array[Byte] = {
      val w = rasterWidth(baseId)
      val h = rasterHeight(baseId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r0, g, b) = rasterPixel(baseId, x, y)
          val r = if (x == 7 && y == 7) (r0 + 8) % 256 else r0
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def wavSampleCount(id: Long): Int = 1000 + (id % 7).toInt * 100
    def wavSample(id: Long, i: Int): Int =
      (((id * 131 + i.toLong * 7919) % 65536) - 32768).toInt

    /** 16-bit little-endian mono PCM at 8 kHz in a standard 44-byte RIFF
      * wrapper (the public WAV container layout). */
    def wav(id: Long, sampleRate: Int = 8000): Array[Byte] = {
      val n = wavSampleCount(id)
      val dataLen = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        buf.putShort(wavSample(id, i).toShort)
        i += 1
      }
      buf.array()
    }
  }

  /** 64-bit perceptual hash of a decoded image (aHash over the top-left
    * 8×8 block — every fixture raster is ≥ 8×8). Split into two unsigned
    * 32-bit halves so an external engine can assemble the identical value
    * without two's-complement gymnastics. Integer-only: the threshold is
    * `gray·64 > Σgray` (no division), so the bit pattern is exactly
    * reproducible from the raster formula. */
  final case class ImagePHash(media_id: Long, hi: Long, lo: Long,
                              decodable: Boolean)

  object JdkPHash {
    def phash(r: MediaRow): ImagePHash =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.content))
        if (img == null || img.getWidth < 8 || img.getHeight < 8)
          ImagePHash(r.media_id, 0L, 0L, decodable = false)
        else {
          val gray = new Array[Int](64)
          var sum = 0
          var i = 0
          while (i < 64) {
            val p = img.getRGB(i % 8, i / 8)
            val g = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            gray(i) = g; sum += g
            i += 1
          }
          var hi = 0L; var lo = 0L
          i = 0
          while (i < 64) {
            if (gray(i) * 64 > sum) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          ImagePHash(r.media_id, hi, lo, decodable = true)
        }
      } catch {
        case _: Exception => ImagePHash(r.media_id, 0L, 0L, decodable = false)
      }
  }

  /** Per-partition perceptual hashing through the real JDK decoder. */
  def phashImages(media: Dataset[MediaRow]): Dataset[ImagePHash] = {
    implicit val enc = Encoders.product[ImagePHash]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(JdkPHash.phash)
    }
  }

  /** Real image decode as a dataset stage: per-partition ImageIO setup
    * (file-cache off — decodes stay on-heap), one decode per row,
    * reject-channel output for undecodable blobs. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(JdkKernels.decodeImage)
    }
  }

  /** Real decode + exact box downsample as a dataset stage. */
  def resizeImages(media: Dataset[MediaRow], factor: Int = 2): Dataset[ResizedImage] = {
    require(factor >= 1 && factor <= 4096, "resize factor in [1, 4096]")
    implicit val enc = Encoders.product[ResizedImage]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(JdkKernels.resizeImage(_, factor))
    }
  }

  /** Real WAV/PCM decode as a dataset stage. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    media.mapPartitions(rows => rows.map(JdkKernels.decodeAudio))
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
