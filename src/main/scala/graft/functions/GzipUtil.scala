package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Gzip helpers shared by the decode expression, the sinks, and tests.
  * Static methods so generated code can call them directly
  * (see [[GunzipIfGzip.doGenCode]]).
  */
object GzipUtil {

  /** RFC 1952 magic. The reference's decode layer sniffs the same two bytes
    * to decide whether to inflate (reference README.md:10). */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 2 &&
      bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Inflate if the payload is gzip, else return it untouched. Corrupt gzip
    * streams return the original bytes (the router will then dead-letter the
    * undecodable payload rather than failing the batch). */
  def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (!isGzip(bytes)) bytes
    else {
      try {
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 8192)
        val out = new ByteArrayOutputStream(math.max(bytes.length * 4, 256))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
        out.toByteArray
      } catch { case _: java.io.IOException => bytes }
    }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  def gzipString(s: String): Array[Byte] =
    gzip(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
