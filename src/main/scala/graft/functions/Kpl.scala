package graft.functions

import java.security.MessageDigest

/** KPL (Kinesis Producer Library) record deaggregation.
  *
  * One Kinesis wire record may carry many user records in the publicly
  * documented KPL aggregated format (magic 0xF3899AC2 + protobuf
  * `AggregatedRecord` + MD5 digest). The reference delegates this to
  * `aws-kinesis-agg` (reference lambda/requirements.txt:3, consumed via
  * kinesis.parse_records at lambda/main.py:89); here it is a dependency-free
  * varint parser extracting `records[*].data` (protobuf field 3 / inner
  * field 3 of the format published in awslabs/kinesis-aggregation).
  */
object Kpl {

  private val Magic: Array[Byte] =
    Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)

  /** Digest trailer length (MD5 of the protobuf section). */
  private val DigestLen = 16

  def isAggregated(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > Magic.length + DigestLen &&
      bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3)

  /** Split an aggregate into its user records; non-aggregated (or corrupt /
    * checksum-failing) input comes back as a single-element array, matching
    * the tolerant pass-through behavior of the reference's decode layer. */
  def deaggregate(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (!isAggregated(bytes)) return Array(bytes)
    val body = java.util.Arrays.copyOfRange(bytes, Magic.length, bytes.length - DigestLen)
    val digest = java.util.Arrays.copyOfRange(bytes, bytes.length - DigestLen, bytes.length)
    val md5 = MessageDigest.getInstance("MD5").digest(body)
    if (!java.util.Arrays.equals(md5, digest)) return Array(bytes)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = 0
      while (pos < body.length) {
        val (key, p1) = readVarint(body, pos)
        val fieldNo = (key >>> 3).toInt
        val wireType = (key & 0x7).toInt
        pos = p1
        wireType match {
          case 2 => // length-delimited
            val (len, p2) = readVarint(body, pos)
            // a hostile/corrupt varint can overflow toInt negative or run
            // past the buffer — either would loop or fabricate data
            if (len < 0 || len > body.length - p2) return Array(bytes)
            val end = p2 + len.toInt
            if (fieldNo == 3) { // AggregatedRecord.records
              recordData(body, p2, end).foreach(out += _)
            }
            pos = end
          case 0 => val (_, p2) = readVarint(body, pos); pos = p2
          case 5 => pos += 4
          case 1 => pos += 8
          case _ => return Array(bytes) // unknown wire type: bail out whole
        }
      }
      if (out.isEmpty) Array(bytes) else out.toArray
    } catch { case _: IndexOutOfBoundsException => Array(bytes) }
  }

  /** Extract `data` (field 3, bytes) from one inner `Record` message. */
  private def recordData(b: Array[Byte], start: Int, end: Int): Option[Array[Byte]] = {
    var pos = start
    var data: Option[Array[Byte]] = None
    while (pos < end) {
      val (key, p1) = readVarint(b, pos)
      val fieldNo = (key >>> 3).toInt
      val wireType = (key & 0x7).toInt
      pos = p1
      wireType match {
        case 2 =>
          val (len, p2) = readVarint(b, pos)
          // copyOfRange silently zero-pads past the buffer — reject any
          // declared length that exceeds this record's span instead
          if (len < 0 || len > end - p2) throw new IndexOutOfBoundsException("bad length")
          val e = p2 + len.toInt
          if (fieldNo == 3) data = Some(java.util.Arrays.copyOfRange(b, p2, e))
          pos = e
        case 0 => val (_, p2) = readVarint(b, pos); pos = p2
        case 5 => pos += 4
        case 1 => pos += 8
        case _ => return data
      }
    }
    data
  }

  /** (value, nextPos); throws IndexOutOfBoundsException past the buffer. */
  private def readVarint(b: Array[Byte], start: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var pos = start
    while (shift < 64) {
      val byte = b(pos)
      pos += 1
      result |= (byte & 0x7fL) << shift
      if ((byte & 0x80) == 0) return (result, pos)
      shift += 7
    }
    throw new IndexOutOfBoundsException("varint too long")
  }

  // ---- test-support encoder (builds valid KPL aggregates) ----------------

  /** Encode payloads as one KPL aggregate; used by tests and fixtures. */
  def aggregate(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    // partition_key_table[0] = "a" (field 1, wire 2)
    writeKey(body, 1, 2); writeVarint(body, 1); body.write('a')
    payloads.foreach { p =>
      val rec = new java.io.ByteArrayOutputStream()
      writeKey(rec, 1, 0); writeVarint(rec, 0) // partition_key_index = 0
      writeKey(rec, 3, 2); writeVarint(rec, p.length); rec.write(p, 0, p.length)
      val rb = rec.toByteArray
      writeKey(body, 3, 2); writeVarint(body, rb.length); body.write(rb, 0, rb.length)
    }
    val bodyBytes = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, Magic.length)
    out.write(bodyBytes, 0, bodyBytes.length)
    val md5 = MessageDigest.getInstance("MD5").digest(bodyBytes)
    out.write(md5, 0, md5.length)
    out.toByteArray
  }

  private def writeKey(o: java.io.ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(o, (field << 3) | wire)

  private def writeVarint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }
}
