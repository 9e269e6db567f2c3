package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch aggregate (Cormode & Muthukrishnan 2005): `d` hash
  * rows × `w` counters. Every value increments one counter per row
  * (bucket = first 16 bits of md5("i:" + value) mod w); a point-frequency
  * estimate is the MIN of the value's `d` counters — always ≥ the true
  * count (counters only over-count, by colliding keys), and within
  * εN = (e/w)·N with probability 1 − (1/2)^d.
  *
  * The reference pipeline counts per-type record volumes exactly
  * (`/root/reference/lambda/main.py:134-143` logs per-type totals); a CMS
  * answers the same point queries when the key universe is unbounded —
  * per-URL / per-user counts over 100 TB where an exact groupBy's key
  * state itself is the memory problem.
  *
  * Portability: md5 is the bucket hash (not xxhash/murmur) so an external
  * engine reproduces every counter and therefore every estimate
  * bit-for-bit — DuckDB replays a row's bucket as
  * `('0x' || substr(md5(i || ':' || v), 1, 4))::INTEGER % w`.
  *
  * Scale: the group state is a FIXED d×w long array regardless of input
  * rows or key cardinality, and as a TypedImperativeAggregate the combine
  * is map-side partial — each partition ships one d×w array per group
  * across the exchange (d=4, w=256 → 8 KiB). Merging sketches is
  * element-wise addition, so pre-aggregated per-partition (or per-day)
  * sketches compose without rescanning data.
  *
  * Output: array<long> of length d*w, row-major (row i, bucket b at
  * index i*w + b).
  */
case class CountMinLongs(child: Expression, d: Int, w: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(d >= 1 && d <= 16, "d in [1,16]")
  require(w >= 2 && w <= 65536, "w in [2,65536]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_longs"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < d) {
        buf(i * w + CountMinLongs.bucket(i, s, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object CountMinLongs {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Bucket of `v` in hash row `i`: first 16 bits of md5("i:v"), mod w —
    * the exact value `('0x'||substr(md5(i||':'||v),1,4))::INTEGER % w`
    * computes in DuckDB and `conv(substring(md5(...),1,4),16,10) % w`
    * computes in Spark SQL. */
  def bucket(i: Int, v: String, w: Int): Int = {
    val md = digest.get()
    md.reset()
    val h = md.digest((i.toString + ":" + v).getBytes(StandardCharsets.UTF_8))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % w
  }

  /** count_min_longs(col, d, w) as a Column aggregate. */
  def count_min(c: Column, d: Int, w: Int): Column =
    Bridge.column(CountMinLongs(Bridge.expression(c), d, w)
      .toAggregateExpression())
}
