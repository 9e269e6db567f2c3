package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-minimum-values aggregate: the k lexicographically smallest
  * DISTINCT strings per group.
  *
  * This is the state backing a KMV distinct-count sketch (Bar-Yossef et
  * al. 2002): hash every value to a fixed-width hex string, keep the k
  * smallest distinct hashes, and estimate the distinct count from the kth
  * smallest ((k-1) * 2^64 / H_k). Unlike HyperLogLog the retained state is
  * the raw hashes, so an external engine that can reproduce the hash (md5
  * is universal) reproduces the estimate BIT-FOR-BIT — this is the
  * oracle-able approximate-distinct (see `Sketch.kmvDistinct`).
  *
  * Scale: as a TypedImperativeAggregate Catalyst runs it partially
  * (map-side combine) — each input partition ships at most k short strings
  * per group across the exchange, independent of input size. A window
  * row_number over the hashes would shuffle every row instead.
  *
  * Output: array<string> of the retained hashes, sorted ascending.
  */
case class KMinStrings(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinBuffer] {
  require(k > 0 && k <= (1 << 16))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_strings"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KMinBuffer = new KMinBuffer(k)

  override def update(buf: KMinBuffer, input: InternalRow): KMinBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: KMinBuffer, b: KMinBuffer): KMinBuffer = { a.addAll(b); a }

  override def eval(buf: KMinBuffer): Any =
    new GenericArrayData(buf.sortedAsc.map(UTF8String.fromString).asInstanceOf[Array[Any]])

  override def serialize(buf: KMinBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KMinBuffer = KMinBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): KMinStrings =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinStrings =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** k-bounded ordered set: retains the k smallest distinct strings.
  * Duplicates are ignored; on overflow the largest element is evicted. */
final class KMinBuffer(val k: Int) {
  private val set = new java.util.TreeSet[String]()

  def add(v: String): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v.compareTo(set.last) < 0 && set.add(v)) { set.pollLast(); () }
  }

  def addAll(other: KMinBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  def sortedAsc: Array[String] = set.toArray(new Array[String](set.size))

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + set.size * 20)
    val out = new DataOutputStream(bos)
    out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }
}

object KMinBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KMinBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KMinBuffer(k)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.add(new String(b, StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }
}

object KMinStrings {
  /** kmin_strings(col, k) as a Column aggregate. */
  def kmin_strings(c: Column, k: Int): Column =
    Bridge.column(KMinStrings(Bridge.expression(c), k).toAggregateExpression())
}
