package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.lang.{Long => JLong}
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

/** Bounded Misra-Gries frequent-items summary (Misra & Gries 1982): at
  * most `k` counters per group, guaranteeing that EVERY value with
  * frequency > n/k survives in the summary regardless of arrival or merge
  * order. The counts themselves are order-dependent lower bounds — which
  * is why [[graft.ops.HeavyHitters]] uses this aggregate only as the
  * candidate GENERATOR and re-counts the (tiny) candidate set exactly in
  * a second pass; the two-phase composition is layout-invariant and
  * exact.
  *
  * Scale: a TypedImperativeAggregate, so Catalyst runs it partially — at
  * most k (value, count) pairs per group cross the exchange, independent
  * of input size. The merge (Agarwal et al. 2012, mergeable summaries):
  * sum counts pointwise, then subtract the (k+1)-th largest count from
  * every counter and drop non-positives — preserves the MG error bound.
  *
  * Output: array<string> of candidate values (order: count desc, then
  * value asc — deterministic given the state).
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(k > 0 && k <= (1 << 16))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = { a.mergeIn(b); a }

  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(
      buf.candidates.map(UTF8String.fromString).asInstanceOf[Array[Any]])

  override def serialize(buf: MGBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MGBuffer = MGBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** k-bounded counter map with the Misra-Gries decrement rule. */
final class MGBuffer(val k: Int) {
  private val counts = new java.util.HashMap[String, JLong]()

  def add(v: String, w: Long): Unit = {
    val cur = counts.get(v)
    if (cur != null) { counts.put(v, cur + w); () }
    else if (counts.size < k) { counts.put(v, w); () }
    else {
      // decrement all by the smallest admissible amount (classic MG step
      // generalized to weights): dec = min(w, min current count)
      var minC = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) minC = math.min(minC, it0.next().longValue)
      val dec = math.min(w, minC)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      if (w - dec > 0L) add(v, w - dec)
    }
  }

  def mergeIn(other: MGBuffer): Unit = {
    // pointwise sum...
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        if (cur == null) e.getValue else JLong.valueOf(cur + e.getValue))
    }
    // ...then shrink back to k counters: subtract the (k+1)-th largest
    // count from all, drop non-positives (mergeable-summaries rule)
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next().longValue; i += 1 }
      java.util.Arrays.sort(vals)
      val dec = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - dec
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
  }

  /** Deterministic order: count desc, value asc. */
  def candidates: Array[String] = {
    val arr = counts.entrySet().toArray(
      new Array[java.util.Map.Entry[String, JLong]](counts.size))
    java.util.Arrays.sort(arr,
      (a: java.util.Map.Entry[String, JLong], b: java.util.Map.Entry[String, JLong]) => {
        val c = JLong.compare(b.getValue, a.getValue)
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      })
    arr.map(_.getKey)
  }

  private[functions] def countOf(v: String): Long = {
    val c = counts.get(v)
    if (c == null) 0L else c.longValue
  }
  private[functions] def size: Int = counts.size

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + counts.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object MGBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MGBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MGBuffer(k)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      val v = new String(b, StandardCharsets.UTF_8)
      buf.add(v, in.readLong())
      i += 1
    }
    buf
  }
}

object MisraGries {
  /** mg_candidates(col, k) as a Column aggregate. */
  def mg_candidates(c: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), k).toAggregateExpression())
}
