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

/** Bounded top-k aggregate over (count, key) pairs — the string-keyed
  * sibling of [[TopKByScore]] for "top terms per group" shapes.
  *
  * The window form (row_number over (count DESC, key) + filter ≤ k)
  * range-shuffles and SORTS the whole per-group key space — for token
  * statistics that is the VOCABULARY per group, which grows with the
  * corpus (Heaps' law). As a TypedImperativeAggregate the buffer is a
  * k-bounded ordered set, so Catalyst runs it partially: each map
  * partition ships at most k (count, key) pairs per group across the
  * exchange and nothing is ever globally sorted.
  *
  * Total order (count DESC, key ASC) — ties at the cutoff resolve
  * deterministically, so the result is layout-invariant and matches a
  * row_number window with the same ORDER BY bit-for-bit.
  *
  * Output: array<struct<key string, n bigint>> in rank order.
  */
case class TopKByCount(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKCountBuffer] {
  require(k > 0 && k <= (1 << 20))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == LongType && b.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRUCT<n: BIGINT, key: STRING> input")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_count"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): TopKCountBuffer = new TopKCountBuffer(k)

  override def update(buf: TopKCountBuffer, input: InternalRow): TopKCountBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.add(row.getLong(0), row.getUTF8String(1).toString)
    }
    buf
  }

  override def merge(a: TopKCountBuffer, b: TopKCountBuffer): TopKCountBuffer = {
    a.addAll(b); a
  }

  override def eval(buf: TopKCountBuffer): Any =
    new GenericArrayData(buf.ranked.map { case (n, key) =>
      InternalRow(UTF8String.fromString(key), n)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKCountBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKCountBuffer =
    TopKCountBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** k-bounded ordered set on (count DESC, key ASC); the LAST element is the
  * weakest retained entry and is evicted when a stronger one arrives.
  *
  * PRECONDITION: each key appears once per group input (the canonical use
  * feeds a pre-aggregated (group, key) → count relation). The precondition
  * is fundamental, not an implementation shortcut — a k-bounded buffer
  * cannot SUM duplicate keys exactly (a key evicted early can never be
  * credited when it reappears; that is the heavy-hitter problem, served by
  * [[graft.ops.HeavyHitters]]'s Misra-Gries sketch instead). Violations
  * are detected LOUDLY where bounded state can see them: a key re-added
  * with a different count while still retained throws (an exact duplicate
  * (n, key) stays idempotent). A duplicate that straddles an eviction is
  * undetectable by construction — hence the documented precondition. */
final class TopKCountBuffer(val k: Int) {
  private val set = new java.util.TreeSet[(Long, String)](
    (a: (Long, String), b: (Long, String)) => {
      val c = java.lang.Long.compare(b._1, a._1) // count DESC
      if (c != 0) c else a._2.compareTo(b._2)    // key ASC
    })
  // retained-key → count mirror for the duplicate-key detector (O(1) probe)
  private val counts = new java.util.HashMap[String, Long]()

  def add(n: Long, key: String): Unit = {
    if (counts.containsKey(key)) {
      val prev = counts.get(key)
      if (prev == n) return // exact duplicate collapses, as before
      throw new IllegalStateException(
        s"topk_by_count: key '$key' arrived with counts $prev and $n in one " +
          "group — input must be pre-aggregated to one (count, key) row per " +
          "key (sum duplicates upstream, or use a heavy-hitters sketch)")
    }
    if (set.size < k) {
      set.add((n, key)); counts.put(key, n); ()
    } else {
      val weakest = set.last()
      if (n > weakest._1 || (n == weakest._1 && key.compareTo(weakest._2) < 0)) {
        set.add((n, key)); counts.put(key, n)
        val evicted = set.last()
        set.remove(evicted); counts.remove(evicted._2); ()
      }
    }
  }

  def addAll(other: TopKCountBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) { val (n, s) = it.next(); add(n, s) }
  }

  /** Rank order: (count DESC, key ASC) — the TreeSet's natural order. */
  def ranked: Array[(Long, String)] = {
    val arr = new Array[(Long, String)](set.size)
    set.toArray(arr)
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + set.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) {
      val (n, s) = it.next()
      out.writeLong(n)
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }
}

object TopKCountBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKCountBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKCountBuffer(k)
    var i = 0
    while (i < n) {
      val c = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(c, new String(b, StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }
}

object TopKByCount {
  /** topk_by_count(struct(n, key), k) as a Column aggregate. */
  def topk_by_count(nAndKey: Column, k: Int): Column =
    Bridge.column(TopKByCount(Bridge.expression(nAndKey), k)
      .toAggregateExpression())
}
