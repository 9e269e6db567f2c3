package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs.
  *
  * The naive top-k-per-group (row_number window + filter) shuffles EVERY
  * scored row to the group's reducer — at 100 TB, that's the corpus size
  * per query. As a TypedImperativeAggregate the buffer is a k-bounded
  * min-heap, so Catalyst runs it partially (map-side combine): each input
  * partition ships at most k candidates per group across the exchange.
  *
  * Output: array<struct<score double, id bigint>> sorted by
  * (score desc, id asc) — ties resolved deterministically.
  */
case class TopKByScore(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0 && k <= (1 << 20))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRUCT<score: DOUBLE, id: BIGINT> input")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) buf.add(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.addAll(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** k-bounded min-heap on (score asc, id desc): the root is the weakest
  * element — lowest score, largest id among equals — so the retained set
  * is exactly the top k by (score desc, id asc). */
final class TopKBuffer(val k: Int) {
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.min(k, 1024),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.offer((score, id))
    else {
      val weakest = heap.peek()
      if (score > weakest._1 || (score == weakest._1 && id < weakest._2)) {
        heap.poll(); heap.offer((score, id))
      }
    }
  }

  def addAll(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); add(s, i) }
  }

  def sortedDesc: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    arr.sortBy { case (s, i) => (-s, i) }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + heap.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(in.getDouble, in.getLong); i += 1 }
    buf
  }
}

object TopKByScore {
  /** topk_by_score(struct(score, id), k) as a Column aggregate. */
  def topk_by_score(scoreAndId: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(scoreAndId), k)
      .toAggregateExpression())
}
