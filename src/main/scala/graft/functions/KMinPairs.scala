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

/** Bounded deterministic uniform sample: the DOUBLE values attached to the
  * k lexicographically-smallest distinct hash keys per group — the
  * pair-valued sibling of [[KMinStrings]].
  *
  * With a universal hash of a unique row key, "k smallest hashes" IS a
  * uniform random sample of the group — but a deterministic one: a pure
  * function of the data, independent of arrival order, partitioning, and
  * merge order, and reproducible by any engine that can rank rows by the
  * same hash. That makes it the portable sampling primitive behind
  * quantile estimation ([[graft.ops.Sketch.sampleQuantile]]) where
  * engine-opaque sketches (t-digest, `percentile_approx`) can only be
  * range-checked.
  *
  * Scale: a TypedImperativeAggregate — at most k (hash, value) pairs per
  * group cross the exchange regardless of input size.
  *
  * Output: array<double> of the retained values, ordered by hash
  * ascending (deterministic; sort by value downstream as needed).
  */
case class KMinPairs(hashChild: Expression, valueChild: Expression, k: Int,
                     withHashes: Boolean = false,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinPairsBuffer] {
  require(k > 0 && k <= (1 << 16))

  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, valueChild.dataType) match {
      case (StringType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING hash, DOUBLE value) input")
    }

  /** `withHashes=false`: array<double> of sampled values (hash-ascending).
    * `withHashes=true`: array<struct<h,v>> — the form that MERGES: the k
    * hash-smallest pairs of a union of samples are exactly the union's
    * sample, so window/MV folds can combine per-bucket samples without
    * rescanning rows (same algebra as [[graft.ops.Sketch.kmvMerge]]). */
  override def dataType: DataType =
    if (withHashes)
      ArrayType(StructType(Seq(StructField("h", StringType, nullable = false),
        StructField("v", DoubleType, nullable = false))), containsNull = false)
    else ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_pairs"
  override def children: Seq[Expression] = Seq(hashChild, valueChild)

  override def createAggregationBuffer(): KMinPairsBuffer = new KMinPairsBuffer(k)

  override def update(buf: KMinPairsBuffer, input: InternalRow): KMinPairsBuffer = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      buf.add(h.asInstanceOf[UTF8String].toString, v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KMinPairsBuffer, b: KMinPairsBuffer): KMinPairsBuffer = {
    a.addAll(b); a
  }

  override def eval(buf: KMinPairsBuffer): Any =
    if (withHashes)
      new GenericArrayData(buf.pairsByHash.map { case (h, v) =>
        InternalRow(UTF8String.fromString(h), v)
      }.asInstanceOf[Array[Any]])
    else new GenericArrayData(buf.valuesByHash)

  override def serialize(buf: KMinPairsBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KMinPairsBuffer =
    KMinPairsBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): KMinPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashChild = c(0), valueChild = c(1))
}

/** k-bounded ordered map: retains the k smallest distinct hash keys with
  * their values. Duplicate keys keep the first-seen value (keys are hashes
  * of unique row ids, so duplicates mean the same row). */
final class KMinPairsBuffer(val k: Int) {
  private val map = new java.util.TreeMap[String, Double]()

  def add(h: String, v: Double): Unit = {
    if (map.containsKey(h)) ()
    else if (map.size < k) { map.put(h, v); () }
    else if (h.compareTo(map.lastKey) < 0) {
      map.put(h, v); map.pollLastEntry(); ()
    }
  }

  def addAll(other: KMinPairsBuffer): Unit = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
  }

  /** (hash, value) pairs in hash-ascending order. */
  def pairsByHash: Array[(String, Double)] = {
    val out = new Array[(String, Double)](map.size)
    var i = 0
    val it = map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out
  }

  /** Values in hash-ascending order. */
  def valuesByHash: Array[Double] = {
    val out = new Array[Double](map.size)
    var i = 0
    val it = map.values().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + map.size * 28)
    val out = new DataOutputStream(bos)
    out.writeInt(map.size)
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeDouble(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object KMinPairsBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KMinPairsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KMinPairsBuffer(k)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.add(new String(b, StandardCharsets.UTF_8), in.readDouble())
      i += 1
    }
    buf
  }
}

object KMinPairs {
  /** kmin_pairs(hash, value, k) as a Column aggregate. */
  def kmin_pairs(hash: Column, value: Column, k: Int): Column =
    Bridge.column(KMinPairs(Bridge.expression(hash), Bridge.expression(value), k)
      .toAggregateExpression())

  /** kmin_pairs keeping the hashes: array<struct<h,v>>, the MERGEABLE
    * sample form (see dataType doc). */
  def kmin_pair_structs(hash: Column, value: Column, k: Int): Column =
    Bridge.column(KMinPairs(Bridge.expression(hash), Bridge.expression(value), k,
        withHashes = true)
      .toAggregateExpression())
}
