package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Native Catalyst expressions for the decode hot path (SURVEY.md §2.2).
  *
  * These stay inside whole-stage codegen (a static Java call, no Scala-UDF
  * serialization / row boxing), which matters because decode runs on every
  * raw record at the ingest edge — the 100 TB-scale fan-in point.
  */

/** D3: inflate gzip payloads, pass anything else through (reference
  * README.md:10 — "may be gzipped"). */
case class GunzipIfGzip(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gunzip_if_gzip"

  override protected def nullSafeEval(input: Any): Any =
    GzipUtil.gunzipIfNeeded(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipUtil.gunzipIfNeeded($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** D2: KPL deaggregation as a generator-feeding expression:
  * binary → array<binary> of user records (1 element for plain records),
  * exploded by the caller. */
case class KplDeaggregate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kpl_deaggregate"

  override protected def nullSafeEval(input: Any): Any =
    KplDeaggregate.toArrayData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.KplDeaggregate.toArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KplDeaggregate {
  /** Static entry point shared by interpreted eval and generated code. */
  def toArrayData(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(Kpl.deaggregate(bytes).asInstanceOf[Array[Any]])
}

/** Inverse of [[GunzipIfGzip]] — used to build gzip fixtures/replays inside
  * query plans (the engine's decode path is the consumer). */
case class GzipCompress(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gzip_compress"

  override protected def nullSafeEval(input: Any): Any =
    GzipUtil.gzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipUtil.gzip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash-64 of a token array: per-token xxhash64, each of the 64 bit
  * positions votes ±1, sign of the tally becomes the output bit. A single
  * tight Java loop per row (vs ~64 nested higher-order array traversals if
  * composed from built-ins) — this is the custom-Expression preference tier
  * of the build rules: scalar function Spark lacks, codegen-friendly.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING> input")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.fromArrayData(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.fromArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def fromArrayData(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        // XxHash64 over the token bytes, seed 42 (Spark's own hash impl)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Column-API surface for the custom expressions. */
object GraftFunctions {
  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  def gunzip_if_gzip(c: Column): Column = col(GunzipIfGzip(expr(c)))
  def kpl_deaggregate(c: Column): Column = col(KplDeaggregate(expr(c)))
  def gzip_compress(c: Column): Column = col(GzipCompress(expr(c)))
  def simhash64(c: Column): Column = col(SimHash64(expr(c)))

  /** Register for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "gunzip_if_gzip", es => GunzipIfGzip(es.head), "builtin")
    reg.createOrReplaceTempFunction(
      "kpl_deaggregate", es => KplDeaggregate(es.head), "builtin")
  }
}
