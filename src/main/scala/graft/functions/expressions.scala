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

/** Inverse of [[KplDeaggregate]] — builds KPL aggregates inside query plans
  * (replay/fixture construction; the engine's decode path is the consumer). */
case class KplAggregate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<BINARY> input")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kpl_aggregate"

  override protected def nullSafeEval(input: Any): Any =
    KplAggregate.fromArrayData(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KplAggregate.fromArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KplAggregate {
  def fromArrayData(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val payloads = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { payloads(i) = a.getBinary(i); i += 1 }
    Kpl.aggregate(payloads.toIndexedSeq)
  }
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
/** Shannon entropy (bits) over a string's code points — the Gopher-style
  * gibberish/repetition quality signal. One tight loop per row; counts
  * accumulate in code-point order so the fp summation is deterministic. */
/** Unicode NFC normalization as a codegen'd expression — Spark ships no
  * normalization builtin, and a canonically-composed form is the
  * precondition for any text equality/dedup step (e.g. "é" as U+00E9 vs
  * "e"+U+0301 must fingerprint identically). DuckDB's `nfc_normalize`
  * reproduces it exactly, so normalized outputs stay oracle-checkable. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(input.toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.of(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.of($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  private val Log2 = math.log(2.0)

  def of(s: String): Double = {
    if (s == null || s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      n += 1
      i += Character.charCount(cp)
    }
    var ent = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().doubleValue() / n
      ent -= p * (math.log(p) / Log2)
    }
    ent
  }
}

/** Top-bigram share: the most frequent adjacent word pair's fraction of
  * all bigrams (Gopher repetition signal). One hashmap pass per row —
  * the exploded/groupBy formulation shuffles every bigram of the corpus
  * twice; this ships one double per document. Exact integer ratio, so an
  * external oracle's unnest+count formulation matches bit-for-bit. */
case class BigramTopShare(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING> input")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bigram_top_share"

  override protected def nullSafeEval(input: Any): Any =
    BigramTopShare.of(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("bigramShare")
      s"""
         |java.lang.Double $tmp = graft.functions.BigramTopShare.of($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramTopShare {
  /** null for < 2 tokens (no bigrams exist). */
  def of(tokens: ArrayData): java.lang.Double = {
    val n = tokens.numElements()
    if (n < 2) return null
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var maxK = 0
    var i = 0
    var prev = tokens.getUTF8String(0).toString
    while (i < n - 1) {
      val next = tokens.getUTF8String(i + 1).toString
      val key = prev + ' ' + next
      val k0 = counts.get(key)
      val k = if (k0 == null) 1 else k0 + 1
      counts.put(key, k)
      if (k > maxK) maxK = k
      prev = next
      i += 1
    }
    maxK.toDouble / (n - 1)
  }
}

/** Share of a document's tokens taken by its single most frequent token —
  * the unigram counterpart of [[BigramTopShare]], the Gopher-style
  * repetition gate. One hashmap pass per document; the exploded groupBy
  * formulation shuffles every token in the corpus twice. */
case class TokenTopShare(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING> input")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_top_share"

  override protected def nullSafeEval(input: Any): Any =
    TokenTopShare.of(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("tokenShare")
      s"""
         |java.lang.Double $tmp = graft.functions.TokenTopShare.of($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenTopShare {
  /** null for an empty token array. */
  def of(tokens: ArrayData): java.lang.Double = {
    val n = tokens.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var maxK = 0
    var i = 0
    while (i < n) {
      val key = tokens.getUTF8String(i).toString
      val k0 = counts.get(key)
      val k = if (k0 == null) 1 else k0 + 1
      counts.put(key, k)
      if (k > maxK) maxK = k
      i += 1
    }
    maxK.toDouble / n
  }
}

/** 64-bit SimHash with a pluggable per-token hash:
  *   - `xxh64` (default): XxHash64 seed 42 — the fast production path.
  *   - `md5`: first 8 bytes (big-endian) of MD5 — ~10× slower per token but
  *     portable: any engine with an `md5` function reproduces the signature
  *     bit-for-bit (the DuckDB oracle for `dedup_simhash` recomputes it in
  *     SQL), making the banded near-dup pipeline externally verifiable.
  */
case class SimHash64(child: Expression, algo: String = SimHash64.Xxh64) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      if (SimHash64.Algos(algo)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName algo must be one of ${SimHash64.Algos}")
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING> input")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.fromArrayData(input.asInstanceOf[ArrayData], algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.SimHash64.fromArrayData($c, "$algo")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  val Xxh64 = "xxh64"
  val Md5 = "md5"
  val Algos: Set[String] = Set(Xxh64, Md5)

  private val md5Digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private def tokenHash(t: org.apache.spark.unsafe.types.UTF8String, algo: String): Long =
    if (algo == Md5) {
      val d = md5Digest.get()
      d.reset()
      val out = d.digest(t.getBytes)
      // First 8 digest bytes big-endian == first 16 hex chars of md5(token):
      // the oracle side is ('0x' || substr(md5(t), 1, 16))::UBIGINT.
      java.nio.ByteBuffer.wrap(out, 0, 8).getLong
    } else {
      // XxHash64 over the token bytes, seed 42 (Spark's own hash impl)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
    }

  def fromArrayData(tokens: ArrayData, algo: String): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = tokenHash(t, algo)
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

/** MinHash signature in ONE pass over the shingle array: per shingle a
  * single xxhash64, then `numPerm` cheap universal-hash mixes (a·h+b with
  * Java wraparound), tracking all minima simultaneously. Composing this
  * from built-in higher-order functions needs numPerm separate array
  * traversals and a ~numPerm× larger codegen'd expression tree (observed:
  * 100× slower and janino-hostile), so this is exactly the case for a
  * custom Expression. */
case class MinHashSignature(child: Expression, numPerm: Int) extends UnaryExpression {
  require(numPerm > 0 && numPerm <= 512)
  private def isHashed: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) |
         ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> or ARRAY<BIGINT> (pre-hashed) input")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    if (isHashed) MinHashSignature.computeFromHashes(input.asInstanceOf[ArrayData], numPerm)
    else MinHashSignature.compute(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isHashed) "computeFromHashes" else "compute"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.$fn($c, $numPerm)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private val MaxPerm = 512
  // Fixed universal-hash parameters (odd multipliers), seeded once.
  private val (as, bs) = {
    val rnd = new java.util.Random(42)
    (Array.fill(MaxPerm)(rnd.nextLong() | 1L), Array.fill(MaxPerm)(rnd.nextLong()))
  }

  def compute(shingles: ArrayData, numPerm: Int): ArrayData = {
    val mins = new Array[Long](numPerm)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        update(mins, h, numPerm)
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Variant over pre-hashed shingles (array<long>, e.g. [[ShingleHashes]]
    * output) — skips the string re-hash. */
  def computeFromHashes(shingles: ArrayData, numPerm: Int): ArrayData = {
    val mins = new Array[Long](numPerm)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      update(mins, shingles.getLong(i), numPerm)
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def update(mins: Array[Long], h: Long, numPerm: Int): Unit = {
    var p = 0
    while (p < numPerm) {
      val m = as(p) * h + bs(p)
      if (m < mins(p)) mins(p) = m
      p += 1
    }
  }
}

/** Distinct hashed word n-gram shingles in ONE pass: tokens → xxhash64 of
  * each n-gram (rolling window over pre-hashed tokens, combined with a
  * mixing step) → distinct array<long>. The composed built-in form
  * (sequence+transform+slice+concat_ws) re-evaluates its inputs per lambda
  * element — observed ~1ms/doc; this is O(tokens). */
case class ShingleHashes(child: Expression, n: Int,
                         distinct: Boolean = true) extends UnaryExpression {
  require(n > 0)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING> input")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (distinct) "shingle_hashes" else "shingle_hash_list"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val cnt = tokens.numElements()
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val t = tokens.getUTF8String(i)
      th(i) =
        if (t == null) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      i += 1
    }
    val m = if (cnt <= n) 1 else cnt - n + 1
    val set = if (distinct) new java.util.HashSet[java.lang.Long](m * 2) else null
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    var s = 0
    while (s < m) {
      var h = -7046029254386353131L // FNV-style seed
      var j = s
      val end = math.min(s + n, cnt)
      while (j < end) {
        h = java.lang.Long.rotateLeft(h, 5) ^ th(j)
        h *= -8796714831421723037L // 64-bit odd mixing constant
        j += 1
      }
      if (set == null || set.add(h)) out += h
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Sign-LSH hyperplane signature in ONE pass: bit p = sign of <v, r_p>,
  * where r_p components are deterministic pseudo-random values derived by
  * hash-mixing (plane, dim) — reproducible on any cluster, no RNG state,
  * no stored plane matrix. Replaces planes × (zip_with+aggregate)
  * traversals. */
case class HyperplaneSig(child: Expression, planes: Int) extends UnaryExpression {
  require(planes > 0 && planes <= 64)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<DOUBLE> input")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneSig.compute($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {

  /** The derived plane matrix (planes × dims), exactly as [[compute]]
    * evaluates it per row. Public so the DuckDB oracle SQL can embed the
    * constants verbatim (shortest-round-trip double literals) and
    * recompute signatures without reproducing splitmix64's wraparound
    * arithmetic in SQL. */
  def matrix(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => component(p, d))

  /** The single plane component (p, d) — shared with [[RandomProject]],
    * which keeps the real projection where [[compute]] keeps the sign. */
  private[functions] def matrixComponent(plane: Int, dim: Int): Double =
    component(plane, dim)

  /** splitmix64 finalizer — uniform component in [-1, 1). */
  private def component(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL + 42L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  def compute(v: ArrayData, planes: Int): Long = {
    val dims = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < dims) {
        proj += v.getDouble(d) * component(p, d)
        d += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003) in
  * ONE imperative pass: md5 each character k-gram once, then take sliding
  * window-of-`w` minima and dedup. The composed higher-order-function
  * form (`transform(..., i -> array_min(slice(grams, i, w)))`) re-inlines
  * the gram-array subtree into every window lambda — O(n·w) md5 calls per
  * row, measured as a multi-minute stall at sf0.1. Here each k-gram is
  * hashed exactly once: O(n) digests + O(n·w) long comparisons.
  *
  * Hash = first 32 bits of md5 over the k-gram's UTF-8 bytes, by CODE
  * POINT positions — exactly `conv(substring(md5(substr(text,i,k)),1,8),
  * 16,10)` in Spark and `('0x' || substr(md5(text[i:i+k-1]),1,8))::BIGINT`
  * in DuckDB, so the oracle replays fingerprinting bit-for-bit. */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: String, k: Int, w: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val ng = n - k + 1
    val gh = new Array[Long](ng)
    val md = digest.get()
    var i = 0
    while (i < ng) {
      md.reset()
      val d = md.digest(new String(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      gh(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val m = math.max(ng - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var st = 0
    while (st < m) {
      var mn = Long.MaxValue
      var j = st
      val end = math.min(st + w, ng)
      while (j < end) { if (gh(j) < mn) mn = gh(j); j += 1 }
      seen.add(mn)
      st += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}

/** Column-API surface for the custom expressions. */
/** Float32-pack an `array<double>` embedding: each element narrowed to
  * IEEE-754 binary32 (round-to-nearest-even — the same conversion DuckDB's
  * `CAST(x AS FLOAT)` performs, so oracles replay the quantization
  * bit-for-bit) and laid out little-endian, 4 bytes per dimension, as one
  * BINARY blob. At 100 TB the ANN / k-means family is SCAN-bound and
  * embeddings dominate the bytes: a packed column halves raw vector bytes
  * vs `array<double>` and drops parquet's per-element repetition levels —
  * the same storage move as [[HyperplaneSig]]'s 64× sign-bit packing, at
  * float32 fidelity instead of 1-bit. */
case class PackF32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<DOUBLE> input")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_f32"

  override protected def nullSafeEval(input: Any): Any =
    PackF32.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackF32.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackF32 {
  def pack(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToIntBits(v.getDouble(i).toFloat)
      val o = i * 4
      out(o) = bits.toByte
      out(o + 1) = (bits >>> 8).toByte
      out(o + 2) = (bits >>> 16).toByte
      out(o + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }
}

/** Inverse of [[PackF32]]: BINARY → `array<double>` by exact float32 →
  * float64 widening (lossless), so every existing distance / cosine /
  * quantization expression composes unchanged on the packed scan. */
case class UnpackF32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unpack_f32"

  override protected def nullSafeEval(input: Any): Any =
    UnpackF32.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnpackF32.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnpackF32 {
  def unpack(b: Array[Byte]): ArrayData = {
    require(b.length % 4 == 0, s"packed f32 length ${b.length} not a multiple of 4")
    val n = b.length / 4
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val o = i * 4
      val bits = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Johnson-Lindenstrauss random projection in ONE pass: y_p = <v, r_p>
  * for `rDims` planes, REAL-valued (where [[HyperplaneSig]] keeps only the
  * sign bit). Plane components come from the SAME splitmix64 hash-mixing
  * as sign-LSH — deterministic, no RNG state, no stored matrix — so the
  * DuckDB oracle embeds [[HyperplaneSig.matrix]]'s constants verbatim and
  * replays every projection bit-for-bit (left-to-right dim fold). The
  * dimension-reduction lever for ANN at 100 TB: a 64→16 projection cuts
  * vector bytes 4× ahead of any distance scan, with the JL guarantee
  * bounding the distortion; `sim_rp_recall` measures what it costs. */
case class RandomProject(child: Expression, rDims: Int) extends UnaryExpression {
  require(rDims > 0 && rDims <= 256)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<DOUBLE> input")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "random_project"

  override protected def nullSafeEval(input: Any): Any =
    RandomProject.compute(input.asInstanceOf[ArrayData], rDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RandomProject.compute($c, $rDims)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProject {
  def compute(v: ArrayData, rDims: Int): ArrayData = {
    val dims = v.numElements()
    val out = new Array[Double](rDims)
    var p = 0
    while (p < rDims) {
      // identical component derivation AND fold order to
      // HyperplaneSig.compute — the oracle replays both from the same
      // embedded matrix constants
      var proj = 0.0
      var d = 0
      while (d < dims) {
        proj += v.getDouble(d) * HyperplaneSig.matrixComponent(p, d)
        d += 1
      }
      out(p) = proj
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Int8 scalar quantization (SQ8) of an `array<double>` embedding against
  * a corpus-global scale: code[i] = clamp(floor(x[i]*127/scale + 0.5),
  * -127, 127), one SIGNED BYTE per dimension. The arithmetic is chosen to
  * be replayable in ANSI SQL (floor(+0.5) instead of a platform round;
  * left-to-right (x*127)/scale), so the DuckDB oracle reproduces every
  * code bit-for-bit. vs `array<double>` this is an 8× reduction in raw
  * vector bytes — the scan-side lever for a 100 TB ANN corpus where the
  * first-stage ranking tolerates quantization and a small re-rank
  * restores exactness (same two-stage shape as [[HyperplaneSig]]'s 1-bit
  * signatures, at 8-bit fidelity). */
case class PackI8(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.DoubleType, _),
            org.apache.spark.sql.types.DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires (ARRAY<DOUBLE>, DOUBLE)")
    }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_i8"

  override protected def nullSafeEval(v: Any, s: Any): Any =
    PackI8.pack(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) => s"graft.functions.PackI8.pack($v, $s)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PackI8 {
  def pack(v: ArrayData, scale: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = math.floor(v.getDouble(i) * 127.0 / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }
}

/** Inverse of [[PackI8]] up to the quantization: BINARY → `array<long>`
  * of the signed int8 codes (NOT dequantized values — integer codes keep
  * downstream dot products exact and hash-stable). */
case class UnpackI8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unpack_i8"

  override protected def nullSafeEval(input: Any): Any =
    UnpackI8.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnpackI8.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnpackI8 {
  def unpack(b: Array[Byte]): ArrayData = {
    val out = new Array[Long](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toLong; i += 1 }
    new GenericArrayData(out)
  }
}

/** Exact integer dot product of two [[PackI8]] codes, straight off the
  * bytes (no array materialization, no per-element null machinery): the
  * int8 first-stage ranking kernel. |code| ≤ 127 and realistic dims keep
  * the sum far inside a long (64 dims → |dot| ≤ 64·127² ≈ 1.03e6). */
case class DotI8(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (BINARY, BINARY)")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotI8.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotI8.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotI8 {
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"int8 code length mismatch: ${a.length} vs ${b.length}")
    var acc = 0L
    var i = 0
    while (i < a.length) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }
  def normSq(a: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < a.length) { acc += a(i).toLong * a(i).toLong; i += 1 }
    acc
  }
}

/** Σ code² of a [[PackI8]] blob — the quantized squared norm, exact. */
case class NormSqI8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normsq_i8"

  override protected def nullSafeEval(input: Any): Any =
    DotI8.normSq(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DotI8.normSq($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftFunctions {
  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  def gunzip_if_gzip(c: Column): Column = col(GunzipIfGzip(expr(c)))
  def kpl_deaggregate(c: Column): Column = col(KplDeaggregate(expr(c)))
  def kpl_aggregate(c: Column): Column = col(KplAggregate(expr(c)))
  def gzip_compress(c: Column): Column = col(GzipCompress(expr(c)))
  def simhash64(c: Column, algo: String = SimHash64.Xxh64): Column =
    col(SimHash64(expr(c), algo))
  def char_entropy(c: Column): Column = col(CharEntropy(expr(c)))
  def nfc_normalize(c: Column): Column = col(NfcNormalize(expr(c)))
  def bigram_top_share(c: Column): Column = col(BigramTopShare(expr(c)))
  def token_top_share(c: Column): Column = col(TokenTopShare(expr(c)))
  def minhash_signature(c: Column, numPerm: Int): Column =
    col(MinHashSignature(expr(c), numPerm))
  def shingle_hashes(c: Column, n: Int): Column = col(ShingleHashes(expr(c), n))
  def shingle_hash_list(c: Column, n: Int): Column =
    col(ShingleHashes(expr(c), n, distinct = false))
  def winnow_fps(c: Column, k: Int, w: Int): Column = col(WinnowFps(expr(c), k, w))
  def hyperplane_sig(c: Column, planes: Int): Column = col(HyperplaneSig(expr(c), planes))
  def pack_f32(c: Column): Column = col(PackF32(expr(c)))
  def unpack_f32(c: Column): Column = col(UnpackF32(expr(c)))
  def random_project(c: Column, rDims: Int): Column = col(RandomProject(expr(c), rDims))
  def pack_i8(c: Column, scale: Column): Column = col(PackI8(expr(c), expr(scale)))
  def unpack_i8(c: Column): Column = col(UnpackI8(expr(c)))
  def dot_i8(a: Column, b: Column): Column = col(DotI8(expr(a), expr(b)))
  def normsq_i8(c: Column): Column = col(NormSqI8(expr(c)))
  def dateutil_timestamp(c: Column): Column = col(DateUtilTimestamp(expr(c)))

  /** Mark a column as provably non-null (Catalyst's KnownNotNull). Use on
    * derived join/filter keys whose defining expression is expensive:
    * otherwise InferFiltersFromConstraints pushes an `isnotnull(<expr>)`
    * check below the defining Project, re-evaluating the whole expression
    * once in the filter and again in the projection (observed 2× per-row
    * vector math in the LSH plans). Caller must guarantee non-nullness
    * (e.g. null-intolerant expression over an already-filtered input). */
  def known_not_null(c: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.KnownNotNull(expr(c)))

  /** Single source of truth for the SQL function surface: (name, usage,
    * builder). Consumed by [[register]] (runtime) and
    * [[graft.GraftExtensions]] (build-time injection). */
  val sqlFunctions: Seq[(String, String, Expression => Expression)] = Seq(
    ("gunzip_if_gzip", "inflate gzip payloads, pass-through otherwise", GunzipIfGzip.apply),
    ("gzip_compress", "gzip-compress binary payloads", GzipCompress.apply),
    ("kpl_deaggregate", "split a KPL aggregate into user records", KplDeaggregate.apply),
    ("kpl_aggregate", "pack binary payloads into one KPL aggregate", KplAggregate.apply),
    ("simhash64", "64-bit SimHash of a token array (xxh64)", e => SimHash64(e)),
    ("simhash64_md5", "portable md5-based 64-bit SimHash of a token array",
      e => SimHash64(e, SimHash64.Md5)),
    ("char_entropy", "Shannon entropy (bits) over a string's code points", CharEntropy.apply),
    ("nfc_normalize", "Unicode NFC canonical composition", NfcNormalize.apply),
    ("bigram_top_share", "top adjacent-word-pair share of all bigrams", BigramTopShare.apply),
    ("token_top_share", "top single token's share of all tokens", TokenTopShare.apply),
    ("minhash_signature64", "64-perm MinHash signature of shingles", MinHashSignature(_, 64)),
    ("shingle_hashes3", "distinct hashed 3-gram shingles of a token array", ShingleHashes(_, 3)),
    ("hyperplane_sig16", "16-plane sign-LSH signature of array<double>", HyperplaneSig(_, 16)),
    ("dateutil_timestamp", "parse day-name timestamp forms (RFC-1123/asctime)", DateUtilTimestamp.apply),
    // bounded-state aggregates (fixed-k variants for the 1-arg SQL surface)
    ("kmin_strings64", "64 smallest distinct strings (KMV sketch state)",
      e => KMinStrings(e, 64).toAggregateExpression()),
    ("mg_candidates256", "Misra-Gries frequent-item candidates, 256 counters",
      e => MisraGries(e, 256).toAggregateExpression()),
    ("winnow_fps8", "winnowing fingerprints (k=8, w=8) of a string",
      e => WinnowFps(e, 8, 8)),
    ("count_min4x256", "Count-Min sketch (4x256 md5 counters) of string values",
      e => CountMinLongs(e, 4, 256).toAggregateExpression()))

  /** Register every custom expression as a SQL temp function on an
    * existing session (the build-time path is [[graft.GraftExtensions]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, _, build) =>
      reg.createOrReplaceTempFunction(name, es => build(es.head), "built-in")
    }
  }
}
