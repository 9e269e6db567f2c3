package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** The SQL surface of the custom expressions (runtime registration on the
  * shared session; the build-time SparkSessionExtensions path installs the
  * same functions). */
class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from pure SQL") {
    GraftFunctions.register(spark)
    val gz = spark.sql(
      "SELECT cast(gunzip_if_gzip(gzip_compress(cast('hello' AS BINARY))) AS STRING) AS v")
      .collect().head.getString(0)
    assert(gz == "hello")
    val sh = spark.sql("SELECT simhash64(array('a','b','c')) AS h").collect().head.getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array('a','b','c')) AS h").collect().head.getLong(0)
    assert(sh == sh2 && sh != 0L)
    val mh = spark.sql(
      "SELECT size(minhash_signature64(shingle_hashes3(array('a','b','c','d')))) AS n")
      .collect().head.getInt(0)
    assert(mh == 64)
    val hp = spark.sql("SELECT hyperplane_sig16(array(1.0d, -2.0d, 0.5d)) AS s")
      .collect().head.getLong(0)
    assert(hp >= 0L && hp < (1L << 16))
    val kpl = spark.sql(
      "SELECT size(kpl_deaggregate(cast('plain' AS BINARY))) AS n")
      .collect().head.getInt(0)
    assert(kpl == 1)
  }

  test("bounded aggregates are callable from pure SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq("u1", "u2", "u1", "u3", "u1").toDF("v").createOrReplaceTempView("agg_in")
    val km = spark.sql("SELECT kmin_strings64(md5(v)) AS ks FROM agg_in")
      .collect().head.getSeq[String](0)
    assert(km.size == 3 && km == km.sorted) // 3 distinct hashes, ascending
    val mg = spark.sql("SELECT mg_candidates256(v) AS c FROM agg_in")
      .collect().head.getSeq[String](0)
    assert(mg.head == "u1") // most frequent first
    assert(mg.toSet == Set("u1", "u2", "u3"))
  }

  test("GraftExtensions injects without error (build-time wiring)") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("pack_f32 / unpack_f32: float32 narrowing, lossless widening") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    import spark.implicits._
    val v = Seq(0.1, -1.5, 0.0, 1e-40, math.Pi, Double.MaxValue)
    val df = Seq((1L, v)).toDF("id", "v")
    val packed = df.select(pack_f32(col("v")).as("b"))
    // 4 bytes per dimension
    assert(packed.head.getAs[Array[Byte]](0).length == v.length * 4)
    // round trip = the exact double→float32→double narrowing the oracle
    // replays with CAST(x AS FLOAT): bit-for-bit, including ±Inf overflow
    val rt = packed.select(unpack_f32(col("b")).as("v")).head.getSeq[Double](0)
    assert(rt == v.map(x => x.toFloat.toDouble))
    // narrowing is idempotent: packing the unpacked column is stable
    val rt2 = packed.select(unpack_f32(pack_f32(unpack_f32(col("b")))).as("v"))
      .head.getSeq[Double](0)
    assert(rt2 == rt)
    // nulls pass through (null-intolerant expressions)
    val nulls = Seq((1L, null.asInstanceOf[Seq[Double]])).toDF("id", "v")
    assert(nulls.select(pack_f32(col("v"))).head.isNullAt(0))
  }

  test("random_project: JL projection matches the embedded plane matrix") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    import spark.implicits._
    val v = Seq(1.0, -0.5, 0.25, 2.0)
    val got = Seq((1L, v)).toDF("id", "v")
      .select(random_project(col("v"), 3).as("y"))
      .head.getSeq[Double](0)
    val m = graft.functions.HyperplaneSig.matrix(3, 4)
    val want = (0 until 3).map(p =>
      (0 until 4).map(d => v(d) * m(p)(d)).foldLeft(0.0)(_ + _))
    assert(got == want) // bit-exact: same fold order as the matrix replay
    // nulls pass through
    val nulls = Seq((1L, null.asInstanceOf[Seq[Double]])).toDF("id", "v")
    assert(nulls.select(random_project(col("v"), 3)).head.isNullAt(0))
  }

  test("optimizer rule eliminates gzip roundtrips from the plan") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val df = spark.range(3).toDF("id")
      .select(gunzip_if_gzip(gzip_compress(col("id").cast("string").cast("binary"))).as("b"))
    val before = df.queryExecution.analyzed
    assert(before.toString.contains("gzip_compress"))
    val after = graft.plans.GzipRoundtripElimination(before)
    assert(!after.toString.contains("gzip_compress") &&
      !after.toString.contains("gunzip_if_gzip"))
    // semantics preserved: rewritten plan produces the original bytes
    val out = df.collect().map(r => new String(r.getAs[Array[Byte]](0)))
    assert(out.toSeq == Seq("0", "1", "2"))
  }
}
