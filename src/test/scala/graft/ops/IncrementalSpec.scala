package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental MV maintenance: merged partials equal the full recompute,
  * including when the delta back-fills days the MV already covers. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("merge(MV, late delta) == full recompute, day by day") {
    val ev = graft.Tables.events(spark, sf)
    val full = Incremental.partialDaily(ev)
    val merged = Incremental.merge(
      Incremental.partialDaily(ev.filter(col("event_id") % 3 =!= 0)),
      Incremental.partialDaily(ev.filter(col("event_id") % 3 === 0)))
    // counts and min/max merge exactly; sums to a rounding-stable epsilon
    val joined = full.as("f").join(merged.as("m"), Seq("event_type", "day"), "full")
    assert(joined.filter(col("f.n").isNull || col("m.n").isNull).count() == 0,
      "merge lost or invented a (type, day) group")
    assert(joined.filter(col("f.n") =!= col("m.n") ||
      col("f.mn") =!= col("m.mn") || col("f.mx") =!= col("m.mx")).count() == 0)
    assert(joined.filter(abs(col("f.sv") - col("m.sv")) > 1e-6).count() == 0)
  }

  test("three-way merge folds like two-way (associativity over slices)") {
    val ev = graft.Tables.events(spark, sf)
    val parts = (0 until 3).map(k => Incremental.partialDaily(ev.filter(col("event_id") % 3 === k)))
    val threeWay = Incremental.merge(parts: _*)
    val nested = Incremental.merge(Incremental.merge(parts(0), parts(1)), parts(2))
    val j = threeWay.as("a").join(nested.as("b"), Seq("event_type", "day"), "full")
    assert(j.filter(col("a.n").isNull || col("b.n").isNull).count() == 0)
    assert(j.filter(col("a.n") =!= col("b.n") ||
      col("a.mn") =!= col("b.mn") || col("a.mx") =!= col("b.mx")).count() == 0)
    assert(j.filter(abs(col("a.sv") - col("b.sv")) > 1e-6).count() == 0)
  }

  test("IVF append MV == full recompute under the frozen quantizer") {
    val e = graft.Tables.table(spark, sf, "embeddings")
    val base = e.filter(col("vec_id") % 5 =!= 0)
    val delta = e.filter(col("vec_id") % 5 === 0)
    val merged = Similarity.ivfAppendProfile(base, delta, "vec_id", "embedding")
      .collect().map(_.toSeq).toSeq
    // recompute: assign base ∪ delta in one pass against the SAME frozen
    // base-trained centroids; the MV-delta merge must be indistinguishable
    val centers = Similarity.trainCenters(base, "vec_id", "embedding", 16, 4096)
    val full = Similarity.assignCells(base.unionByName(delta), "vec_id", "embedding", centers)
      .groupBy("cell")
      .agg(sum(when(col("id") % 5 =!= 0, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("id") % 5 === 0, 1L).otherwise(0L)).as("n_new"),
        count(lit(1)).as("n_total"))
      .withColumn("share", round(col("n_total") * lit(1.0) /
        sum("n_total").over(org.apache.spark.sql.expressions.Window.partitionBy()), 4))
      .orderBy("cell")
      .collect().map(_.toSeq).toSeq
    assert(merged == full)
  }
}
