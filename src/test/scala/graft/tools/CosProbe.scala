package graft.tools

import org.apache.spark.sql.functions._

/** One-off probe: stage timings/volumes of the shingle-tf cosine dedup on
  * the real sf fixtures, for README scale notes. Run with
  * `sbt "Test/runMain graft.tools.CosProbe [sfDir]"`. */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local()
    val d = graft.Tables.table(spark, dir, "documents")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the scan
    d.count()
    val tf = graft.ops.Par.spread(d.select(col("doc_id"), col("text")))
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        explode(graft.ops.Dedup.wordShingleList(col("text"), 3)).as("t"))
      .groupBy("t", "id").agg(count(lit(1)).as("tf"))
    val tfc = t("tf-agg")(tf.localCheckpoint(true))
    println(s"PROBE tf rows=${tfc.count()}")
    val buckets = t("buckets")(tfc.groupBy("t")
      .agg(sort_array(collect_list(struct(col("id"), col("tf")))).as("ps"))
      .filter(size(col("ps")) <= 128).localCheckpoint(true))
    println(s"PROBE buckets=${buckets.count()}")
    val norms = t("norms")(buckets.select(explode(col("ps")).as("p"))
      .groupBy(col("p.id").as("id"))
      .agg(sum(col("p.tf") * col("p.tf")).as("nsq")).localCheckpoint(true))
    val dots = t("dots")(buckets.filter(size(col("ps")) >= 2).select(explode(expr(
        """flatten(transform(sequence(2, size(ps)), j ->
          |  transform(slice(ps, 1, j - 1), x -> named_struct(
          |    'id_a', x.id, 'id_b', element_at(ps, j).id,
          |    'c', x.tf * element_at(ps, j).tf))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.c"))
      .groupBy("id_a", "id_b").agg(sum("c").as("dot")).localCheckpoint(true))
    println(s"PROBE dots=${dots.count()}")
    val fin = t("joins")(dots
      .join(norms.select(col("id").as("id_a"), col("nsq").as("nsq_a")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nsq").as("nsq_b")), "id_b")
      .withColumn("cos2_fp", expr(
        """(cast(dot as decimal(38,0)) * cast(dot as decimal(38,0))
          | * 1000000000000L)
          | div (cast(nsq_a as decimal(38,0)) * nsq_b)""".stripMargin))
      .filter(col("cos2_fp") >= 640000000000L).count())
    println(s"PROBE final=$fin dir=$dir")
    spark.stop()
  }
}
