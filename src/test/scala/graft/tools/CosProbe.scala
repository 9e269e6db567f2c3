package graft.tools

import org.apache.spark.sql.functions._

/** One-off probe: stage timings/volumes of the shingle-tf cosine dedup on
  * the real sf fixtures, for README scale notes. Calls the operator's OWN
  * stage bodies ([[graft.ops.CosineTfStages]]) with a localCheckpoint
  * between stages — same plans as `Dedup.cosinePairsTf`, never a copy
  * (formula-drift guard). Run with
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
    import graft.ops.CosineTfStages
    val tfc = t("tf-agg")(
      CosineTfStages.tf(d, "doc_id", "text", 3).localCheckpoint(true))
    println(s"PROBE tf rows=${tfc.count()}")
    val buckets = t("buckets")(
      CosineTfStages.buckets(tfc, 128L).localCheckpoint(true))
    println(s"PROBE buckets=${buckets.count()}")
    val norms = t("norms")(
      CosineTfStages.norms(buckets).localCheckpoint(true))
    val dots = t("dots")(
      CosineTfStages.dots(buckets).localCheckpoint(true))
    println(s"PROBE dots=${dots.count()}")
    // threshold 0.8 → ⌊0.64·1e12⌋, the dedup_cosine_tf contract; the
    // norm-join hint rides the same footer-metadata gate as the operator
    val hint = graft.ops.Dedup.normJoinHint(
      graft.Tables.footerRowCount(dir, "documents"))
    val fin = t("joins")(CosineTfStages.score(dots, norms, hint)
      .filter(col("cos2_fp") >= 640000000000L).count())
    println(s"PROBE final=$fin dir=$dir")
    spark.stop()
  }
}
