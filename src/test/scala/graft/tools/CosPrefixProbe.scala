package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 A/B prototype for the verdict's dedup item: prefix-filtered
  * candidate generation (SSJoin/All-Pairs, Chaudhuri 2006 / Bayardo 2007)
  * for the tf-cosine dedup, raced IN PLACE against the production Σdf²
  * bucket-explode ([[graft.ops.CosineTfStages.dots]]).
  *
  * The prune (exact, threshold-aware): order every doc's capped grams by
  * the global (df ASC, gram) order; a posting at position i is in the
  * doc's PREFIX iff the suffix squared mass from i on satisfies
  * S_inc(i)·1e12 ≥ thresholdFp·nsq. Any pair with
  * cos2_fp ≥ thresholdFp shares its first common gram (in the same
  * global order) inside BOTH prefixes — were it outside a's prefix, all
  * shared grams would sit in a's strict suffix and Cauchy–Schwarz gives
  * dot² ≤ S_a·nsq_b < (thresholdFp/1e12)·nsq_a·nsq_b. Candidates are
  * therefore the prefix-prefix bucket pairs; exact dots are then computed
  * for candidates only, from per-doc gram→tf maps.
  *
  * Prints stage timings, volumes, and a result-equality check vs the
  * production path. Run:
  * `sbt "Test/runMain graft.tools.CosPrefixProbe [sfDir]"`. */
object CosPrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(logLevel = "ERROR")
    val d = graft.Tables.table(spark, dir, "documents")
    d.count() // warm scan
    import graft.ops.CosineTfStages
    val thresholdFp = 640000000000L // threshold 0.8, the dedup_cosine_tf row
    val maxDf = 128L
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PREFIX $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tfc = CosineTfStages.tf(d, "doc_id", "text", 3).localCheckpoint(true)
    val buckets = CosineTfStages.buckets(tfc, maxDf).localCheckpoint(true)
    val norms = CosineTfStages.norms(buckets).localCheckpoint(true)
    val hint = graft.ops.Dedup.normJoinHint(
      graft.Tables.footerRowCount(dir, "documents"))

    // ---- production path (repeat 3, min) ----
    for (r <- 1 to 3) {
      val oldDots = t(s"OLD dots+score run$r") {
        CosineTfStages.score(CosineTfStages.dots(buckets), norms, hint)
          .filter(col("cos2_fp") >= thresholdFp).count()
      }
      println(s"PREFIX old result rows=$oldDots")
    }

    // ---- prefix-pruned path (repeat 3, min) ----
    for (r <- 1 to 3) {
      val n = t(s"NEW prefix dots+score run$r") {
        val post = buckets.select(col("t"), size(col("ps")).as("df"),
          explode(col("ps")).as("p"))
          .select(col("t"), col("df"), col("p.id").as("id"), col("p.tf").as("tf"))
        val w = Window.partitionBy("id")
          .orderBy(col("df").desc, col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pref = post
          .withColumn("sinc", sum(col("tf") * col("tf")).over(w))
          .join(graft.ops.Dedup.maybeHint(norms.select(col("id"), col("nsq")), hint), "id")
          .filter(expr(s"cast(sinc as decimal(38,0)) * 1000000000000L >= " +
            s"cast($thresholdFp as decimal(38,0)) * nsq"))
          .select(col("t"), col("id"))
        val prefBuckets = pref.groupBy("t")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) >= 2)
        val cands = prefBuckets.select(explode(expr(
            """flatten(transform(sequence(2, size(ids)), j ->
              |  transform(slice(ids, 1, j - 1),
              |    x -> named_struct('id_a', x, 'id_b', element_at(ids, j)))))"""
              .stripMargin)).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .distinct()
        val vecs = post.groupBy("id")
          .agg(map_from_entries(collect_list(struct(col("t"), col("tf")))).as("m"))
        val dots = cands
          .join(graft.ops.Dedup.maybeHint(
            vecs.select(col("id").as("id_a"), col("m").as("ma")), hint), "id_a")
          .join(graft.ops.Dedup.maybeHint(
            vecs.select(col("id").as("id_b"), col("m").as("mb")), hint), "id_b")
          .select(col("id_a"), col("id_b"), expr(
            """aggregate(map_entries(mb), 0L,
              |  (acc, e) -> acc + coalesce(element_at(ma, e.key), 0L) * e.value)"""
              .stripMargin).as("dot"))
        CosineTfStages.score(dots, norms, hint)
          .filter(col("cos2_fp") >= thresholdFp).count()
      }
      println(s"PREFIX new result rows=$n")
    }
    spark.stop()
  }
}
