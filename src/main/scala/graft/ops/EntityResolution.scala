package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: exact edit-distance self-join via segment blocking
  * (the PassJoin scheme — Li, Deng & Feng, "PASS-JOIN: a partition-based
  * method for similarity joins", VLDB 2011).
  *
  * To find all pairs within Levenshtein distance τ WITHOUT an all-pairs
  * scan, each indexed string of length l is partitioned into τ+1
  * contiguous segments (even split, later segments one char longer). By
  * pigeonhole, τ edits leave at least one segment untouched, and the net
  * insertions/deletions before it shift its position by at most τ — so
  * every true pair shares an exact (length, slot, substring) key where the
  * probe side enumerates substrings at the segment's position ± τ for each
  * candidate length within ± τ. Candidate generation is therefore a pure
  * EQUI-join: a bounded constant (≈ (2τ+1)²·(τ+1) keys per probe string)
  * times corpus size, never corpus², and it shuffles on the segment hash —
  * the shape that survives 100 TB. The exact `levenshtein` check runs only
  * on the candidates (output-sized, near-linear for real vocabularies).
  *
  * Complete (no candidate loss): verified against the all-pairs DuckDB
  * oracle in `q_fuzzy_name_pairs`.
  */
object EntityResolution {

  /** All unordered pairs of distinct values of `nameCol` within edit
    * distance ≤ τ. Output: (name_a, name_b, dist), name_a < name_b.
    * Strings shorter than τ+1 chars are excluded (a segment would be
    * empty; at τ=2 that only drops ≤2-char names, which match almost
    * anything anyway — filter them upstream deliberately). */
  def fuzzySelfJoin(df: DataFrame, nameCol: String, tau: Int = 2): DataFrame = {
    require(tau >= 1 && tau <= 4, s"tau must be in [1, 4], got $tau")
    val m = tau + 1
    val names = df.select(col(nameCol).as("nm")).filter(
      col("nm").isNotNull && length(col("nm")) >= m).distinct()

    // indexed side: the τ+1 segments of each name; seg i of a length-l
    // string starts at i*base + max(0, i-(m-k)) with length base(+1 for
    // the last k = l%m slots), base = l div m
    val idx = names
      .withColumn("key", explode(expr(
        s"""transform(sequence(0, $tau), i -> named_struct(
           |  'l', length(nm), 'slot', i,
           |  'seg', substring(nm,
           |     i * (length(nm) div $m)
           |       + greatest(0, i - ($m - length(nm) % $m)) + 1,
           |     (length(nm) div $m)
           |       + if(i >= $m - length(nm) % $m, 1, 0))))""".stripMargin)))
      .select(col("nm").as("name_a"), col("key.l").as("l"),
        col("key.slot").as("slot"), col("key.seg").as("seg"))

    // probe side: for each candidate indexed length l = L±τ and slot i,
    // the substrings of this name with slot i's length at the slot's
    // start position shifted by -τ..τ — the multi-match window
    val prb = names
      .withColumn("key", explode(array_distinct(expr(
        s"""transform(
           |  filter(
           |    flatten(transform(sequence(${-tau}, $tau), dl ->
           |      flatten(transform(sequence(0, $tau), i ->
           |        transform(sequence(${-tau}, $tau), sh -> named_struct(
           |          'l', length(nm) + dl, 'slot', i,
           |          'p', i * ((length(nm) + dl) div $m)
           |             + greatest(0, i - ($m - (length(nm) + dl) % $m)) + sh,
           |          'len', ((length(nm) + dl) div $m)
           |             + if(i >= $m - (length(nm) + dl) % $m, 1, 0))))))),
           |    x -> x.l >= $m AND x.len > 0 AND x.p >= 0
           |         AND x.p + x.len <= length(nm)),
           |  x -> named_struct('l', x.l, 'slot', x.slot,
           |                    'seg', substring(nm, x.p + 1, x.len)))""".stripMargin))))
      .select(col("nm").as("name_b"), col("key.l").as("l"),
        col("key.slot").as("slot"), col("key.seg").as("seg"))

    idx.join(prb, Seq("l", "slot", "seg"))
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= tau)
  }
}
