package graft

/** Scaling-curve evidence (VERDICT r6 #4): times the top-10 headline
  * plan shapes at sf0.001 / sf0.01 / sf0.1 (100× data range) and prints
  * a time-vs-SF table for BASELINE.md.
  *
  * What the numbers mean: every query pays a fixed plan+schedule floor
  * (~0.2 s, measured by b1_floor_select1), so the honest scale signal is
  * the MARGINAL time `t(sf) - floor` and especially the last step
  * (0.01 → 0.1, 10× data). A shape whose marginal time grows ≲10× per
  * 10× step is scan/shuffle-linear and extrapolates to the cluster
  * case; super-linear growth names a design bug. Run via:
  *   sbt "runMain graft.ScaleCurve"
  */
object ScaleCurve {
  private val headline = Seq(
    "a1_agg_q1", "j7_star_join", "j12_q5_shape", "l1_exact_dedup",
    "l23_ppjoin_pairs", "l25_connected_components", "l26_pagerank",
    "l34_cross_source_overlap", "a26_equidepth_histogram",
    "s12_bucketed_join", "j29_q2_min_supplier", "l17_ngram_dupfrac",
    // r7-era operators (VERDICT r7 #5): the driver-fit DSIR weights,
    // the per-cluster-quadratic SemDeDup, the chained-regex tokenizer
    // application, the fused bigram LM, and the compaction rewrite
    "l38_dsir_select", "l39_semdedup", "l35b_bpe_tokenize",
    "l36_bigram_lm_score", "s14_compaction",
    // r9: the ExactSubstr span operator (gram exchange + island window)
    "l40_exact_substring_spans",
    "b1_floor_select1")

  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("WARN")
    val sfs = Seq("0.001", "0.01", "0.1")

    def once(name: String, sf: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, s"/root/testdata/sf$sf")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = headline.filter(SparkEntry.queries.contains)
    (headline.toSet -- names.toSet).foreach(n =>
      println(s"[scale-curve] SKIPPED unknown query $n"))
    // one warmup pass over every (query, sf) first: JIT + codegen-cache
    // fill, so the curve isn't dominated by first-run compilation
    for (n <- names; sf <- sfs) once(n, sf)
    val rows = for (n <- names) yield {
      val ts = sfs.map(sf => (1 to 2).map(_ => once(n, sf)).min)
      (n, ts)
    }
    println(f"| query | sf0.001 | sf0.01 | sf0.1 | last-step × |")
    println(s"|---|---|---|---|---|")
    val floor = rows.find(_._1 == "b1_floor_select1").map(_._2.min).getOrElse(0.0)
    for ((n, ts) <- rows) {
      // marginal (floor-subtracted) ratio of the final 10× data step
      val m = ts.map(t => math.max(t - floor, 1e-3))
      println(f"| $n | ${ts(0)}%.2f s | ${ts(1)}%.2f s | ${ts(2)}%.2f s | ${m(2) / m(1)}%.1f |")
    }
    spark.stop()
  }
}
