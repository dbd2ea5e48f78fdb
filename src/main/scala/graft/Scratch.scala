package graft

import org.apache.spark.sql.SparkSession

/** Reproduce the bench-context slowness of the l3/l8/l4b tail: run the
  * actual SparkEntry queries in bench order with the bench session config
  * and per-query warmup+min-of-2, starting from l1g (the iterative
  * cached/checkpointed query) to see whether it contaminates successors.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def measure(name: String): Double = {
      runOnce(name)
      math.min(runOnce(name), runOnce(name))
    }

    val tail = Seq("l1g_lsh_clusters", "l9_decontamination", "l6_sequence_packing",
      "l7_dataset_split", "l7b_stratified_take", "l2_cosine_topk", "l2b_ann_lsh",
      "l2c_ann_ivf", "l3_text_stats", "l3b_lang_distribution", "l3c_token_frequency",
      "l4_binary_roundtrip", "l3d_quality_score", "l3e_bpeish_tokens",
      "l3f_language_id", "l3g_fingerprint", "l3h_repetition", "l8_pii_scrub",
      "l4b_multimodal_features", "u1_scalar_udf", "u3_flatmap_generator")
    for (n <- tail) {
      val t = measure(n)
      println(f"[scratch] $n%-28s ${t}%.3f")
    }
    println("[scratch] storage=" + spark.sparkContext.getPersistentRDDs.size +
      " rdds cached")
    spark.stop()
  }
}
