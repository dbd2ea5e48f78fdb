package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe (not a driver gate): multiplies the sf0.1
  * documents/embeddings tables N× with id remapping, times the heavy
  * near-dup / ANN operators at 1×, 4×, 16×, and prints sec + ratio per
  * step. Near-linear ratios (≈4 per step) are the evidence that the
  * banded-LSH designs stay candidate-bounded instead of going O(n²) —
  * the property that matters at 100 TB where n grows 1000×.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"

    def amplify(df: DataFrame, idCol: String, times: Int): DataFrame =
      df.crossJoin(spark.range(times).toDF("__rep"))
        .withColumn(idCol, col(idCol) * times + col("__rep"))
        .drop("__rep")

    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    for (mult <- Seq(1, 4, 16)) {
      val d = amplify(docs, "doc_id", mult).cache(); d.count()
      val e = amplify(emb, "vec_id", mult).cache(); e.count()
      time(s"minhash_lsh_pairs x$mult") {
        operators.Dedup.minHashLshPairs(d, "doc_id", "text").count()
      }
      time(s"minhash_lsh_clusters x$mult") {
        operators.Dedup.minHashLshClusters(d, "doc_id", "text").count()
      }
      time(s"lsh_ann_topk x$mult") {
        operators.Similarity.lshTopK(
          e.filter(col("vec_id") % lit(mult.toLong * 500) < 20), e,
          k = 5, nPlanes = 12, idCol = "vec_id", vecCol = "embedding", dim = 64).count()
      }
      time(s"exact_dedup x$mult") {
        d.groupBy(sha2(col("text"), 256)).agg(min(col("doc_id"))).count()
      }
      // per-row fold vs explode+groupBy for per-document repetition
      // metrics: the fold is shuffle-free, so it should scale with the
      // scan while the explode shape shuffles every token twice
      time(s"repetition_fold x$mult") {
        d.filter(col("text").isNotNull)
          .select(operators.TextAnalysis.repetitionMetrics(col("text")).as("r"))
          .agg(sum(col("r.n_words"))).head(); d.count()
      }
      time(s"repetition_explode x$mult") {
        d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
          .agg(sum(col("n"))).head(); d.count()
      }
      // both should scale ~linearly: grams are a keyed aggregation +
      // reused-exchange join (dup fraction) and a doc-local window
      // (winnowing) — no pair materialization in either
      time(s"ngram_dup_fraction x$mult") {
        operators.Dedup.ngramDupFraction(d, "doc_id", "text", n = 4).count()
      }
      time(s"winnowing_fp x$mult") {
        operators.Dedup.winnowedFingerprints(d, "doc_id", "text").count()
      }
      // r7 operators (VERDICT r7 #5). DSIR is two scans + a 256-row
      // stat collect — should track the scan. SemDeDup's drop check is
      // per-cluster quadratic in the worst case; duplicate-amplified
      // data is actually its FRIENDLY case (the left-semi probe
      // short-circuits on the first tau-close earlier row, and dups
      // make that the first candidate), so the fixed-k curve measures
      // the semi-join's real short-circuit behavior, and the k ∝ n
      // variant is the paper's own prescription (cluster size held
      // constant as the corpus grows).
      time(s"dsir_select x$mult") {
        operators.TextAnalysis.dsirWeights(d, "doc_id", "text",
          isTarget = col("doc_id") % 7 === 0, topK = 200).count()
      }
      time(s"semdedup_fixed_k8 x$mult") {
        operators.Similarity.semDedup(e, "vec_id", "embedding",
          k = 8, tau = 0.35).count()
      }
      time(s"semdedup_k_prop_n x$mult") {
        operators.Similarity.semDedup(e, "vec_id", "embedding",
          k = 8 * mult, tau = 0.35).count()
      }
      // the FIX for k ∝ n's dense O(n·k) assignment: IVF-pruned
      // assignment (√k coarse cells, nProbe=2) — per-row O(√k)
      time(s"semdedup_ann_k_prop_n x$mult") {
        operators.Similarity.semDedupAnn(e, "vec_id", "embedding",
          k = 8 * mult, tau = 0.35).count()
      }
      d.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
