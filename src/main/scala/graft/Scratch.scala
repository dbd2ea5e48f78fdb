package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad — round 11d. A/B for the l20 winnowing rewrite:
  * the one-pass native kernel (graft_winnow_stats: scan + project, no
  * gram explode, no doc-keyed window exchange) vs the pre-r11 Column
  * composition (explode + WindowExec + aggregation), interleaved in one
  * session, min-of-3 after warmup, rows verified identical first. The
  * partitions-32-vs-128 spill probe this replaces lives in git history.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = Tables(spark, dir, "documents")
    def native(): DataFrame =
      operators.Dedup.winnowedFingerprints(docs, "doc_id", "text", 4, 4)
    def composed(): DataFrame =
      operators.Dedup.winnowedFingerprintsComposed(docs, "doc_id", "text", 4, 4)

    // rows identical before timing anything
    val diff = native().join(composed()
        .withColumnsRenamed(Map("n_windows" -> "cw", "n_fp" -> "cf",
          "fp_min" -> "cmin", "fp_max" -> "cmax")),
      Seq("doc_id"), "full_outer")
      .filter(!(col("n_windows") <=> col("cw")) || !(col("n_fp") <=> col("cf")) ||
        !(col("fp_min") <=> col("cmin")) || !(col("fp_max") <=> col("cmax")))
      .count()
    println(s"row-diff (must be 0): $diff")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val b1t = {
      val t0 = System.nanoTime()
      spark.sql("select 1").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(native); time(composed) // warmup both paths
    var bn = 1e9; var bc = 1e9
    for (_ <- 1 to 3) {
      bn = math.min(bn, time(native))
      bc = math.min(bc, time(composed))
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"l20 winnowing  native=$bn%.3f  composed=$bc%.3f  " +
      f"(b1=$b1t%.3f load=$load%.2f sf=$dir)")
    spark.stop()
  }
}
