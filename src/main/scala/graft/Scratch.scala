package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad for the current optimization target: decompose the
  * floor-dominated tail into PLANNING (QDef construction + analysis +
  * optimization + physical planning) vs EXECUTION, and A/B the planning
  * cost with constraint propagation off.
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
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = Seq(
      "j12_q5_shape", "a1b_q3_shape", "a2_distinct_agg", "j29_q2_min_supplier",
      "j28_q4_priority_check", "a11_column_profile", "a18_constraint_check",
      "x5_cast_matrix", "x6b_variant", "l1c_jaccard_pairs", "l8_pii_scrub",
      "a26_equidepth_histogram", "a10_percentile_exact", "j26_q11_important_parts",
      "j19_q16_shape", "l13_incremental_dedup", "l30_triangle_count")

    // INTERLEAVED A/B: per query, warm BOTH settings, then alternate
    // off/on per rep — JIT state and machine drift hit both settings
    // equally, unlike sequential passes whose second leg always rides a
    // warmer JVM (the first two probe runs disagreed by exactly that).
    val key = "spark.sql.constraintPropagation.enabled"
    var offSum = 0.0; var onSum = 0.0
    for (n <- names) {
      val q = SparkEntry.queries(n)
      def run(setting: Boolean): Double = {
        spark.conf.set(key, setting.toString)
        val t0 = System.nanoTime(); noop(q(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      run(false); run(true) // warm both plan variants
      val offs = collection.mutable.ArrayBuffer[Double]()
      val ons = collection.mutable.ArrayBuffer[Double]()
      for (i <- 1 to 10) { if (i % 2 == 1) offs += run(false) else ons += run(true) }
      offSum += offs.min; onSum += ons.min
      println(f"[scratch] $n%-28s off=${offs.min}%.3f on=${ons.min}%.3f delta=${offs.min - ons.min}%+.3f")
    }
    println(f"[scratch] SUM off=$offSum%.3f on=$onSum%.3f")
    spark.conf.unset(key)
    spark.stop()
  }
}
