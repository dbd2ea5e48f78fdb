package graft

import org.apache.spark.sql.SparkSession

/** Timing scratchpad — currently: dump l40's physical plan for the
  * PlanSpec lock. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(SparkEntry.queries("l40_exact_substring_spans")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
