package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad for the current optimization target. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p39 = SparkEntry.queries("l39b_semdedup_ann")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println("----- l39b plan (no auto-broadcast) -----")
    println(p39)
    // and the w3b decomposed-above-gate plan via the sysprop
    System.setProperty("graft.rangeframe.decomposeOverBytes", "0")
    val pw3b = SparkEntry.queries("w3b_range_frame")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    System.clearProperty("graft.rangeframe.decomposeOverBytes")
    println("----- w3b plan above gate -----")
    println(pw3b)
    spark.stop()
  }
}
