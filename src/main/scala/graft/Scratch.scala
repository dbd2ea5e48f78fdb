package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad for the current optimization target. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df)
      val t0 = System.nanoTime(); noop(df)
      val t1 = System.nanoTime(); noop(df)
      val t2 = System.nanoTime()
      println(f"[scratch] $name%-30s min=${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
    }

    time("l25_connected_components") {
      SparkEntry.queries("l25_connected_components")(spark, sfDir)
    }
    spark.stop()
  }
}
