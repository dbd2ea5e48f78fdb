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
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Double = {
      noop(df)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-52s min=${ts.min}%.3f")
      ts.min
    }

    // ad-hoc probes go here; Floor.scala b1/b2 are the certified floor
    // probes that ride the real bench path every round
    val _ = time _

    // dump the six-table chain plans with size-based auto-broadcast OFF:
    // at sf0.001/0.1 everything fits under 10 MB and Spark would
    // broadcast the facts themselves, hiding the 100 TB shape where only
    // the explicitly-hinted dims broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (q <- Seq("j12_q5_shape", "j24_q8_market_share", "j16_q21_shape")) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"===== $q =====\n$p")
    }
    spark.stop()
  }
}
