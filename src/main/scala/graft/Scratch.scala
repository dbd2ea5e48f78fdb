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
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeT(name: String, reps: Int = 3)(f: => DataFrame): Double = {
      noop(f)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-52s min=${ts.min}%.3f")
      ts.min
    }

    // ---- l26 decomposition ----
    def edges = {
      val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + lit(1000000L)).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    }
    timeT("l26 edge build only") { edges }
    timeT("l26 full pageRank(3)") {
      operators.Graph.pageRank(edges, "src", "dst", iterations = 3)
    }
    timeT("l26 pageRank(1)") {
      operators.Graph.pageRank(edges, "src", "dst", iterations = 1)
    }
    spark.stop()
  }
}
