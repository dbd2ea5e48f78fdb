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
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeT(name: String, reps: Int = 5)(f: => DataFrame): Double = {
      noop(f)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-48s min=${ts.min}%.3f")
      ts.min
    }

    def edges(bcast: Boolean) = {
      val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord0 = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val ord = if (bcast) broadcast(ord0) else ord0
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + lit(1000000L)).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    }
    println("[scratch] edge plan (auto):")
    edges(false).queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println("[scratch]   " + l.trim.take(90)))
    timeT("l26 edges auto") { edges(false) }
    timeT("l26 edges broadcast(ord)") { edges(true) }
    timeT("l26 full auto") {
      operators.Graph.pageRank(edges(false), "src", "dst", 3)
    }
    timeT("l26 full broadcast(ord)") {
      operators.Graph.pageRank(edges(true), "src", "dst", 3)
    }
    // single-pass symmetric build: explode both directions BEFORE one
    // distinct — one join + one exchange instead of a doubled subtree
    def edges1 = {
      val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + lit(1000000L)).as("b"))
        .select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct()
    }
    timeT("l26 edges single-pass") { edges1 }
    timeT("l26 full single-pass") {
      operators.Graph.pageRank(edges1, "src", "dst", 3)
    }
    spark.stop()
  }
}
