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
    def time(name: String)(df: => DataFrame): Double = {
      noop(df)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-52s min=${ts.min}%.3f")
      ts.min
    }

    val li = Tables(spark, sfDir, "lineitem")
    time("a19 current") { SparkEntry.queries("a19_association_rules")(spark, sfDir) }
    val baskets = li
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("items"))
    time("a19 baskets only") { baskets }
    time("a19 baskets+pairs+top (HOF)") {
      baskets.select(explode(expr(
          "flatten(transform(items, (x, i) -> " +
            "transform(slice(items, i + 2, size(items) - i - 1), " +
            "y -> struct(x AS a, y AS b))))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
        .limit(200)
    }
    time("a19 baskets+pairs+top (native)") {
      baskets.select(explode(
          GraftFunctions.sortedPairsNative(spark, col("items"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
        .limit(200)
    }
    spark.stop()
  }
}
