package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad: decompose j12 (TPC-H Q5 shape) join by join to
  * name where its 0.53 s lives at sf0.1 — measured floor vs compute.
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
    def timeT(name: String)(f: => DataFrame): Double = {
      noop(f)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-34s min=${ts.min}%.3f")
      ts.min
    }

    def c = Tables(spark, sfDir, "customer")
    def o = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    def l = Tables(spark, sfDir, "lineitem")
    def su = Tables(spark, sfDir, "supplier")
    def n = broadcast(Tables(spark, sfDir, "nation"))
    def r = broadcast(Tables(spark, sfDir, "region").filter(col("r_name") === "ASIA"))

    timeT("scan c+o (union proxy)") {
      c.select(col("c_custkey").as("k")).unionByName(o.select(col("o_custkey").as("k"))) }
    val j1 = timeT("c JOIN o") { c.join(o, col("c_custkey") === col("o_custkey")) }
    val j2 = timeT("+ JOIN l") {
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey")) }
    val j3 = timeT("+ JOIN su (2-key)") {
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey")) }
    val j4 = timeT("+ n + r + agg (full j12)") {
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          queries.QShared.gridSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("double").as("revenue")) }
    println(f"[scratch] marginals: c-o=$j1%.3f, +l=${j2 - j1}%.3f, +su=${j3 - j2}%.3f, +dims+agg=${j4 - j3}%.3f")
    spark.stop()
  }
}
