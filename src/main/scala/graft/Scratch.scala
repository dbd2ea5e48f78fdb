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

    time("a19 current (self-join)") {
      SparkEntry.queries("a19_association_rules")(spark, sfDir)
    }
    time("a19 basket arrays + HOF pairs") {
      val baskets = Tables(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("items"))
      val pairs = baskets.select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items) - i - 1), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val top = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        .orderBy(col("n_ab").desc, col("a").asc, col("b").asc).limit(200)
      val itemCnt = baskets.select(explode(col("items")).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      val nOrders = baskets.agg(count(lit(1)).as("n"))
      top
        .join(broadcast(itemCnt.select(col("item").as("a"), col("n_item").as("n_a"))), "a")
        .join(broadcast(itemCnt.select(col("item").as("b"), col("n_item").as("n_b"))), "b")
        .crossJoin(broadcast(nOrders))
        .select(col("a"), col("b"), col("n_ab"),
          expr("1000 * n_ab div n").as("support_pm"),
          expr("1000 * n_ab div n_a").as("conf_ab_pm"),
          expr("1000 * n_ab div n_b").as("conf_ba_pm"),
          expr("1000000 * n_ab * n div (n_a * n_b)").as("lift_ppm"))
    }

    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    def joined = {
      val l = Tables(spark, sfDir, "lineitem")
      val o = Tables(spark, sfDir, "orders")
      val c = Tables(spark, sfDir, "customer")
      val n = broadcast(Tables(spark, sfDir, "nation"))
      val r = broadcast(Tables(spark, sfDir, "region"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
    }

    time("j7 decimal(38,6) sum (current)") {
      joined.agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
          .cast("double").as("revenue"))
    }
    time("j7 micro-rev decimal(38,0)") {
      joined.agg(count(lit(1)).as("n_items"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e4)
          .cast("decimal(38,0)")).cast("double") / 1e4).as("revenue"))
    }
    time("j7 micro-rev bigint sum") {
      joined.agg(count(lit(1)).as("n_items"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e4)
          .cast("bigint")).cast("double") / 1e4).as("revenue"))
    }
    time("j7 double sum (floor ref)") {
      joined.agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }
    time("j7 salted bigint -> decimal") {
      val l = Tables(spark, sfDir, "lineitem")
      val o = Tables(spark, sfDir, "orders")
      val c = Tables(spark, sfDir, "customer")
      val n = broadcast(Tables(spark, sfDir, "nation"))
      val r = broadcast(Tables(spark, sfDir, "region"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"),
          pmod(hash(col("l_orderkey")), lit(1024)).as("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e4)
            .cast("bigint")).as("pm"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("pn")).as("n_items"),
          (sum(col("pm").cast("decimal(38,0)")).cast("double") / 1e4).as("revenue"))
    }

    spark.stop()
  }
}
