package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the cost of the vestigial final orderBy in oracle queries
  * (the driver's compare sorts rows itself) and of decimal vs long
  * accumulation in the heavy aggregates. */
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df)
      val t0 = System.nanoTime(); noop(df)
      val t1 = System.nanoTime(); noop(df)
      val t2 = System.nanoTime()
      println(f"[scratch] $name%-34s min=${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
    }

    val li = Tables(spark, sfDir, "lineitem")
    val dec = "decimal(38,6)"

    // s1 shape: full-width scan, with and without the total sort
    time("s1_with_sort")(li.orderBy(li.columns.map(col(_).asc_nulls_first): _*))
    time("s1_no_sort")(li.toDF())

    // x4 shape: conditional scalars over lineitem
    val x4body = li.select(col("l_orderkey"), col("l_linenumber"),
      when(col("l_quantity") > 25, "big").otherwise("small").as("sz"))
    time("x4_with_sort")(x4body.orderBy(col("l_orderkey"), col("l_linenumber"), col("sz")))
    time("x4_no_sort")(x4body)

    // a1 shape: decimal vs double vs long-cents accumulation
    time("a1_decimal")(li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(dec)).as("s"),
        sum(col("l_extendedprice").cast(dec)).as("s2"))
      .select(col("l_returnflag"), col("s").cast("double"), col("s2").cast("double")))
    time("a1_double")(li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), sum(col("l_extendedprice")).as("s2")))
    time("a1_long_cents")(li.groupBy(col("l_returnflag"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("s"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("s2"))
      .select(col("l_returnflag"), (col("s") / 100.0).as("s"), (col("s2") / 100.0).as("s2")))

    // a9 shape: five decimal product sums vs long cents
    time("a9_decimal")(li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).as("sx"),
        sum(col("l_extendedprice").cast(dec)).as("sy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast(dec)).as("sxy"),
        sum((col("l_quantity") * col("l_quantity")).cast(dec)).as("sxx"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(dec)).as("syy")))

    // decimal precision variants
    val dec18 = "decimal(18,6)"
    time("a1_dec18")(li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(dec18)).as("s"),
        sum(col("l_extendedprice").cast(dec18)).as("s2"))
      .select(col("l_returnflag"), col("s").cast("double"), col("s2").cast("double")))
    time("a1_full_dec38")(li
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(dec)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order")))
    time("a1_full_dec18")(li
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec18)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec18)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec18)).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(dec18)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order")))
    time("a9_dec18")(li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec18)).as("sx"),
        sum(col("l_extendedprice").cast(dec18)).as("sy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast(dec18)).as("sxy"),
        sum((col("l_quantity") * col("l_quantity")).cast(dec18)).as("sxx"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(dec18)).as("syy")))
    spark.stop()
  }
}
