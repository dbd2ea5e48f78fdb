package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad — round 12. A/B harness for the two r11-verdict
  * perf items:
  *
  * 1. The countDistinct marginal class (a2/a11/a18, flat 9–11× across
  *    three decades on a11): the verdict's named lever is sort-based
  *    distinct over the sorted bucketed layouts. Probes on a11's most
  *    expensive branch (l_orderkey, the high-cardinality column):
  *      - `a11Raw`     current shape — raw scan + hash countDistinct
  *      - `a11Layout`  orderkey-bucketed layout + hash countDistinct
  *                     (partial distinct rides HashPartitioning)
  *      - `a11SortAgg` layout + spark.sql.execution.replaceHashWithSortAgg
  *                     (groupBy(key) plans SortAggregate over the
  *                     layout's in-bucket order — linear, no hash table)
  *      - `a11MapPart` layout + per-bucket linear fold (buckets are
  *                     key-disjoint and sorted, so per-partition
  *                     (n, notnull, distinct, min, max) sums globally)
  *
  * 2. The selective-join certification tail (t2b/j4b/j18): all three
  *    key on custkey — the same key the shared ordersByCustkey layout
  *    already serves; a customer custkey layout makes both sides
  *    exchange-free merge joins. Old vs layout shapes, rows verified
  *    identical before timing.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def li: DataFrame = Tables(spark, dir, "lineitem")
    def liBkt: DataFrame = queries.QShared.bucketedFact(spark, dir, "lineitem", "l_orderkey")

    // ---- 1. a11 l_orderkey branch variants (5 profile outputs each) ----
    def profile(src: DataFrame): DataFrame =
      src.agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_notnull"),
        countDistinct(col("l_orderkey")).as("n_distinct"),
        min(col("l_orderkey")).cast("string").as("min_str"),
        max(col("l_orderkey")).cast("string").as("max_str"))

    def a11Raw(): DataFrame = profile(li)
    def a11Layout(): DataFrame = profile(liBkt)

    def a11SortAgg(): DataFrame = {
      val prev = spark.conf.getOption("spark.sql.execution.replaceHashWithSortAgg")
      spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
      try {
        val grouped = liBkt.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        grouped.agg(
          sum(col("c")).cast("long").as("n_rows"),
          sum(when(col("l_orderkey").isNotNull, col("c")).otherwise(0L))
            .cast("long").as("n_notnull"),
          count(when(col("l_orderkey").isNotNull, 1)).as("n_distinct"),
          min(col("l_orderkey")).cast("string").as("min_str"),
          max(col("l_orderkey")).cast("string").as("max_str"))
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", v)
        case None => spark.conf.unset("spark.sql.execution.replaceHashWithSortAgg")
      }
    }

    def a11MapPart(): DataFrame = {
      // buckets are key-disjoint (hash-bucketed) and key-sorted, and a
      // bucketed scan never splits a bucket file, so per-partition
      // profile stats sum/min/max to the global profile
      val parts = liBkt.select(col("l_orderkey")).as[Long].mapPartitions { it =>
        var n = 0L; var nd = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var prev = Long.MinValue; var first = true
        while (it.hasNext) {
          val k = it.next()
          n += 1
          if (first || k != prev) { nd += 1; first = false }
          prev = k
          if (k < mn) mn = k
          if (k > mx) mx = k
        }
        Iterator.single((n, nd, mn, mx))
      }.toDF("n", "nd", "mn", "mx")
      parts.agg(
        sum(col("n")).cast("long").as("n_rows"),
        sum(col("n")).cast("long").as("n_notnull"), // key is non-null
        sum(col("nd")).cast("long").as("n_distinct"),
        min(col("mn")).cast("string").as("min_str"),
        max(col("mx")).cast("string").as("max_str"))
    }

    // ---- 2. t2b / j4b / j18 layout variants ----
    def custBkt: DataFrame = queries.QShared.bucketedFact(spark, dir, "customer", "c_custkey")
    def ordersCust: DataFrame = queries.QShared.ordersByCustkey(spark, dir)

    def t2bOld(): DataFrame =
      Tables(spark, dir, "customer").filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("k"))
        .except(Tables(spark, dir, "orders").select(col("o_custkey").as("k")))
    def t2bNew(): DataFrame =
      custBkt.filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
        .distinct()
        .except(ordersCust.select(col("o_custkey").as("k")).distinct())

    def j4bOld(): DataFrame =
      Tables(spark, dir, "customer")
        .join(Tables(spark, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    def j4bNew(): DataFrame =
      custBkt.join(ordersCust, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))

    def j18Old(): DataFrame = {
      val perCust = Tables(spark, dir, "customer")
        .join(Tables(spark, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }
    def j18New(): DataFrame = {
      val perCust = custBkt
        .join(ordersCust.filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }

    def rowDiff(a: DataFrame, b: DataFrame): Long = {
      val ac = a.columns.toSeq
      a.exceptAll(b.select(ac.map(col): _*)).count() +
        b.select(ac.map(col): _*).exceptAll(a).count()
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val b1t = {
      val t0 = System.nanoTime()
      spark.sql("select 1").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // row identity before timing (also pays the layout builds untimed)
    println("a11 layout row-diff: " + rowDiff(a11Raw(), a11Layout()))
    println("a11 sortagg row-diff: " + rowDiff(a11Raw(), a11SortAgg()))
    println("a11 mappart row-diff: " + rowDiff(a11Raw(), a11MapPart()))
    println("t2b row-diff: " + rowDiff(t2bOld(), t2bNew()))
    println("j4b row-diff: " + rowDiff(j4bOld(), j4bNew()))
    println("j18 row-diff: " + rowDiff(j18Old(), j18New()))
    println("sortagg plan has SortAggregate: " +
      a11SortAgg().queryExecution.executedPlan.toString.contains("SortAggregate"))

    val probes: Seq[(String, () => DataFrame)] = Seq(
      "a11raw" -> (() => a11Raw()),
      "a11layout" -> (() => a11Layout()),
      "a11sortagg" -> (() => a11SortAgg()),
      "a11mappart" -> (() => a11MapPart()),
      "t2bold" -> (() => t2bOld()),
      "t2bnew" -> (() => t2bNew()),
      "j4bold" -> (() => j4bOld()),
      "j4bnew" -> (() => j4bNew()),
      "j18old" -> (() => j18Old()),
      "j18new" -> (() => j18New()))
    probes.foreach { case (_, f) => time(f) } // warmup, interleaved
    val best = scala.collection.mutable.Map[String, Double]()
    for (_ <- 1 to 3; (tag, f) <- probes) {
      val t = time(f)
      if (!best.get(tag).exists(_ <= t)) best(tag) = t
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    probes.foreach { case (tag, _) =>
      println(f"$tag%-10s ${best(tag)}%.3f s  (b1=$b1t%.3f load=$load%.2f sf=$dir)")
    }
    spark.stop()
  }
}
