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

    // a10: exact percentile via percentile(value, q, frequency) over
    // pre-aggregated value counts — the per-partition OpenHashMap of
    // boxed doubles becomes a codegen'd hash aggregate
    time("a10 current") { SparkEntry.queries("a10_percentile_exact")(spark, sfDir) }
    time("a10 freq-precount") {
      val qc = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val pc = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("c"))
      val a = qc.groupBy(col("l_returnflag")).agg(
        round(expr("percentile(l_quantity, 0.5D, c)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.9D, c)"), 6).as("p90"))
      val b = pc.groupBy(col("l_returnflag")).agg(
        round(expr("percentile(l_extendedprice, 0.25D, c)"), 6).as("price_p25"))
      a.join(b, "l_returnflag")
    }

    // w3b decomposed: the value-ordered RANGE frame [c-W, c] as
    // bucket-decomposed prefix sums — window parallelism becomes
    // 3 × n_buckets instead of 3. ans(c) = pre(<=c) - pre(<=c-W-1);
    // pre(x) = cum of full earlier buckets + in-bucket prefix at x.
    time("w3b current") { SparkEntry.queries("w3b_range_frame")(spark, sfDir) }
    val w3bDecomposed = {
      import org.apache.spark.sql.expressions.Window
      val W = 100000L
      val base = Tables(spark, sfDir, "orders").select(
        col("o_orderstatus").as("st"), col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val data = base.select(col("st"), lit(null).cast("long").as("okey"),
        col("cents").as("v"), lit(1L).as("c"), col("cents").as("s"),
        lit(0).as("probe"), lit(null).cast("long").as("cents"))
      val probeHi = base.select(col("st"), col("okey"),
        col("cents").as("v"), lit(0L).as("c"), lit(0L).as("s"),
        lit(1).as("probe"), col("cents"))
      val probeLo = base.select(col("st"), col("okey"),
        (col("cents") - W - 1L).as("v"), lit(0L).as("c"), lit(0L).as("s"),
        lit(2).as("probe"), col("cents"))
      val all = data.unionByName(probeHi).unionByName(probeLo)
        .withColumn("b", floor(col("v") / W))
      // in-bucket running totals; data rows sort before probes at equal v
      // (probe at v means <=v, so probes must come AFTER data ties)
      val wIn = Window.partitionBy(col("st"), col("b"))
        .orderBy(col("v").asc, col("probe").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inb = all.select(col("st"), col("b"), col("okey"), col("probe"),
        col("cents"), sum(col("c")).over(wIn).as("pc"), sum(col("s")).over(wIn).as("ps"))
      // cumulative totals of FULL earlier buckets per status, DENSE over
      // the bucket range (an empty intermediate bucket must still carry
      // the cum of everything before it for probes landing inside it)
      val bucketTot = all.filter(col("probe") === 0)
        .groupBy(col("st").as("bst"), col("b").as("bb"))
        .agg(sum(col("c")).as("bc"), sum(col("s")).as("bs"))
      val dense = bucketTot.groupBy(col("bst").as("dst"))
        .agg(min(col("bb")).as("b0"), max(col("bb")).as("b1"))
        .select(col("dst"), explode(sequence(col("b0"), col("b1"))).as("db"))
      val wB = Window.partitionBy(col("dst")).orderBy(col("db").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val bucketCum = dense
        .join(bucketTot, col("dst") === col("bst") && col("db") === col("bb"), "left")
        .select(col("dst").as("bst"), col("db").as("bb"),
          coalesce(sum(col("bc")).over(wB), lit(0L)).as("cumc"),
          coalesce(sum(col("bs")).over(wB), lit(0L)).as("cums"))
      val pre = inb.filter(col("probe") > 0)
        .join(bucketCum, col("st") === col("bst") && col("b") === col("bb"), "left")
        .select(col("st"), col("okey"), col("probe"), col("cents"),
          (col("pc") + coalesce(col("cumc"), lit(0L))).as("pcnt"),
          (col("ps") + coalesce(col("cums"), lit(0L))).as("psum"))
      val hi = pre.filter(col("probe") === 1)
        .select(col("st"), col("okey"), col("cents"),
          col("pcnt").as("hic"), col("psum").as("his"))
      val lo = pre.filter(col("probe") === 2)
        .select(col("okey").as("lokey"), col("pcnt").as("loc"), col("psum").as("los"))
      hi.join(lo, col("okey") === col("lokey"))
        .select(col("st").as("o_orderstatus"), col("okey").as("o_orderkey"),
          col("cents"), (col("hic") - col("loc")).as("n_within_1000"),
          (col("his") - col("los")).as("cents_within_1000"))
    }
    time("w3b decomposed") { w3bDecomposed }
    // cross-check against the window answer
    val ref = SparkEntry.queries("w3b_range_frame")(spark, sfDir)
    val diff = ref.as("a").join(w3bDecomposed.as("b"), Seq("o_orderkey"))
      .filter(col("a.n_within_1000") =!= col("b.n_within_1000") ||
        col("a.cents_within_1000") =!= col("b.cents_within_1000")).count()
    println(s"[scratch] w3b decomposed mismatches=$diff")

    // join strategy: shuffled-hash vs sort-merge on the fact-fact joins
    for (pref <- Seq("true", "false")) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
      for (q <- Seq("a22_q12_priority_counts", "j2_shuffle_join",
          "j12_q5_shape", "j16_q21_shape", "a1b_q3_shape"))
        time(s"preferSMJ=$pref $q") { SparkEntry.queries(q)(spark, sfDir) }
    }
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.stop()
  }
}
