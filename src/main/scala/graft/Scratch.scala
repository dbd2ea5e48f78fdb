package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad — round 13. A/B harness for the r12-verdict perf
  * items, run at sf10 grain (`SPARK_GRAFT_SF_DIR=/tmp/graft_sf10`):
  *
  * 1. a19 (verdict #8, 33 s at sf10 — the board's largest >2×
  *    absolute): stage decomposition of the basket pipeline —
  *      - `a19basket`  basket build alone (layout groupBy +
  *                     collect_list/array_distinct/sort_array)
  *      - `a19pairs`   basket build + native sorted-pairs explode
  *                     (no pair aggregation)
  *      - `a19full`    the shipped QDef shape end-to-end
  *      - `a19selfjoin` variant: NO basket arrays at all — distinct
  *                     (okey, supp) rides the layout exchange-free,
  *                     then a self-equi-join on okey with supp_a <
  *                     supp_b (zero-exchange in-bucket SMJ) fans out
  *                     the same i<j pairs row-at-a-time, then the same
  *                     pair aggregation + top-200
  * 2. j24 (verdict #2): the residual after the r13 orders-side pruning
  *    is the 60M-row lineitem SMJ stream against ~1M EU orders —
  *      - `j24smj`     shipped shape (zero-exchange layout merge)
  *      - `j24bcast`   variant: broadcast the pruned EU orders into a
  *                     PLAIN pruned lineitem scan (no layout, no sort
  *                     stream — the hash-probe posture DuckDB uses)
  * 3. j2 (verdict #4): per-stage decomposition for the FLOORS row —
  *      - `j2exchange` both fact exchanges alone (repartition on the
  *                     join keys + noop, no join executed)
  *      - `j2full`     the shipped certification shape
  *    (j2 is the DECLARED shuffle-join certification query — the
  *    decomposition adjudicates where its sf10 residual lives, it does
  *    not change the shipped shape.)
  *
  * Method: row identity asserted before timing (also pays layout
  * builds untimed), one interleaved warmup pass, min-of-3 interleaved
  * timed passes, noop-sink writes, b1 floor + load in the output.
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

    def liBkt: DataFrame =
      queries.QShared.bucketedFact(spark, dir, "lineitem", "l_orderkey")
    def oBkt: DataFrame =
      queries.QShared.bucketedFact(spark, dir, "orders", "o_orderkey")

    // ---- 1. a19 stage decomposition ----
    def baskets: DataFrame = liBkt
      .groupBy(col("l_orderkey"))
      .agg(sort_array(array_distinct(collect_list(col("l_suppkey")))).as("items"))
      .select(col("l_orderkey").as("ok"), col("items"))

    def a19basket(): DataFrame = baskets

    def a19pairs(): DataFrame = baskets.select(explode(
      graft.GraftFunctions.sortedPairsNative(spark, col("items"))).as("p"))

    def pairAgg(pairs: DataFrame): DataFrame = pairs
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
      .limit(200)

    def a19full(): DataFrame = pairAgg(a19pairs())

    def a19selfjoin(): DataFrame = {
      val d = liBkt.select(col("l_orderkey").as("ok"), col("l_suppkey"))
        .dropDuplicates("ok", "l_suppkey")
      val x = d.select(col("ok"), col("l_suppkey").as("sa"))
      val y = d.select(col("ok").as("ok2"), col("l_suppkey").as("sb"))
      x.join(y, col("ok") === col("ok2") && col("sa") < col("sb"))
        .select(struct(col("sa").as("a"), col("sb").as("b")).as("p"))
    }
    def a19selfjoinFull(): DataFrame = pairAgg(a19selfjoin())

    // ---- 2. j24 SMJ-vs-broadcast residual ----
    def ordersEu: DataFrame = oBkt
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1998-01-01")
      .join(broadcast(Tables(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation"))
          .select(col("n_nationkey").as("cn_key"),
            col("n_regionkey").as("cn_region")),
        col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables(spark, dir, "region"))
          .filter(col("r_name") === "EUROPE"),
        col("cn_region") === col("r_regionkey"))
      .select(col("o_orderkey"), col("o_orderdate"))

    def j24tail(joined: DataFrame): DataFrame = {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      joined
        .join(broadcast(Tables(spark, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(spark, dir, "nation"))
            .select(col("n_nationkey").as("sn_key"),
              col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          queries.QShared.gridSum(when(col("supp_nation") === "NATION_1", rev)
            .otherwise(lit(0.0))).as("nat_dec"),
          queries.QShared.gridSum(rev).as("all_dec"))
        .select(col("o_year"),
          col("all_dec").cast("double").as("total_revenue"),
          floor(col("nat_dec").cast("double") / col("all_dec").cast("double")
            * 1e6).cast("bigint").as("mkt_share_micro"))
    }
    def j24smj(): DataFrame = j24tail(
      liBkt.join(ordersEu, col("l_orderkey") === col("o_orderkey")))
    def j24bcast(): DataFrame = j24tail(
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(ordersEu), col("l_orderkey") === col("o_orderkey")))

    // ---- 3. j2 exchange-vs-rowwork decomposition ----
    def j2exchange(): DataFrame = {
      // both sides' keyed exchanges, no join: prices the wire/material
      // cost the certification query pays before any probe work
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .repartition(col("o_orderkey"))
      val l = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .repartition(col("l_orderkey"))
      o.select(count(lit(1)).as("c")).unionAll(l.select(count(lit(1)).as("c")))
    }
    def j2full(): DataFrame =
      Tables(spark, dir, "orders")
        .join(Tables(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          queries.QShared.gridSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_first)

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
    println("a19 selfjoin row-diff: " + rowDiff(a19full(), a19selfjoinFull()))
    println("j24 bcast row-diff: " + rowDiff(j24smj(), j24bcast()))

    val probes: Seq[(String, () => DataFrame)] = Seq(
      "a19basket" -> (() => a19basket()),
      "a19pairs" -> (() => a19pairs()),
      "a19full" -> (() => a19full()),
      "a19selfjoin" -> (() => a19selfjoinFull()),
      "j24smj" -> (() => j24smj()),
      "j24bcast" -> (() => j24bcast()),
      "j2exchange" -> (() => j2exchange()),
      "j2full" -> (() => j2full()))
    probes.foreach { case (_, f) => time(f) } // warmup, interleaved
    val best = scala.collection.mutable.Map[String, Double]()
    for (_ <- 1 to 3; (tag, f) <- probes) {
      val t = time(f)
      if (!best.get(tag).exists(_ <= t)) best(tag) = t
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    probes.foreach { case (tag, _) =>
      println(f"$tag%-11s ${best(tag)}%.3f s  (b1=$b1t%.3f load=$load%.2f sf=$dir)")
    }
    spark.stop()
  }
}
