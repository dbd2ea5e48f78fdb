package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.QShared

/** Timing scratchpad — round 11, sf10 probe set. The three-decade
  * pairing (sf0.1 → sf1 → sf10) left exactly two monotone ratio
  * growers, g1 and g14; every other residual flattened or shrank.
  * Interleaved A/B within ONE JVM per the bench methodology. The
  * r11 residual-set probes (g1/a6/a11/x6b rides) live in git history.
  *
  * Probes (run with SPARK_GRAFT_SF_DIR=/tmp/graft_sf10):
  *   - g1 decomposition: count-only vs +gridSum vs +countDistinct, on
  *     the layout vs a plain scan — which term grows 5.2x per decade?
  *   - g14 variants: splitSum for the per-row decimal cast, a lazy
  *     checkpoint of the tiny day series vs the twice-scanned 15M-row
  *     layout collapse (the sf0.1 measurement said twice-scan wins;
  *     does that hold one decade up?), and both combined.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tenMinNs = 600000000000L

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // ---- g1 decomposition ------------------------------------------------
    def layoutEv = QShared.eventsByTimeBucket(spark, dir, tenMinNs)
    def plainEv = Tables(spark, dir, "events")
      .withColumn("bucket", expr(s"ts div $tenMinNs"))

    val g1shapes: Seq[(String, () => DataFrame)] = Seq(
      ("g1_cnt_only", () => layoutEv.groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))),
      ("g1_cnt_grid", () => layoutEv.groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          QShared.gridSum(col("value")).cast("double").as("sum_value"))),
      ("g1_shipped", () => SparkEntry.queries("g1_tumbling_window")(spark, dir)),
      ("g1_plain_full", () => plainEv.groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          QShared.gridSum(col("value")).cast("double").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))),
      ("g1_plain_nocd", () => plainEv.groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          QShared.gridSum(col("value")).cast("double").as("sum_value"))))

    // ---- g14 variants ----------------------------------------------------
    def g14series(splitsum: Boolean): DataFrame = {
      val base = QShared.bucketedFact(spark, dir, "orders", "o_orderdate")
        .groupBy(col("o_orderdate"))
      val agg =
        if (splitsum) base.agg(QShared.splitSum(
          round(col("o_totalprice") * 100).cast("long"), Seq(26))
          .cast("long").as("cents"))
        else base.agg(sum(round(col("o_totalprice") * 100).cast("long")
          .cast(DecimalType(38, 0))).cast("long").as("cents"))
      agg.select(
        datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")).as("di"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("cents"))
    }
    def g14fan(series: DataFrame): DataFrame = {
      val off = spark.range(0, 15).toDF("o")
      val w = expr("shiftleft(1L, cast(14 - o AS int))")
      series.select(col("di").as("tdi"), col("day"), col("cents").as("tcents"))
        .crossJoin(broadcast(off))
        .join(broadcast(series.select(col("di").as("sdi"), col("cents").as("scents"))),
          col("tdi") - col("o") === col("sdi"))
        .groupBy(col("day"), col("tcents"))
        .agg(sum(col("scents") * w).as("num"), sum(w).as("den"))
        .select(col("day"), col("tcents").as("cents"),
          expr("(num * 1000) div den").as("ewma_milli"))
    }
    val g14shapes: Seq[(String, () => DataFrame)] = Seq(
      ("g14_shipped", () => SparkEntry.queries("g14_ewma_smoothing")(spark, dir)),
      ("g14_splitsum", () => g14fan(g14series(splitsum = true))),
      ("g14_ckpt", () => g14fan(g14series(splitsum = false).localCheckpoint(false))),
      ("g14_both", () => g14fan(g14series(splitsum = true).localCheckpoint(false))))

    val shapes = g1shapes ++ g14shapes

    // correctness: every variant of a query must match its shipped rows
    def rows(f: () => DataFrame) =
      f().collect().map(_.toString).sorted.toSeq
    val g1ref = rows(() => SparkEntry.queries("g1_tumbling_window")(spark, dir))
    println(s"g1_plain_full equal=${rows(g1shapes(3)._2) == g1ref}")
    val g14ref = rows(() => SparkEntry.queries("g14_ewma_smoothing")(spark, dir))
    for ((n, f) <- g14shapes.drop(1))
      println(s"$n equal=${rows(f) == g14ref}")

    for ((_, f) <- shapes) time(f()) // warmup
    val bests = scala.collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (_ <- 1 to 5; (n, f) <- shapes)
      bests(n) = math.min(bests(n), time(f()))
    for ((n, _) <- shapes) println(f"$n%-16s ${bests(n)}%.3f s")
    spark.stop()
  }
}
