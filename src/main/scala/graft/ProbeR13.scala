package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 session probe: decompose the "faster at 8 cores than 32" gram
  * class (l9/l34/l17/l2b/l25) at sf0.1. Stages timed separately to find
  * where the 32-core overhead lives (task scheduling vs shuffle vs GC).
  */
object ProbeR13 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.ensureRegistered(spark)

    def docs = Tables(spark, dir, "documents")

    def ngramRowsV(df: DataFrame, idCol: String, textCol: String, n: Int,
        rep: Boolean): DataFrame = {
      val base = df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"), col(textCol).as("__txt"))
      val r = if (rep) base.repartition(spark.sparkContext.defaultParallelism) else base
      r.select(col("id"), explode(GraftFunctions
        .ngramHashesNative(spark, col("__txt"), n)).as("gram"))
    }

    def l9variant(rep: Boolean): DataFrame = {
      val train = docs.filter(col("doc_id") % 50 =!= 3)
      val bench = docs.filter(col("doc_id") % 50 === 3)
      val trainGrams = ngramRowsV(train, "doc_id", "text", 4, rep)
      val benchGrams = ngramRowsV(bench, "doc_id", "text", 4, rep)
        .select(col("gram")).distinct()
      trainGrams
        .join(broadcast(benchGrams.withColumn("__hit", lit(1L))),
          Seq("gram"), "left_outer")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
        .filter(col("n_hits") > 0)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_hits"),
          expr("(n_hits * 1000) div n_grams").as("cpm"))
    }

    def l34variant(rep: Boolean): DataFrame = {
      val sg0 = ngramRowsV(docs, "source", "text", 4, rep)
        .select(col("id").as("src"), col("gram"))
      val sg = (if (rep) sg0.repartition(col("gram")) else sg0)
        .dropDuplicates("src", "gram")
      val sizes = sg.groupBy(col("src")).agg(count(lit(1)).as("n_grams"))
      sg.groupBy(col("gram"))
        .agg(array_sort(collect_set(col("src"))).as("srcs"))
        .filter(size(col("srcs")) >= 2)
        .select(explode(GraftFunctions
          .sortedPairsNative(spark, col("srcs"))).as("p"))
        .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("src").as("src_a"), col("n_grams").as("n_a")), Seq("src_a"))
        .join(sizes.select(col("src").as("src_b"), col("n_grams").as("n_b")), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_common"),
          expr("(n_common * 1000) div (n_a + n_b - n_common)").as("jaccard_pm"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val probes: Seq[(String, () => DataFrame)] = Seq(
      "l9_full" -> (() => l9variant(rep = true)),
      "l9_norep" -> (() => l9variant(rep = false)),
      "l9_train_only" -> (() => ngramRowsV(
        docs.filter(col("doc_id") % 50 =!= 3), "doc_id", "text", 4, rep = true)),
      "l9_train_norep" -> (() => ngramRowsV(
        docs.filter(col("doc_id") % 50 =!= 3), "doc_id", "text", 4, rep = false)),
      "l9_bench_distinct" -> (() => ngramRowsV(
        docs.filter(col("doc_id") % 50 === 3), "doc_id", "text", 4, rep = true)
        .select(col("gram")).distinct()),
      "l34_full" -> (() => l34variant(rep = true)),
      "l34_norep" -> (() => l34variant(rep = false)))

    probes.foreach { case (_, f) => time(f) } // warmup
    val best = scala.collection.mutable.Map[String, Double]()
    for (_ <- 1 to 3; (tag, f) <- probes) {
      val t = time(f)
      if (!best.get(tag).exists(_ <= t)) best(tag) = t
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    probes.foreach { case (tag, _) =>
      println(f"$tag%-18s ${best(tag)}%.3f s  (cpus=$cpus load=$load%.2f aqe=${sys.env.getOrElse("PROBE_AQE", "true")})")
    }
    spark.stop()
  }
}
