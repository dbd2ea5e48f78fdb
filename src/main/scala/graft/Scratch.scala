package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QShared

/** Timing scratchpad — round 11: the verdict's residual set. Interleaved
  * A/B within ONE JVM per the bench methodology (sequential two-pass
  * probes measure JIT warm-up order, not code — the r9
  * constraintPropagation lesson). r10 probe sets live in git history.
  *
  * Probes:
  *   - g1 riding the time-bucketed events layout (verdict #3 — the g14
  *     "store the derivation" precedent applied to `ts div 10min`).
  *   - a6 riding the shared orderkey lineitem layout (verdict #5 — the
  *     countDistinct(l_orderkey) expand/merge exchange is the suspect).
  *   - a11 submitting its five single-column profile branches as
  *     CONCURRENT jobs (verdict #4 — the s11 codec-write precedent).
  *   - x6b extracting `$.k` ONCE as string and casting for the int view
  *     (verdict #2 — do the three try_variant_get calls re-walk the
  *     variant binary?), plus an `x6b` arg block that decomposes
  *     parse-vs-extract cost stepwise.
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

    // g1 tumbling windows over the time-bucketed events layout: the
    // stored `bucket` column IS the group key's derivation, so the
    // (bucket, event_type) agg AND the countDistinct(user_id) expand
    // phase both ride HashPartitioning(bucket) (subset clustering).
    def vG1(s: SparkSession): DataFrame =
      QShared.eventsByTimeBucket(s, dir, tenMinNs)
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          QShared.gridSum(col("value")).cast("double").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))

    // a6 global aggregate over the shared orderkey layout: the
    // countDistinct(l_orderkey) partial-dedup phase requires
    // ClusteredDistribution(l_orderkey) — satisfied by the layout's
    // HashPartitioning, so the 600k-row partial exchange disappears.
    def vA6(s: SparkSession): DataFrame =
      QShared.bucketedFact(s, dir, "lineitem", "l_orderkey").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        QShared.gridSum(col("l_quantity")).cast("double").as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

    // a11 five pruned single-column scans submitted CONCURRENTLY (the
    // s11 precedent): each branch localCheckpoints eagerly from its own
    // thread, so the five jobs overlap on local[32]; the union then
    // reads five 1-row LogicalRDDs.
    def vA11(s: SparkSession): DataFrame = {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      val li = Tables(s, dir, "lineitem")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.DurationInt
      val frames = Await.result(
        Future.sequence(cols.map { c =>
          Future {
            li.agg(
                count(lit(1)).as("n_rows"),
                count(col(c)).as("n_notnull"),
                countDistinct(col(c)).as("n_distinct"),
                min(col(c)).cast("string").as("min_str"),
                max(col(c)).cast("string").as("max_str"))
              .select(lit(c).as("col_name"), col("n_rows"), col("n_notnull"),
                col("n_distinct"), col("min_str"), col("max_str"))
              .localCheckpoint(true)
          }
        }), 10.minutes)
      frames.reduce(_.unionByName(_))
    }

    // x6b with ONE extraction: k comes out once as string, the int view
    // is a cast of that string — if the shipped three-extract form
    // re-walks the variant binary per field, this halves the walk work.
    def vX6b(s: SparkSession): DataFrame =
      Tables(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .withColumn("k_str", try_variant_get(col("v"), "$.k", "string"))
        .select(col("event_id"),
          col("k_str").cast("int").as("k_int"),
          col("k_str"),
          try_variant_get(col("v"), "$.missing", "int").as("k_missing"))

    // ...and the bounded-collect twin: each branch collects its single
    // stat row (5 rows total — the statsCache class of bounded collect)
    // and the result frame is built driver-side, skipping the block
    // manager round-trip localCheckpoint pays.
    def vA11collect(s: SparkSession): DataFrame = {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      val li = Tables(s, dir, "lineitem")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.DurationInt
      val branch = cols.head
      val schema = li.agg(
          count(lit(1)).as("n_rows"),
          count(col(branch)).as("n_notnull"),
          countDistinct(col(branch)).as("n_distinct"),
          min(col(branch)).cast("string").as("min_str"),
          max(col(branch)).cast("string").as("max_str"))
        .select(lit(branch).as("col_name"), col("n_rows"), col("n_notnull"),
          col("n_distinct"), col("min_str"), col("max_str")).schema
      val rows = Await.result(
        Future.sequence(cols.map { c =>
          Future {
            li.agg(
                count(lit(1)).as("n_rows"),
                count(col(c)).as("n_notnull"),
                countDistinct(col(c)).as("n_distinct"),
                min(col(c)).cast("string").as("min_str"),
                max(col(c)).cast("string").as("max_str"))
              .select(lit(c).as("col_name"), col("n_rows"), col("n_notnull"),
                col("n_distinct"), col("min_str"), col("max_str"))
              .collect().toSeq
          }
        }), 10.minutes).flatten
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    }

    val pairs: Seq[(String, (SparkSession, String) => DataFrame, SparkSession => DataFrame)] = Seq(
      ("g1_tumbling_window", SparkEntry.queries("g1_tumbling_window"), vG1),
      ("a6_global_agg", SparkEntry.queries("a6_global_agg"), vA6),
      ("a11_column_profile", SparkEntry.queries("a11_column_profile"), vA11),
      ("a11_collect", SparkEntry.queries("a11_column_profile"), vA11collect),
      ("x6b_variant", SparkEntry.queries("x6b_variant"), vX6b))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    if (args.headOption.contains("x6b")) {
      // stepwise decomposition: where does the 0.43 s go?
      val ev = Tables(spark, dir, "events")
      val shapes: Seq[(String, () => DataFrame)] = Seq(
        ("scan_only", () => ev.select(col("event_id"), col("props"))),
        ("parse_only", () => ev.select(col("event_id"),
          length(cast_to_string(parse_json(col("props")))).as("l"))),
        ("parse_1extract", () => ev
          .withColumn("v", parse_json(col("props")))
          .select(col("event_id"),
            try_variant_get(col("v"), "$.k", "string").as("k_str"))),
        ("parse_2extract", () => vX6b(spark)),
        ("parse_3extract", () => SparkEntry.queries("x6b_variant")(spark, dir)),
        ("json_tuple_shape", () => SparkEntry.queries("x6_json_scalars")(spark, dir)))
      for ((n, f) <- shapes) time(f())
      val bests = scala.collection.mutable.Map[String, Double]().withDefaultValue(1e9)
      for (_ <- 1 to 7; (n, f) <- shapes)
        bests(n) = math.min(bests(n), time(f()))
      for ((n, _) <- shapes) println(f"x6b $n%-18s ${bests(n)}%.3f s")
      spark.stop(); return
    }

    if (args.headOption.contains("plan")) {
      for ((name, f) <- Seq[(String, () => DataFrame)](
          ("g1_ride", () => vG1(spark)),
          ("a6_ride", () => vA6(spark)))) {
        println(s"==== $name plan ====")
        println(f().queryExecution.executedPlan.toString.take(5000))
      }
      spark.stop(); return
    }

    // correctness first: variant rows must equal shipped rows
    for ((name, base, v) <- pairs) {
      val a = base(spark, dir).collect().map(_.toString).sorted.toSeq
      val b = v(spark).collect().map(_.toString).sorted.toSeq
      println(s"$name equal=${a == b} (${a.size} rows)")
    }

    // warmup
    for ((_, base, v) <- pairs) { time(base(spark, dir)); time(v(spark)) }
    val reps = 5
    val bestA = scala.collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    val bestB = scala.collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (_ <- 1 to reps; (name, base, v) <- pairs) {
      bestA(name) = math.min(bestA(name), time(base(spark, dir)))
      bestB(name) = math.min(bestB(name), time(v(spark)))
    }
    for ((name, _, _) <- pairs)
      println(f"$name%-24s shipped=${bestA(name)}%.3f  variant=${bestB(name)}%.3f")
    spark.stop()
  }

  /** Spark has no direct variant→string cast Column helper with a null
    * fallback here; rendering via to_json is the stable public path. */
  private def cast_to_string(c: org.apache.spark.sql.Column) = to_json(c)
}
