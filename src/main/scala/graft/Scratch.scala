package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QShared

/** Timing scratchpad — currently: interleaved A/B of the TPC-H
  * fact-join block (a1b/j28/j12) against bucketed-layout variants that
  * ride the shared orderkey layouts (QShared.bucketedFact) instead of
  * exchanging/broadcasting per query. Interleaved within ONE JVM per
  * the bench methodology (sequential two-pass probes measure JIT
  * warm-up order, not code — the r9 constraintPropagation lesson).
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

    val nB = sys.env.getOrElse("SCRATCH_BUCKETS", "8").toInt

    // r10 probe set 2: a19 basket build riding the shared orderkey
    // layout (groupBy(l_orderkey) satisfied by the bucket partitioning
    // -> no explicit repartition, no exchange), and j29 riding a
    // partkey-bucketed lineitem layout (the partkey-grain aggregations
    // ride HashPartitioning(l_partkey) -> no exchange).
    def vA19(s: SparkSession): DataFrame = {
      graft.GraftFunctions.ensureRegistered(s)
      val li = QShared.bucketedFact(s, dir, "lineitem", "l_orderkey", nB)
      val baskets = li
        .groupBy(col("l_orderkey"))
        .agg(sort_array(array_distinct(collect_list(col("l_suppkey")))).as("items"))
        .select(col("l_orderkey").as("ok"), col("items"))
      val nOrders = baskets.agg(count(col("ok")).as("n"))
      val itemCnt = baskets.select(explode(col("items")).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      val top = baskets.select(explode(
          graft.GraftFunctions.sortedPairsNative(s, col("items"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
        .limit(200)
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

    def vJ29(s: SparkSession): DataFrame = {
      val eu = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      QShared.bucketedFact(s, dir, "lineitem", "l_partkey", nB)
        .groupBy(col("l_partkey"))
        .agg(collect_set(col("l_suppkey")).as("__sks"))
        .select(col("l_partkey"), explode(col("__sks")).as("l_suppkey"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(min(col("s_acctbal")).as("__mb"),
          collect_list(struct(col("s_suppkey"), col("s_name"),
            col("s_acctbal"))).as("__sups"))
        .select(col("l_partkey"),
          explode(expr("filter(__sups, x -> x.s_acctbal = __mb)")).as("__s"))
        .join(Tables(s, dir, "part")
            .filter(col("p_size") === 5)
            .select(col("p_partkey"), col("p_name")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"),
          col("__s.s_suppkey").as("s_suppkey"), col("__s.s_name").as("s_name"),
          col("__s.s_acctbal").cast("double").as("acctbal"))
    }

    def vJ16(s: SparkSession): DataFrame = {
      QShared.bucketedFact(s, dir, "lineitem", "l_orderkey", nB)
        .createOrReplaceTempView("j16b_lineitem")
      QShared.bucketedFact(s, dir, "orders", "o_orderkey", nB)
        .createOrReplaceTempView("j16b_orders")
      Tables(s, dir, "supplier").createOrReplaceTempView("j16b_supplier")
      s.sql("""SELECT s_name, COUNT(*) AS numwait
        |FROM j16b_supplier JOIN j16b_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN j16b_orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM j16b_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM j16b_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name""".stripMargin)
    }

    def vA18(s: SparkSession): DataFrame = {
      val li = QShared.bucketedFact(s, dir, "lineitem", "l_orderkey", nB)
      val rowLevel = li.agg(
        count(when(col("l_returnflag").isNull, 1)).as("v1"),
        count(when(not(col("l_quantity").between(1, 50)), 1)).as("v2"),
        count(when(not(col("l_discount").between(0, 0.10)), 1)).as("v3"),
        count(when(not(col("l_returnflag").isin("A", "N", "R")), 1)).as("v4"),
        count(when(col("l_shipdate") < lit("1992-01-01").cast("timestamp") ||
          col("l_shipdate") >= lit("1999-01-01").cast("timestamp"), 1)).as("v5"))
        .selectExpr("""stack(5,
          'complete_returnflag', v1,
          'quantity_in_1_50', v2,
          'discount_in_0_10pct', v3,
          'returnflag_domain', v4,
          'shipdate_in_epoch', v5) AS (rule, violations)""")
      val uniq = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L))
          .as("violations"))
        .select(lit("unique_order_line").as("rule"), col("violations"))
      val fk = li.join(
          QShared.bucketedFact(s, dir, "orders", "o_orderkey", nB)
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("fk_order_exists").as("rule"), col("violations"))
      rowLevel.unionByName(uniq).unionByName(fk)
    }

    // probe set 3: j26 on the partkey projection; a2 + w5 on a NEW
    // custkey-bucketed orders projection (the window-family layout)
    def vJ26(s: SparkSession): DataFrame = {
      QShared.bucketedFact(s, dir, "lineitem", "l_partkey", nB)
        .createOrReplaceTempView("j26b_lineitem")
      Tables(s, dir, "supplier").createOrReplaceTempView("j26b_supplier")
      Tables(s, dir, "nation").createOrReplaceTempView("j26b_nation")
      s.sql("""SELECT l_partkey AS p_key,
        |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e4)
        |               AS DECIMAL(38,0))) AS DOUBLE) AS value_micro
        |FROM j26b_lineitem
        |JOIN j26b_supplier ON l_suppkey = s_suppkey
        |JOIN j26b_nation   ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e4)
        |               AS DECIMAL(38,0))) * 1000 >
        |  (SELECT SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e4)
        |                  AS DECIMAL(38,0)))
        |   FROM j26b_lineitem
        |   JOIN j26b_supplier ON l_suppkey = s_suppkey
        |   JOIN j26b_nation   ON s_nationkey = n_nationkey
        |   WHERE n_name = 'NATION_3')""".stripMargin)
    }

    def vA2(s: SparkSession): DataFrame = {
      val o = QShared.bucketedFact(s, dir, "orders", "o_custkey", nB)
      val custs = o.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          (QShared.gridSum(col("o_totalprice")).cast("double") /
            count(lit(1))).as("avg_price"))
      val prices = o.groupBy(col("o_orderstatus"))
        .agg(sum_distinct(col("o_totalprice").cast(QShared.dec)).cast("double")
          .as("sum_distinct_price"))
      custs.join(prices, Seq("o_orderstatus"))
        .select(col("o_orderstatus"), col("n_cust"),
          col("sum_distinct_price"), col("avg_price"))
    }

    def vW5(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val days = QShared.bucketedFact(s, dir, "orders", "o_custkey", nB)
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("dt"))
        .distinct()
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("dt").asc_nulls_first)
      days
        .withColumn("grp", date_sub(col("dt"), row_number().over(w)))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(min(col("dt")).cast("string").as("island_start"),
          max(col("dt")).cast("string").as("island_end"),
          count(lit(1)).as("n_days"))
        .drop("grp")
    }

    // probe set 4: the custkey-window family on the custkey layout
    def custOrders(s: SparkSession) =
      QShared.bucketedFact(s, dir, "orders", "o_custkey", nB)

    def vW2(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      custOrders(s).select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"))
    }

    def vW2b(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      custOrders(s)
        .withColumn("sparse_price",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice")))
        .select(
          col("o_custkey"), col("o_orderkey"),
          last(col("sparse_price"), ignoreNulls = true).over(wRun).as("filled_price"),
          first(col("sparse_price"), ignoreNulls = true).over(wRun).as("first_seen"))
    }

    def vW3(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      custOrders(s).select(
        col("o_custkey"), col("o_orderkey"),
        QShared.gridSumOver(col("o_totalprice"), w).cast("double").as("running_spent"),
        count(lit(1)).over(w).as("running_n"))
    }

    def vW4(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      custOrders(s)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
    }

    // probe set 5: the user_id events family on a user_id-bucketed
    // events projection (ts stored as BIGINT nanos via Tables)
    def uidEvents(s: SparkSession) =
      QShared.bucketedFact(s, dir, "events", "user_id", nB)

    def vG2(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val gapNs = 1800000000000L
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("tus").asc_nulls_first, col("event_id").asc_nulls_first)
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      uidEvents(s)
        .withColumn("tus", expr("ts div 1000"))
        .withColumn("prev_ts", lag(col("tus"), 1).over(wOrd))
        .withColumn("brk",
          when(col("prev_ts").isNull || col("tus") - col("prev_ts") >= gapNs / 1000, 1)
            .otherwise(0))
        .withColumn("sess", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n"),
          min(col("tus")).as("start_us"),
          max(col("tus")).as("end_us"),
          QShared.gridSum(col("value")).cast("double").as("sum_value"))
    }

    def vG8(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus").asc_nulls_first, col("event_id").asc_nulls_first)
      uidEvents(s)
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("value"),
          expr("ts div 1000").as("tus"))
        .withColumn("valid_to_us", lead(col("tus"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"),
          col("tus").as("valid_from_us"), col("valid_to_us"),
          when(col("valid_to_us").isNull, 1).otherwise(0).as("is_current"))
    }

    def vG9(s: SparkSession): DataFrame = {
      val ev = uidEvents(s)
        .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
      def stage(of: DataFrame, evType: String): DataFrame = {
        val bound = of.withColumnRenamed("stage_ts", "prev_ts")
        ev.filter(col("event_type") === evType)
          .join(bound, "user_id")
          .filter(col("tus") > col("prev_ts"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("stage_ts"))
      }
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("tus")).as("stage_ts"))
      val s2 = stage(s1, "view")
      val s3 = stage(s2, "purchase")
      s1.agg(count(lit(1)).as("n_users")).select(lit("1_signup").as("stage"), col("n_users"))
        .unionByName(s2.agg(count(lit(1)).as("n_users"))
          .select(lit("2_view_after_signup").as("stage"), col("n_users")))
        .unionByName(s3.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase_after_view").as("stage"), col("n_users")))
    }

    def vG10(s: SparkSession): DataFrame = {
      val dayUs = 86400000000L
      val active = uidEvents(s)
        .select(col("user_id"), expr(s"(ts div 1000) div $dayUs").as("day"))
        .distinct()
      val cohort = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      active.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }

    def vG13(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val gapUs = when(col("user_id") % 5 === 0, 1800000000L)
        .otherwise(600000000L)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus").asc_nulls_first, col("event_id").asc_nulls_first)
      val run = Window.partitionBy(col("user_id"))
        .orderBy(col("tus").asc_nulls_first, col("event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      uidEvents(s)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("tus"))
        .withColumn("gap_us", gapUs)
        .withColumn("new_s",
          when(lag(col("tus"), 1).over(w).isNull, 1L)
            .when(col("tus") >=
              lag(col("tus"), 1).over(w) + lag(col("gap_us"), 1).over(w), 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("tus")).as("session_start_us"),
          max(col("tus")).as("session_end_us"),
          count(lit(1)).as("n_events"))
    }

    def vU2(s: SparkSession): DataFrame = {
      val med = udaf(graft.functions.MedianAggregator)
      uidEvents(s)
        .groupBy(col("user_id"))
        .agg(med(col("value")).as("median_value"), count(lit(1)).as("n"))
    }

    // probe set 6: custkey customer⋈orders joins (j3/j3b/j18), the
    // orderkey join-back (j13), and the remaining user_id events scans
    // (g7, t3, t3b). Shipped side = current QDef (plain scan).
    def vJ3(s: SparkSession): DataFrame =
      Tables(s, dir, "customer")
        .join(custOrders(s), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          QShared.gridSum(col("o_totalprice")).cast("double").as("total_spent"))

    def vJ3b(s: SparkSession): DataFrame = {
      val rich = Tables(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val big = custOrders(s).filter(col("o_totalprice") > 50000)
        .groupBy(col("o_custkey").as("k2"))
        .agg(count(lit(1)).as("n_big"))
      rich.join(big, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("custkey"),
          col("c_acctbal"), col("n_big"))
    }

    def vJ18(s: SparkSession): DataFrame = {
      val perCust = Tables(s, dir, "customer")
        .join(custOrders(s).filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }

    def vJ13(s: SparkSession): DataFrame = {
      val bigOrders = QShared.bucketedFact(s, dir, "lineitem", "l_orderkey", nB)
        .groupBy(col("l_orderkey"))
        .agg(QShared.gridSum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      QShared.bucketedFact(s, dir, "orders", "o_orderkey", nB)
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").cast("string").as("o_day"),
          col("sum_qty").cast("double").as("sum_qty"))
    }

    def vG7(s: SparkSession): DataFrame = {
      val dayUs = 86400000000L
      val obs = uidEvents(s)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("tus"), col("value"))
        .groupBy(col("user_id"), col("tus")).agg(max(col("value")).as("value"))
      val grid = obs.groupBy(col("user_id"))
        .agg(expr(s"min(tus) div $dayUs").as("dlo"),
          expr(s"max(tus) div $dayUs").as("dhi"))
        .select(col("user_id"), explode(sequence(col("dlo"), col("dhi"))).as("day"))
        .withColumn("tus", col("day") * dayUs)
      operators.AsOfJoin.asOf(grid, obs, key = "user_id", ts = "tus",
          rightPayload = Seq("value"), tieCols = Seq("day"))
        .select(col("user_id"), col("day"), col("r_value").as("value"))
    }

    def vT3(s: SparkSession): DataFrame =
      uidEvents(s).select(col("user_id"), col("event_type")).distinct()

    def vT3b(s: SparkSession): DataFrame =
      uidEvents(s)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("keep_event_id"), count(lit(1)).as("n_dups"))

    // probe set 7: SORTED layouts — the in-bucket sort extended past
    // the key so windows ride with no exchange AND no sort. a14 on a
    // returnflag layout sorted by (flag, extendedprice); w2 on the
    // custkey layout re-sorted by (custkey, orderdate, orderkey)
    // (shipped w2 already rides the key-sorted layout, so this A/B
    // isolates the SORT elimination alone).
    def vA14(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wf = Window.partitionBy(col("l_returnflag"))
      val wPrice = wf.orderBy(col("l_extendedprice").asc)
      val mid = (c: org.apache.spark.sql.Column) =>
        c === expr("(n + 1) div 2") || c === expr("(n + 2) div 2")
      val ranked = QShared.bucketedFact(s, dir, "lineitem", "l_returnflag",
          nB, Seq("l_extendedprice"))
        .select(col("l_returnflag"), col("l_extendedprice"),
          row_number().over(wPrice).as("rn"),
          count(lit(1)).over(wf).as("n"))
      val withMed = ranked.withColumn("med",
        avg(when(mid(col("rn")), col("l_extendedprice"))).over(wf))
      val wDev = wf.orderBy(col("dev").asc)
      withMed
        .select(col("l_returnflag"), col("med"), col("n"),
          abs(col("l_extendedprice") - col("med")).as("dev"))
        .withColumn("rn2", row_number().over(wDev))
        .filter(mid(col("rn2")))
        .groupBy(col("l_returnflag"))
        .agg(round(max(col("med")), 6).as("med"),
          round(avg(col("dev")), 6).as("mad"),
          max(col("n")).as("n"))
        .select(col("l_returnflag"), col("med"), col("mad"), col("n"))
    }

    def vW2sorted(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      QShared.bucketedFact(s, dir, "orders", "o_custkey", nB,
          Seq("o_orderdate", "o_orderkey")).select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"))
    }

    // probe set 8: w1 on the existing orderkey layout (exchange only —
    // its ORDER BY is price, not the layout sort); w1b on a NEW
    // status-sorted orders layout (exchange + sort); j22 with the rev
    // CTE lazily checkpointed (it is referenced twice: the supplier
    // join and the scalar MAX — the l11 reused-subtree precedent).
    def vW1(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc_nulls_last, col("l_linenumber").asc_nulls_first)
      QShared.bucketedFact(s, dir, "lineitem", "l_orderkey", nB)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
    }

    def vW1b(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      QShared.bucketedFact(s, dir, "orders", "o_orderstatus", nB,
          Seq("o_totalprice", "o_orderkey")).select(
        col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }

    def vJ22(s: SparkSession): DataFrame = {
      val rev = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,6)")).as("total_rev"))
        .localCheckpoint(false)
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      Tables(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(mx), col("total_rev") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    }

    // probe set 10: l11 on a doc_id-bucketed documents layout with the
    // explicit repartition dropped — the layout IS the partitioning, so
    // the token-stream exchange (the r9 floor's "one id-keyed
    // exchange") disappears; everything downstream rides as before.
    def vL11(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val docs = QShared.bucketedFact(s, dir, "documents", "doc_id", nB)
      val toks = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), explode(split(col("text"), " ")).as("tok"))
      val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val nDocs = docs.filter(col("text").isNotNull)
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .select(col("tok"),
          floor(log(col("n_docs").cast("double") / col("df")) * 1e6).as("idfm"))
      val wLen = Window.partitionBy(col("id"))
      val wRank = Window.partitionBy(col("id"))
        .orderBy(col("tfidf_micro").desc_nulls_last, col("tok").asc_nulls_first)
      tf.join(broadcast(dfreq), Seq("tok"))
        .withColumn("tfidf_micro",
          floor(col("c").cast("double") / sum(col("c")).over(wLen) * col("idfm")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 3)
        .select(col("id").as("doc_id"), col("tok"), col("rank"), col("tfidf_micro"))
    }

    // probe set 11: g14 regrouped by o_orderdate DIRECTLY on an
    // orderdate-bucketed layout (di/day derived AFTER the agg) — tests
    // whether the FLOORS.md "expression-derived key, no layout helps"
    // reasoning holds by measurement (expectation: neutral — the
    // partial agg collapses to day grain map-side, so the exchange a
    // layout would remove is already tiny).
    def vG14(s: SparkSession): DataFrame = {
      val o = QShared.bucketedFact(s, dir, "orders", "o_orderdate", nB)
      val series = o.groupBy(col("o_orderdate"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("cents"))
        .select(
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")).as("di"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          col("cents"))
      val off = s.range(0, 15).toDF("o")
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

    // ...and the j22 alternative: series is day-grain tiny (2405 rows)
    // but referenced twice (both self-join sides) — checkpoint it once
    // off the PLAIN scan; no third orders layout needed.
    def vG14ckpt(s: SparkSession): DataFrame = {
      val series = Tables(s, dir, "orders")
        .groupBy(
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")).as("di"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("cents"))
        .localCheckpoint(false)
      val off = s.range(0, 15).toDF("o")
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

    val pairs: Seq[(String, (SparkSession, String) => DataFrame, SparkSession => DataFrame)] = Seq(
      ("g14_ewma_smoothing", SparkEntry.queries("g14_ewma_smoothing"), vG14),
      ("g14_ckpt", SparkEntry.queries("g14_ewma_smoothing"), vG14ckpt))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    if (args.headOption.contains("w3b")) {
      // r9 verdict #4: re-measure the RangeFrame decomposition at sf0.1
      // on current code, including lower/higher bucket widths
      def base = Tables(spark, dir, "orders").select(
        col("o_orderstatus"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val shapes: Seq[(String, () => DataFrame)] = Seq(
        ("windowed", () => operators.RangeFrame.windowed(
          base, "o_orderstatus", "o_orderkey", "cents", 100000L)),
        ("dec_B=W", () => operators.RangeFrame.decomposed(
          base, "o_orderstatus", "o_orderkey", "cents", 100000L)),
        ("dec_B=W/4", () => operators.RangeFrame.decomposed(
          base, "o_orderstatus", "o_orderkey", "cents", 100000L, 25000L)),
        ("dec_B=4W", () => operators.RangeFrame.decomposed(
          base, "o_orderstatus", "o_orderkey", "cents", 100000L, 400000L)))
      val ref = shapes.head._2().agg(count(lit(1)), sum(col("n_in_range")),
        sum(col("sum_in_range"))).collect()(0).toString
      for ((n, f) <- shapes.tail) {
        val got = f().agg(count(lit(1)), sum(col("n_in_range")),
          sum(col("sum_in_range"))).collect()(0).toString
        println(s"$n checksum equal=${got == ref}")
      }
      for ((_, f) <- shapes) time(f())
      val bests = scala.collection.mutable.Map[String, Double]().withDefaultValue(1e9)
      for (_ <- 1 to 5; (n, f) <- shapes)
        bests(n) = math.min(bests(n), time(f()))
      for ((n, _) <- shapes) println(f"w3b $n%-10s ${bests(n)}%.3f s")
      spark.stop(); return
    }

    if (args.headOption.contains("plan")) {
      val pdir = sys.env.getOrElse("SCRATCH_PLAN_DIR", dir)
      for (name <- Seq("a1b_q3_shape", "j28_q4_priority_check", "j12_q5_shape")) {
        println(s"==== $name shipped plan (auto-broadcast ON) ====")
        println(SparkEntry.queries(name)(spark, pdir)
          .queryExecution.executedPlan.toString.take(5000))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        println(s"==== $name shipped plan (auto-broadcast OFF) ====")
        println(SparkEntry.queries(name)(spark, pdir)
          .queryExecution.executedPlan.toString.take(5000))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
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
      println(f"$name%-24s shipped=${bestA(name)}%.3f  bucketed(n=$nB%d)=${bestB(name)}%.3f")
    spark.stop()
  }
}
