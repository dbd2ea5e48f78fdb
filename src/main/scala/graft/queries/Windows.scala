package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Window-function surface (SURVEY §2B W2–W4, O1): analytic functions,
  * explicit frames (rows + range), top-k per group, multi-key sort with
  * explicit null ordering.
  *
  * Windows partition by the natural key (customer/order) — at 100 TB the
  * single shuffle per window spec is on a high-cardinality key, so no
  * driver bottleneck and no skew hot-spot (order counts per customer are
  * bounded).
  */
object Windows extends QGroup {

  private val dec = QShared.dec

  def defs: Seq[QDef] = Seq(

    // W2: lag / lead / first_value / last_value over per-customer order history.
    // r10: the whole custkey-window family (w2, w2b, w3, w4, w5) reads
    // the ONE custkey-bucketed orders projection (QShared
    // .ordersByCustkey) — Window.partitionBy(o_custkey) is satisfied by
    // the layout's HashPartitioning, so the per-query exchange
    // disappears. Interleaved A/Bs at sf0.1, identical rows: w2
    // 0.25→0.13, w2b 0.26→0.12, w3 0.24→0.12, w4 0.28→0.10, w5
    // 0.38→0.12 s. The layout is additionally SORTED BY (custkey,
    // orderdate, orderkey), so w2/w2b/w3's ORDER BY is satisfied too —
    // no exchange AND no sort (w2 0.144→0.122 in the sort-isolating
    // A/B); w4/w5 re-sort locally on their own orderings. This is the
    // materialized-projection story a 100 TB warehouse runs: one
    // clustered, sorted copy serves every per-customer analysis.
    QDef("w2_analytic_window",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        QShared.ordersByCustkey(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wFull).as("last_price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)""".stripMargin)),

    // W2b: IGNORE NULLS analytics — the gap-fill primitive (carry the
    // last known value across NULL rows). A sparse column is synthesized
    // deterministically (price visible only on every 3rd order) so the
    // ignore-nulls path actually skips rows.
    QDef("w2b_ignore_nulls",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        QShared.ordersByCustkey(s, dir) // see w2
          .withColumn("sparse_price",
            when(col("o_orderkey") % 3 === 0, col("o_totalprice")))
          .select(
            col("o_custkey"), col("o_orderkey"),
            last(col("sparse_price"), ignoreNulls = true).over(wRun).as("filled_price"),
            first(col("sparse_price"), ignoreNulls = true).over(wRun).as("first_seen"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  last_value(sparse_price IGNORE NULLS) OVER w AS filled_price,
        |  first_value(sparse_price IGNORE NULLS) OVER w AS first_seen
        |FROM (SELECT *, CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS sparse_price
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // W3: running totals with an explicit ROWS frame; decimal sums keep
    // the running value order-independent given the total window order.
    QDef("w3_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        QShared.ordersByCustkey(s, dir).select( // see w2
          col("o_custkey"), col("o_orderkey"),
          // final double cast: decimal cells render with scale-6 under the
          // driver's hasher and mismatch the oracle's float64 (VERDICT r1)
          QShared.gridSumOver(col("o_totalprice"), w).cast("double").as("running_spent"),
          count(lit(1)).over(w).as("running_n"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS running_spent,
        |  COUNT(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // W3b: RANGE frame over integer cents (value-based frame is
    // tie-insensitive, hence deterministic). Routed through the
    // size-adaptive operators.RangeFrame: below the byte gate this
    // plans as the plain 3-task window (faster at bench scale —
    // measured); above it (the 100 TB posture) the bucket-decomposed
    // prefix-sum shape ships, parallelism 3 × n_buckets. Both shapes
    // and the switch itself are pinned in RangeFrameSpec.
    QDef("w3b_range_frame",
      (s, dir) =>
        graft.operators.RangeFrame.countSum(
          Tables(s, dir, "orders").select(
            col("o_orderstatus"), col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
          partCol = "o_orderstatus", idCol = "o_orderkey",
          valCol = "cents", width = 100000L)
          .select(col("part").as("o_orderstatus"), col("id").as("o_orderkey"),
            col("value").as("cents"),
            col("n_in_range").as("n_within_1000"),
            col("sum_in_range").as("cents_within_1000")),
      Some("""SELECT o_orderstatus, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  COUNT(*) OVER w AS n_within_1000,
        |  -- DuckDB SUM(BIGINT) yields HUGEINT; Spark's is BIGINT
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_within_1000
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) ASC NULLS FIRST
        |  RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // W4: top-k per group via row_number filter.
    QDef("w4_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
        QShared.ordersByCustkey(s, dir) // see w2
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin)),

    // O1: multi-key sort with mixed directions and explicit null order
    // (nulls manufactured via NULLIF).
    QDef("o1_multikey_sort",
      (s, dir) =>
        Tables(s, dir, "customer").select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("AUTOMOBILE")).as("seg_or_null"),
          col("c_acctbal"))
          .orderBy(col("seg_or_null").asc_nulls_first,
            col("c_acctbal").desc_nulls_last,
            col("c_custkey").asc_nulls_first),
      Some("""SELECT c_custkey, NULLIF(c_mktsegment, 'AUTOMOBILE') AS seg_or_null, c_acctbal
        |FROM customer
        |ORDER BY seg_or_null ASC NULLS FIRST, c_acctbal DESC NULLS LAST,
        |  c_custkey ASC NULLS FIRST""".stripMargin)),

    // W5: gaps-and-islands — maximal runs of consecutive order days per
    // customer via the classic row_number difference: day − rn is
    // constant exactly within a consecutive run. Scale shape: ONE
    // exchange on custkey up front serves the distinct, the window, AND
    // the island aggregation (HashPartitioning(custkey) satisfies both
    // the (custkey, dt) and (custkey, grp) clusterings — without the
    // explicit repartition, distinct plans its own pair-keyed exchange
    // and the window re-exchanges by custkey).
    QDef("w5_gaps_islands",
      (s, dir) => {
        // r10: rides the custkey-bucketed orders projection (the
        // window-family layout, QShared.bucketedFact) — the distinct,
        // the island window, and the island aggregation ALL ride
        // HashPartitioning(o_custkey) (each keys on a superset of the
        // layout key), so the r9-named "one custkey exchange" floor
        // drops to ZERO exchanges. A/B at sf0.1 (interleaved,
        // identical 149 039 rows): 0.38 → 0.12 s — below the DuckDB
        // oracle. The explicit repartition the r8 shape needed is
        // subsumed by the layout.
        val days = QShared.ordersByCustkey(s, dir)
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
      },
      Some("""WITH d AS (
        |  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS dt FROM orders),
        |i AS (
        |  SELECT o_custkey, dt,
        |    dt - TO_DAYS(CAST(ROW_NUMBER() OVER (
        |      PARTITION BY o_custkey ORDER BY dt ASC NULLS FIRST) AS INTEGER)) AS grp
        |  FROM d)
        |SELECT o_custkey,
        |  CAST(MIN(dt) AS VARCHAR) AS island_start,
        |  CAST(MAX(dt) AS VARCHAR) AS island_end,
        |  COUNT(*) AS n_days
        |FROM i GROUP BY o_custkey, grp""".stripMargin)),

    // W6: ratio-to-report — each order's share of its day's total value
    // (market-share / contribution analysis; Oracle's RATIO_TO_REPORT).
    // One exchange on the day key for the unbounded window sum.
    // Determinism: price is lifted to exact integer micros through
    // DECIMAL (double→decimal is value-exact, decimal→bigint is
    // truncation in BOTH engines, where a straight double→bigint cast
    // rounds in DuckDB and truncates in Spark), so share_pm is pure
    // BIGINT arithmetic — order-independent and division-free.
    QDef("w6_ratio_to_report",
      (s, dir) => {
        val w = Window.partitionBy(col("day"))
        Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").cast("string").as("day"),
            (col("o_totalprice").cast(dec) * 1000000).cast("long")
              .as("price_micro"))
          .withColumn("share_pm",
            expr("(price_micro * 1000) div sum(price_micro) over (partition by day)"))
          .select(col("o_orderkey"), col("day"), col("price_micro"),
            col("share_pm"))
      },
      Some("""SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |  CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS price_micro,
        |  (CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 1000000 AS BIGINT) * 1000)
        |    // CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 1000000 AS BIGINT))
        |           OVER (PARTITION BY CAST(CAST(o_orderdate AS DATE) AS VARCHAR))
        |         AS BIGINT)
        |    AS share_pm
        |FROM orders""".stripMargin))
  )
}
