package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Set operations + dedup + null-safe comparison (SURVEY §2B T1–T3, P3). */
object SetOps extends QGroup {

  private val dec = QShared.dec

  def defs: Seq[QDef] = Seq(

    // T1: split / UNION ALL reunite — aggregate must hash-match the
    // original table's.
    QDef("t1_union_all",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        val a = l.filter(col("l_returnflag") === "A")
        val rest = l.filter(col("l_returnflag") =!= "A")
        a.unionAll(rest)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            // final double cast: decimal cells render with scale-6 under
            // the driver's hasher and mismatch the oracle's float64
            sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
          
      },
      Some("""SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM (SELECT * FROM lineitem WHERE l_returnflag = 'A'
        |      UNION ALL
        |      SELECT * FROM lineitem WHERE l_returnflag <> 'A') u
        |GROUP BY l_returnflag""".stripMargin)),

    // T1b: UNION with distinct semantics.
    QDef("t1b_union_distinct",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val highPrice = o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))
        highPrice.union(urgent).distinct()
          
      },
      Some("""SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin)),

    // T2: INTERSECT (distinct) — buyers who are also positive-balance customers.
    QDef("t2_intersect",
      (s, dir) => {
        val buyers = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
        val positive = Tables(s, dir, "customer")
          .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
        buyers.intersect(positive)
      },
      Some("""SELECT o_custkey AS k FROM orders
        |INTERSECT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0""".stripMargin)),

    // T2b: EXCEPT (distinct) — positive-balance customers who never ordered.
    QDef("t2b_except",
      (s, dir) => {
        val positive = Tables(s, dir, "customer")
          .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
        val buyers = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
        positive.except(buyers)
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT o_custkey AS k FROM orders""".stripMargin)),

    // T3: DISTINCT projection.
    QDef("t3_distinct",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_type")).distinct()
          ,
      Some("""SELECT DISTINCT user_id, event_type FROM events""".stripMargin)),

    // T3b: keyed dedup with deterministic survivor (min event_id) —
    // the oracle-checkable contract for dropDuplicates(keys).
    QDef("t3b_dedup_keep_first",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("event_id")).as("keep_event_id"), count(lit(1)).as("n_dups"))
          ,
      Some("""SELECT user_id, event_type, MIN(event_id) AS keep_event_id,
        |  COUNT(*) AS n_dups
        |FROM events GROUP BY user_id, event_type""".stripMargin)),

    // T4: snapshot reconciliation — classify every key of two table
    // versions as added / deleted / changed with the changed column
    // names (operators.Reconcile). The two "snapshots" are derived
    // deterministically from orders: the old side drops keys ≡3 mod 11,
    // the new side drops keys ≡5 mod 13 and bumps totalprice on keys
    // ≡2 mod 17 — so all three classes are exercised. One full-outer
    // shuffle join; bucketed snapshots reconcile exchange-free.
    QDef("t4_snapshot_diff",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val oldSnap = orders.filter(col("o_orderkey") % 11 =!= 3)
        val newSnap = orders.filter(col("o_orderkey") % 13 =!= 5)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 17 === 2, col("o_totalprice") + 100.0)
              .otherwise(col("o_totalprice")))
        graft.operators.Reconcile.snapshotDiff(oldSnap, newSnap,
          keys = Seq("o_orderkey"), compare = Seq("o_orderstatus", "o_totalprice"))
      },
      Some("""WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 11 != 3),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 17 = 2 THEN o_totalprice + 100.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 13 != 5)
        |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'deleted'
        |       ELSE 'changed' END AS change,
        |  CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
        |       THEN concat_ws(',',
        |         CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |              THEN 'o_orderstatus' END,
        |         CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |              THEN 'o_totalprice' END) END AS changed_cols
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice""".stripMargin)),

    // P3: null-safe equality (<=> / IS NOT DISTINCT FROM).
    QDef("p3_null_safe_eq",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select(nullif(col("l_returnflag"), lit("N")).as("f"),
            nullif(col("l_linestatus"), lit("O")).as("st"))
          .withColumn("same", col("f") <=> col("st"))
          .groupBy(col("same"))
          .agg(count(lit(1)).as("cnt"))
          ,
      Some("""SELECT (f IS NOT DISTINCT FROM st) AS same, COUNT(*) AS cnt
        |FROM (SELECT NULLIF(l_returnflag, 'N') AS f, NULLIF(l_linestatus, 'O') AS st
        |      FROM lineitem) t
        |GROUP BY 1""".stripMargin))
  )
}
