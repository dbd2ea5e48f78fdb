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
            QShared.gridSum(col("l_quantity")).cast("double").as("sum_qty"))
          
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
        // r12 (verdict #3): EXCEPT keys on custkey — the key the shared
        // custkey layouts serve. Spark rewrites EXCEPT to a NULL-SAFE
        // anti join (keys coalesce(k,0)+isnull(k)), whose partitioning
        // can never match HashPartitioning(k) — so the layout can't
        // carry the join itself. What it CAN carry is dedup-before-
        // shuffle: each side distincts exchange-free on its layout, and
        // the null-safe join then exchanges only the DISTINCT key sets
        // (orders: 1.5M rows → ≤|customers| keys at sf1). EXCEPT
        // semantics are unchanged — set-distinct first is exactly what
        // EXCEPT does anyway, and Catalyst elides the redundant final
        // distinct. PlanSpec locks the two layout-riding dedups.
        val positive = QShared.bucketedFact(s, dir, "customer", "c_custkey")
          .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
          .distinct()
        val buyers = QShared.ordersByCustkey(s, dir)
          .select(col("o_custkey").as("k")).distinct()
        positive.except(buyers)
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT o_custkey AS k FROM orders""".stripMargin)),

    // T3: DISTINCT projection.
    QDef("t3_distinct",
      (s, dir) =>
        // r10: (user_id, event_type) is a superset of the user_id
        // events layout key — the distinct rides HashPartitioning
        // (user_id), no exchange. A/B at sf0.1: 0.070 → 0.058 s.
        QShared.bucketedFact(s, dir, "events", "user_id")
          .select(col("user_id"), col("event_type")).distinct()
          ,
      Some("""SELECT DISTINCT user_id, event_type FROM events""".stripMargin)),

    // T3b: keyed dedup with deterministic survivor (min event_id) —
    // the oracle-checkable contract for dropDuplicates(keys).
    QDef("t3b_dedup_keep_first",
      (s, dir) =>
        QShared.bucketedFact(s, dir, "events", "user_id") // see t3
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
        |GROUP BY 1""".stripMargin)),

    // T5: MERGE-style upsert (SCD1 apply) — a deterministic change
    // batch (updates for custkey%7=0, deletes for custkey%13=0 taking
    // priority, inserts at custkey+1000000 for custkey%97=0) applied to
    // the customer snapshot via one full-outer keyed join: matched
    // deletes drop, matched updates take the source value, unmatched
    // target rows persist, unmatched source rows insert. Spark has no
    // MERGE INTO outside table formats; this is the engine-level
    // composition it lowers to, and the scale shape is a single
    // co-partitioned exchange on the key (a broadcast can't help:
    // full-outer keeps both unmatched sides).
    QDef("t5_merge_upsert",
      (s, dir) => {
        val target = Tables(s, dir, "customer")
          .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
        val source = Tables(s, dir, "customer")
          .filter(col("c_custkey") % 13 === 0 || col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("s_key"),
            when(col("c_custkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
            (col("c_acctbal") + 100.0).as("s_bal"))
          .unionByName(
            Tables(s, dir, "customer").filter(col("c_custkey") % 97 === 0)
              .select((col("c_custkey") + 1000000L).as("s_key"),
                lit("I").as("op"), lit(0.0).as("s_bal")))
        target.join(source, col("key") === col("s_key"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(
            coalesce(col("key"), col("s_key")).as("custkey"),
            when(col("op").isNotNull, col("s_bal")).otherwise(col("bal")).as("acctbal"),
            coalesce(col("op"), lit("K")).as("action"))
      },
      Some("""WITH target AS (
        |  SELECT c_custkey AS key, c_acctbal AS bal FROM customer),
        |source AS (
        |  SELECT c_custkey AS s_key,
        |    CASE WHEN c_custkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
        |    c_acctbal + 100.0 AS s_bal
        |  FROM customer WHERE c_custkey % 13 = 0 OR c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS s_key, 'I' AS op, 0.0 AS s_bal
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT COALESCE(key, s_key) AS custkey,
        |  CASE WHEN op IS NOT NULL THEN s_bal ELSE bal END AS acctbal,
        |  COALESCE(op, 'K') AS action
        |FROM target FULL OUTER JOIN source ON key = s_key
        |WHERE op IS NULL OR op != 'D'""".stripMargin))
  )
}
