package graft

import org.apache.spark.sql.functions._
import graft.sources.ParquetIO

/** Co-located join via bucketing: pre-shuffle at write time, then joins
  * and aggregations on the bucket key run with ZERO exchanges. This is
  * the strategy for 100 TB fact tables that are joined repeatedly —
  * PlanSpec's j2 shows the pay-per-query shuffle; this shows the
  * amortized one. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without any shuffle exchange") {
    ParquetIO.writeBucketed(spark.read.parquet(sf("orders")),
      "orders_b", buckets = 8, keys = Seq("o_orderkey"))
    ParquetIO.writeBucketed(
      spark.read.parquet(sf("lineitem")).withColumnRenamed("l_orderkey", "lo_key"),
      "lineitem_b", buckets = 8, keys = Seq("lo_key"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("lo_key"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
        !p.contains("Exchange hashpartitioning(lo_key"),
        s"bucketed join must not shuffle the join keys:\n$p")
      // and the result matches the plain-parquet join
      val expected = spark.read.parquet(sf("orders"))
        .join(spark.read.parquet(sf("lineitem")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderpriority")).collect()
      assert(j.orderBy(col("o_orderpriority")).collect().toSeq == expected.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("s12's returned frame executes AFTER its catalog tables are dropped") {
    // the query fn drops its bucketed external-table catalog entries
    // before returning (catalog hygiene); the returned DataFrame must
    // still execute because eager Dataset analysis pinned the
    // HadoopFsRelations at resolution time (ADVICE r6). If a future
    // Spark defers resolution, THIS test fails at action time with a
    // missing-table error — one pointed signal instead of a silent
    // driver-gate failure.
    val df = SparkEntry.queries("s12_bucketed_join")(spark, testdataRoot)
    assert(df.count() == 5) // the five o_orderpriority classes
  }

  test("aggregation on the bucket key is exchange-free") {
    ParquetIO.writeBucketed(spark.read.parquet(sf("orders")),
      "orders_b2", buckets = 8, keys = Seq("o_custkey"))
    try {
      val agg = spark.table("orders_b2").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS orders_b2")
  }
}
