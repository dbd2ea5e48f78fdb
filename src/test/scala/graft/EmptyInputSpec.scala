package graft

import org.apache.spark.sql.functions._

/** Empty-input sweep: every declared query must run (not crash) against
  * schema-identical EMPTY tables. At 100 TB empty inputs are routine —
  * an empty partition after a selective filter, a day with no events, a
  * cold-start history — and an operator that throws on zero rows is a
  * pipeline outage, not an edge case. Row counts are whatever the
  * semantics dictate (global aggregates legitimately emit one row);
  * only completing without an exception is asserted. */
class EmptyInputSpec extends SparkSpec {

  test("all queries run on schema-identical empty tables") {
    val dir = tmpDir("empty_tables")
    for (t <- Tables.names) {
      val schema = Tables(spark, "/root/testdata/sf0.001", t).schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.all.flatMap { q =>
      try {
        q.spark(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
