package graft

import org.apache.spark.sql.{Row, functions => F}

/** All-null sweep: every query must run (not crash) against tables
  * where every column is NULL in every row. Crash-free null handling is
  * the other routine-at-scale input shape (failed upstream extractions,
  * outer-join padding, permissive-mode parse residue). Semantics on
  * null keys are whatever each operator declares — only completing
  * without an exception is asserted. */
class NullInputSpec extends SparkSpec {

  test("all queries run on all-null tables") {
    val dir = tmpDir("null_tables")
    for (t <- Tables.names) {
      val schema = org.apache.spark.sql.types.StructType(
        Tables(spark, "/root/testdata/sf0.001", t).schema
          .map(_.copy(nullable = true)))
      val rows = (1 to 3).map(_ => Row(schema.map(_ => null): _*))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
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
      s"${failures.size} queries crash on all-null input:\n${failures.mkString("\n")}")
  }
}
