package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a hot-keyed table") {
    // 90% of rows share one key — the shape that melts a single reducer
    val hot = (1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = hot.toDF("k", "v")
      .withColumn("vd", $"v".cast(DecimalType(38, 6)))

    val salted = Skew.saltedSum(df, "k", $"v", Seq("total" -> $"vd"), saltBuckets = 16)
      .orderBy($"k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n_rows"),
        r.getAs[java.math.BigDecimal]("total")))

    val direct = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"vd").as("t"))
      .orderBy($"k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("t")))

    assert(salted.toSeq == direct.toSeq)
  }

  test("salting actually spreads the hot key over buckets") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val buckets = df
      .withColumn("__salt", pmod(xxhash64($"v"), lit(16)))
      .select($"__salt").distinct().count()
    assert(buckets >= 12, s"expected ~16 salt buckets, got $buckets")
  }
}
