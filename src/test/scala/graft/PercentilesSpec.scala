package graft

import org.apache.spark.sql.functions._

import graft.operators.Percentiles
import graft.operators.Percentiles.Spec

/** The distributed-selection percentile operator must be value-identical
  * to Spark's built-in percentile() aggregate — same order statistics,
  * same interpolation — while its exchanges stay bounded by the value
  * grid (the whole point at 100 TB). */
class PercentilesSpec extends SparkSpec {

  test("selection percentiles match the built-in percentile() aggregate") {
    val li = spark.read.parquet(sf("lineitem"))
    val got = Percentiles
      .exactPercentiles(li, "l_returnflag",
        Seq(Spec("l_quantity", 0.5, 20, "p50"),
          Spec("l_quantity", 0.9, 20, "p90"),
          Spec("l_extendedprice", 0.25, 26, "p25")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.25)").as("p25"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (a, b, c)) <- want) {
      val (x, y, z) = got(k)
      assert(x == a, s"p50($k): $x != $a")
      assert(y == b, s"p90($k): $y != $b")
      assert(z == c, s"p25($k): $z != $c")
    }
  }

  test("extreme percentiles, singleton groups, and duplicate-heavy data") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 100.5),
      ("b", 7.25)).toDF("k", "x")
    val got = Percentiles
      .exactPercentiles(df, "k",
        Seq(Spec("x", 0.0, 10, "p0"), Spec("x", 1.0, 10, "p100"),
          Spec("x", 0.5, 10, "p50")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = df.groupBy(col("k"))
      .agg(expr("percentile(x, 0.0)"), expr("percentile(x, 1.0)"),
        expr("percentile(x, 0.5)"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == want)
  }

  test("all-NULL and empty inputs degrade like the built-in") {
    import spark.implicits._
    val allNull = Seq(("a", Option.empty[Double]), ("b", Some(3.5)))
      .toDF("k", "x")
    val rows = Percentiles
      .exactPercentiles(allNull, "k", Seq(Spec("x", 0.5, 10, "p50")))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map("a" -> None, "b" -> Some(3.5)))

    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      allNull.schema)
    assert(Percentiles
      .exactPercentiles(empty, "k", Seq(Spec("x", 0.5, 10, "p50")))
      .count() == 0L)
  }
}
