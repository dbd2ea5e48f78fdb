package graft

import org.apache.spark.sql.functions._

import graft.queries.QShared

/** QShared.gridSum / splitSum carry the determinism contract for ~40
  * queries; this pins their defining property DIRECTLY — bit-equality
  * with the naive per-row decimal accumulation they replaced — on
  * adversarial inputs the testdata never exercises: negatives, the
  * documented magnitude bound, half-up rounding points, nulls,
  * empty/all-null groups, and full-range 64-bit longs.
  */
class GridSumPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xBEEF)

  test("gridSum == sum(cast(dec)) on random money-grid doubles incl. negatives") {
    // 2dp / 4dp / 6dp grid values across the documented |e| <= 8.9e9
    // domain, plus exact half-up boundary points like x.0000005 * 10^k
    val vals: Seq[java.lang.Double] =
      (1 to 4000).map { _ =>
        val scale = Seq(100d, 10000d, 1000000d)(rnd.nextInt(3))
        val mag = math.pow(10, rnd.nextInt(9)) // up to 1e8
        java.lang.Double.valueOf(
          math.floor((rnd.nextDouble() * 2 - 1) * mag * scale) / scale)
      } ++ Seq[java.lang.Double](0.0, -0.005, 0.000001, -0.000001,
        8.9e9, -8.9e9, 123.456789 - 123.456789, null)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % 7, Option(v).map(_.doubleValue)) }
      .toDF("g", "x")
    val got = df.groupBy($"g").agg(QShared.gridSum($"x").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val want = df.groupBy($"g").agg(sum($"x".cast(QShared.dec)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(got.keySet == want.keySet)
    for ((k, w) <- want)
      assert((got(k) == null && w == null) || got(k).compareTo(w) == 0,
        s"group $k: ${got(k)} != $w")
  }

  test("gridSum over an empty and an all-null group is NULL, like sum()") {
    val df = Seq((1, Option.empty[Double]), (1, None), (2, Some(1.25)))
      .toDF("g", "x")
    val rows = df.groupBy($"g").agg(QShared.gridSum($"x").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(rows(1) == null)
    assert(rows(2).compareTo(new java.math.BigDecimal("1.250000")) == 0)
  }

  test("splitSum == sum(cast(decimal(38,0))) on full-range 64-bit longs") {
    val vals = (1 to 4000).map(_ => rnd.nextLong()) ++
      Seq(Long.MaxValue, Long.MinValue + 1, 0L, -1L, 1L)
    val df = vals.zipWithIndex.map { case (v, i) => (i % 5, v) }.toDF("g", "x")
    val got = df.groupBy($"g")
      .agg(QShared.splitSum($"x", Seq(21, 42)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val want = df.groupBy($"g")
      .agg(sum($"x".cast("decimal(38,0)")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    for ((k, w) <- want)
      assert(got(k).compareTo(w) == 0, s"group $k: ${got(k)} != $w")
  }

  test("gridSumOver matches the decimal window sum frame-for-frame") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i % 3, i, (i * 7 % 1000) / 100.0 - 3.0))
      .toDF("g", "i", "x")
    val w = Window.partitionBy($"g").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = df.select($"g", $"i",
        QShared.gridSumOver($"x", w).as("a"),
        sum($"x".cast(QShared.dec)).over(w).as("b"))
      .collect()
    rows.foreach(r => assert(r.getDecimal(2).compareTo(r.getDecimal(3)) == 0,
      s"row $r"))
  }
}
