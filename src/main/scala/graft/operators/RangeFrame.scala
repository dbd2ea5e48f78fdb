package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-based RANGE-frame count+sum with a size-adaptive plan shape.
  *
  * The natural Spark form — `Window.partitionBy(part).orderBy(value)
  * .rangeBetween(-width, 0)` — puts ALL of a partition's rows in one
  * task. When the partition column is low-cardinality (the w3b case:
  * 3 order statuses), that caps parallelism at the cardinality no
  * matter the cluster size: three tasks do all window work at 100 TB.
  *
  * The decomposed form rewrites the frame as prefix-sum algebra:
  * ans(v) = pre(≤ v) − pre(≤ v − W − 1), with pre(x) = (cumulative
  * totals of all full earlier width-W value BUCKETS) + (in-bucket
  * running prefix at x). Window parallelism becomes
  * cardinality × n_buckets instead of cardinality, at the cost of a
  * union (3 rows per input row: data + two probes), one extra
  * aggregation over (part, bucket), and a probe self-join — which is
  * why it LOSES at small scale (measured at sf0.1: 0.98 s vs 0.64 s)
  * and wins only once rows-per-partition dwarf the fixed overhead.
  *
  * `countSum` picks the shape from the OPTIMIZER'S size estimate
  * (`optimizedPlan.stats.sizeInBytes` — file-size statistics, no job):
  * below `decomposeOverBytes` the plain window ships; above it the
  * decomposition does. Both shapes are bit-identical on the same input
  * (integer count/sum algebra only — pinned in RangeFrameSpec, which
  * also pins the switch itself by forcing each side of the gate).
  *
  * Preconditions: `idCol` is unique per row (the probe join keys on
  * it) and `valCol` is a non-null integral column (value arithmetic
  * defines the buckets). Both hold for w3b's (o_orderkey, cents).
  *
  * Output: (part, id, value, n_in_range, sum_in_range) — count and sum
  * of `value` over rows of the same partition with value in
  * [v − width, v].
  */
object RangeFrame {

  def countSum(
      df: DataFrame,
      partCol: String,
      idCol: String,
      valCol: String,
      width: Long,
      decomposeOverBytes: Long = -1L): DataFrame = {
    require(width >= 0, "width must be non-negative")
    // -1 sentinel = "caller took the default": 1 GiB, overridable via
    // the graft.rangeframe.decomposeOverBytes system property so
    // PlanSpec can drive the SHIPPED w3b QDef (which passes no
    // threshold) through the decomposed gate path without a code fork;
    // explicit callers are never affected by the property
    val threshold =
      if (decomposeOverBytes >= 0) decomposeOverBytes
      else sys.props.get("graft.rangeframe.decomposeOverBytes")
        .map(_.toLong).getOrElse(1L << 30)
    // analyzed-plan stats: the same file-size estimate the optimizer
    // sees, WITHOUT forcing an extra optimizer pass per call (measured:
    // optimizedPlan.stats added ~0.2 s/rep of planning to w3b)
    val bytes = df.queryExecution.analyzed.stats.sizeInBytes
    // width 0 = a frame of exact-value ties; the bucket decomposition's
    // floor-division is undefined there, and the window form is cheap
    // for it at any size (each frame is one value run)
    if (width == 0 || bytes <= BigInt(threshold))
      windowed(df, partCol, idCol, valCol, width)
    else decomposed(df, partCol, idCol, valCol, width)
  }

  /** The plain window shape: one task per `part` value. */
  private[graft] def windowed(
      df: DataFrame, partCol: String, idCol: String, valCol: String,
      width: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(valCol).asc_nulls_first)
      .rangeBetween(-width, 0L)
    df.select(
      col(partCol).as("part"), col(idCol).as("id"), col(valCol).as("value"),
      count(lit(1)).over(w).as("n_in_range"),
      sum(col(valCol)).over(w).as("sum_in_range"))
  }

  /** The bucket-decomposed shape: parallelism = |part| × n_buckets.
    * `bucketWidth` (default = frame width) decouples the bucket size
    * from the frame: the prefix-sum algebra pre(x) = (cum of full
    * earlier buckets) + (in-bucket prefix at x) is exact for ANY
    * bucket width; smaller buckets buy more parallelism at the cost
    * of a denser bucket-cum table. */
  private[graft] def decomposed(
      df: DataFrame, partCol: String, idCol: String, valCol: String,
      width: Long, bucketWidth: Long = 0L): DataFrame = {
    require(width > 0, "decomposed needs width > 0 (bucket = floor(v / width))")
    val W = width
    val B = if (bucketWidth > 0) bucketWidth else width
    val base = df.select(
      col(partCol).as("st"), col(idCol).as("okey"),
      col(valCol).cast("long").as("cents"))
    // three interleaved row kinds: the data itself plus two PROBES per
    // row — one at v (pre(≤v)) and one at v-W-1 (pre(≤v-W-1))
    val data = base.select(col("st"), lit(null).cast("long").as("okey"),
      col("cents").as("v"), lit(1L).as("c"), col("cents").as("s"),
      lit(0).as("probe"), lit(null).cast("long").as("cents"))
    val probeHi = base.select(col("st"), col("okey"),
      col("cents").as("v"), lit(0L).as("c"), lit(0L).as("s"),
      lit(1).as("probe"), col("cents"))
    val probeLo = base.select(col("st"), col("okey"),
      (col("cents") - W - 1L).as("v"), lit(0L).as("c"), lit(0L).as("s"),
      lit(2).as("probe"), col("cents"))
    // exact long floor-division (negative probes round toward -inf;
    // double division would lose exactness past 2^53)
    val all = data.unionByName(probeHi).unionByName(probeLo)
      .withColumn("b", expr(s"(v - pmod(v, ${B}L)) div ${B}L"))
    // in-bucket running totals; data rows sort before probes at equal v
    // (a probe at v means ≤ v, so it must come AFTER data ties)
    val wIn = Window.partitionBy(col("st"), col("b"))
      .orderBy(col("v").asc, col("probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inb = all.select(col("st"), col("b"), col("okey"), col("probe"),
      col("cents"), sum(col("c")).over(wIn).as("pc"),
      sum(col("s")).over(wIn).as("ps"))
    // cumulative totals of FULL earlier buckets per partition, DENSE
    // over the bucket range (an empty intermediate bucket must still
    // carry the cum of everything before it for probes landing in it)
    val bucketTot = all.filter(col("probe") === 0)
      .groupBy(col("st").as("bst"), col("b").as("bb"))
      .agg(sum(col("c")).as("bc"), sum(col("s")).as("bs"))
    val dense = bucketTot.groupBy(col("bst").as("dst"))
      .agg(min(col("bb")).as("b0"), max(col("bb")).as("b1"))
      .select(col("dst"), explode(sequence(col("b0"), col("b1"))).as("db"))
    val wB = Window.partitionBy(col("dst")).orderBy(col("db").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketCum = dense
      .join(bucketTot, col("dst") === col("bst") && col("db") === col("bb"), "left")
      .select(col("dst").as("bst"), col("db").as("bb"),
        coalesce(sum(col("bc")).over(wB), lit(0L)).as("cumc"),
        coalesce(sum(col("bs")).over(wB), lit(0L)).as("cums"))
    val pre = inb.filter(col("probe") > 0)
      .join(bucketCum, col("st") === col("bst") && col("b") === col("bb"), "left")
      .select(col("st"), col("okey"), col("probe"), col("cents"),
        (col("pc") + coalesce(col("cumc"), lit(0L))).as("pcnt"),
        (col("ps") + coalesce(col("cums"), lit(0L))).as("psum"))
    val hi = pre.filter(col("probe") === 1)
      .select(col("st"), col("okey"), col("cents"),
        col("pcnt").as("hic"), col("psum").as("his"))
    val lo = pre.filter(col("probe") === 2)
      .select(col("okey").as("lokey"), col("pcnt").as("loc"), col("psum").as("los"))
    hi.join(lo, col("okey") === col("lokey"))
      .select(col("st").as("part"), col("okey").as("id"),
        col("cents").as("value"),
        (col("hic") - col("loc")).as("n_in_range"),
        (col("his") - col("los")).as("sum_in_range"))
  }
}
