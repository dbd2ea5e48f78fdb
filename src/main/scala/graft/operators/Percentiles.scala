package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QShared

/** Exact per-key percentiles by DISTRIBUTED SELECTION, not per-group
  * sort or value buffering.
  *
  * Spark's built-in `percentile(col, p)` aggregate keeps a counts-map of
  * every distinct value per group in the aggregation buffer and sorts it
  * at eval time — for a near-unique money column that is a per-group
  * buffer proportional to the DATA (the memory caveat a10 declared
  * since round 3). This operator computes the identical interpolated
  * value with two scan passes whose exchanges are bounded by the VALUE
  * GRID, never the row count:
  *
  *   pass 1 — COARSE HISTOGRAM: values map to their exact micro-unit
  *     integers (QShared.gridMicros) and bucket at `shiftBits`; the
  *     (key, measure, bucket) count aggregate is map-side combined, so
  *     the exchange carries ≤ keys × measures × buckets rows. A
  *     running-count window (partitioned by key+measure — never a
  *     single global partition) locates, for each requested rank, the
  *     bucket that contains it and the rank's offset inside it.
  *   pass 2 — RESOLVE: a second scan keeps only rows landing in a
  *     targeted bucket (inner join against the broadcast ≤ |keys| ×
  *     |specs| × 2 target list), re-aggregates them by exact value —
  *     the exchange is bounded by the DISTINCT GRID VALUES inside one
  *     bucket — and a second running-count window reads off the
  *     offset-th smallest value exactly.
  *
  * The k-th / (k+1)-th order statistics then interpolate with the same
  * arithmetic Spark's Percentile uses ((hi−pos)·v_lo + (pos−lo)·v_hi on
  * doubles), so results are bit-compatible with `percentile(col, p)`
  * wherever values sit on the ≤6-decimal grid gridMicros requires.
  * Exactness and order-independence come from integer counts; at any
  * scale the only full-data work is two scans, both combiner-friendly.
  *
  * Keys whose measure is entirely NULL (or absent) keep their row with
  * NULL percentiles, matching the built-in aggregate.
  */
object Percentiles {

  /** One requested percentile: `measure` names the value column,
    * `shiftBits` the micro-unit bucket width (pick ≈ log2(range_micros /
    * desired_buckets); a few hundred to a few thousand buckets is the
    * sweet spot), `alias` the output column. */
  final case class Spec(measure: String, p: Double, shiftBits: Int, alias: String)

  def exactPercentiles(df: DataFrame, keyCol: String, specs: Seq[Spec]): DataFrame = {
    require(specs.nonEmpty && specs.map(_.alias).distinct.size == specs.size)
    val measures: Seq[(String, Int)] =
      specs.map(s => (s.measure, s.shiftBits)).distinct
    require(measures.map(_._1).distinct.size == measures.size,
      "one shiftBits per measure")

    // long format in ONE scan: explode a literal array of (measure,
    // micro-value) structs — codegen'd generator, no per-measure rescan
    // NOT checkpointed, deliberately (r9 A/B): the long form feeds both
    // the histogram and resolve passes, but materializing the (k, m, v)
    // triples to storage costs more than re-running the vectorized scan
    // + codegen'd explode a second time (a10 isolated 0.97 -> 1.48 s
    // with a lazy localCheckpoint here — the opposite result from l11's
    // tf AGGREGATE, where the reused subtree contained an exchange +
    // aggregation, not just a scan).
    def longForm: DataFrame = df
      .select(col(keyCol).as("k"), explode(array(measures.map { case (m, _) =>
        struct(lit(m).as("m"), QShared.gridMicros(col(m)).as("v"))
      }: _*)).as("mv"))
      .select(col("k"), col("mv.m").as("m"), col("mv.v").as("v"))
      .filter(col("v").isNotNull)
    def withBucket(d: DataFrame): DataFrame =
      d.withColumn("b", measures.map { case (m, bits) =>
        when(col("m") === m, shiftright(col("v"), bits))
      }.reduce(_.otherwise(_)))

    // pass 1: bucket histogram + running counts per (key, measure)
    val wRun = Window.partitionBy(col("k"), col("m")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("k"), col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hist = withBucket(longForm)
      .groupBy(col("k"), col("m"), col("b")).agg(count(lit(1)).as("c"))
      .select(col("k"), col("m"), col("b"), col("c"),
        coalesce(sum(col("c")).over(wRun), lit(0L)).as("cum0"),
        sum(col("c")).over(wAll).as("n"))

    // requested ranks: pos = p·(n−1) (Spark Percentile's arithmetic),
    // lo rank = ⌊pos⌋+1, hi rank = min(lo+1, n), 1-indexed. The rank→
    // bucket location runs directly on the hist frame (every hist row
    // already carries its (cum0, c, n) — a separate distinct + re-join
    // would add two stages of pure floor at small SF).
    val specDf = df.sparkSession
      .createDataFrame(specs.zipWithIndex.map { case (s, i) => (i, s.measure, s.p) })
      .toDF("sid", "m", "p")
    val targets = hist.join(broadcast(specDf), "m")
      .select(col("k"), col("m"), col("sid"), col("b"), col("c"),
        col("cum0"), col("n"),
        (col("p") * (col("n") - 1).cast("double")).as("pos"))
      .select(col("k"), col("m"), col("sid"), col("b"), col("c"),
        col("cum0"), col("pos"),
        explode(array(
          struct(lit("lo").as("which"),
            (floor(col("pos")) + 1).cast("long").as("r")),
          struct(lit("hi").as("which"),
            least(floor(col("pos")) + 2, col("n")).cast("long").as("r"))))
          .as("t"))
      .filter(col("cum0") < col("t.r") && col("t.r") <= col("cum0") + col("c"))
      .select(col("k"), col("m"), col("sid"), col("b"),
        (col("t.r") - col("cum0")).as("off"),
        col("t.which").as("which"), col("pos"))

    // pass 2: resolve the off-th smallest value inside targeted buckets
    val wVal = Window.partitionBy(col("k"), col("m"), col("sid"), col("which"))
      .orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val resolved = withBucket(longForm)
      .join(broadcast(targets), Seq("k", "m", "b"))
      .groupBy(col("k"), col("m"), col("sid"), col("which"), col("off"),
        col("pos"), col("v"))
      .agg(count(lit(1)).as("c"))
      .select(col("k"), col("sid"), col("which"), col("off"), col("pos"), col("v"),
        coalesce(sum(col("c")).over(wVal), lit(0L)).as("cum0"),
        (coalesce(sum(col("c")).over(wVal), lit(0L)) + col("c")).as("cum"))
      .filter(col("cum0") < col("off") && col("off") <= col("cum"))

    // interpolate exactly as Spark's Percentile does, pivoting every
    // spec's (vlo, vhi, pos) out of ONE key-grouped aggregation — the
    // result is ≤ 2·|specs| rows per key, so a separate per-spec
    // aggregation before the pivot is a pure extra stage
    val vd = (col("v").cast("double") / 1e6)
    def interpOf(i: Int): Column = {
      val pos = max(when(col("sid") === i, col("pos")))
      val vlo = max(when(col("sid") === i && col("which") === "lo", vd))
      val vhi = max(when(col("sid") === i && col("which") === "hi", vd))
      when(floor(pos) === pos, vlo)
        .otherwise((ceil(pos) - pos) * vlo + (pos - floor(pos)) * vhi)
    }
    val pivoted = resolved.groupBy(col("k"))
      .agg(interpOf(0).as(specs.head.alias),
        specs.zipWithIndex.tail.map { case (s, i) => interpOf(i).as(s.alias) }: _*)

    // keep every key (all-NULL measures stay as NULL percentiles,
    // matching the built-in aggregate)
    val keyUniverse = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)))
      .select(col("k"))
    keyUniverse.join(pivoted, Seq("k"), "left")
      .withColumnRenamed("k", keyCol)
  }
}
