package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the driver's synthetic star schema (TESTDATA.md).
  *
  * All query functions read through here so session-level quirks are
  * handled in exactly one place:
  *
  *  - `events.parquet` stores `ts` as Parquet TIMESTAMP(NANOS), which
  *    Spark only maps (to LongType nanos) under
  *    `spark.sql.legacy.parquet.nanosAsLong`. The driver's Verify/Bench
  *    sessions don't set it at build time, so we set it at read time —
  *    it is a runtime (non-static) SQL conf.
  *  - `ts_micros`/`ts_ts` helpers give a deterministic TimestampType view
  *    (floor-divide nanos → micros) that matches DuckDB's
  *    `epoch_ns(ts) // 1000` exactly, avoiding sub-unit rounding drift
  *    between the two engines.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with ts as long nanos (column `ts`) plus a TimestampType
    * projection `ts_ts` truncated to microseconds. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")
      .withColumn("ts_ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
