package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *    Queries needing finer-than-long views derive them with integer
  *    arithmetic (`ts div 1000` = DuckDB `epoch_ns(ts) // 1000` exactly).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
