package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Explicit measurement of the per-query fixed floor (VERDICT r6 #1).
  *
  * ~120 of the suite's 171 ratioed queries are floor-dominated at sf0.1:
  * DuckDB finishes in ≤60 ms while Spark pays a fixed ~0.1-0.4 s of
  * Catalyst analysis + job scheduling + task launch regardless of data
  * volume. These two probes pin that floor as a measured number in every
  * bench run instead of a narrative claim: b1 is the cheapest possible
  * plan (no scan, one row), so its bench time IS the plan+schedule
  * floor; b2 adds the smallest real parquet scan (region, 5 rows), so
  * b2−b1 is the scan-setup increment. BASELINE.md reads these numbers
  * when adjudicating floor-dominated ratios. At 100 TB the floor is
  * amortized to zero by data volume — which is exactly why it must be
  * measured separately rather than left mixed into per-query ratios.
  */
object Floor extends QGroup {
  def defs: Seq[QDef] = Seq(
    QDef("b1_floor_select1",
      (s, _) => s.range(1).select(lit(1L).as("one")),
      Some("SELECT CAST(1 AS BIGINT) AS one")),

    QDef("b2_floor_scan_region",
      (s, dir) => Tables(s, dir, "region").select(col("r_regionkey")),
      Some("SELECT r_regionkey FROM region")))
}
