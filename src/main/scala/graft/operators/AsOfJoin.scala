package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2B J8): for each left row, the most recent right
  * row with `right.ts <= left.ts` (or `<` when `allowEqual=false`)
  * sharing the same key.
  *
  * Implementation is the scalable union+window pattern, NOT a range
  * cross-join: both sides are unioned into one stream, hash-partitioned
  * by key, sorted by (ts, side, tieCols) within each key, and the right
  * payload is carried forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding running frame. One shuffle on the key, no row
  * amplification — this survives 100 TB where a `BETWEEN` theta join
  * (O(n·m) per key) would not.
  *
  * Right payload columns are emitted as `r_<name>`; left columns pass
  * through unchanged. `tieCols` makes in-timestamp ordering total so the
  * result is deterministic even with duplicate timestamps.
  */
object AsOfJoin {
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[String],
      tieCols: Seq[String] = Nil,
      rightTieCols: Seq[String] = Nil,
      allowEqual: Boolean = true): DataFrame = {

    // The union+window plumbing reserves internal names and emits
    // r_<payload> outputs; a left frame already carrying any of them
    // would be silently merged by unionByName (or mis-sorted by the
    // window ordering) instead of failing — refuse up front.
    val reserved = Set("__side", "__r_payload", "__rtie", "__match") ++
      rightPayload.map(c => s"r_$c")
    val clashes = (left.columns ++ right.columns).filter(reserved)
    require(clashes.isEmpty,
      s"asOf reserves column names ${clashes.distinct.mkString(", ")}; " +
        "rename them on the input frames first")

    // side ordering at equal ts decides <= vs <: rights first (0) means a
    // left row can see a same-instant right.
    val (lSide, rSide) = if (allowEqual) (1, 0) else (0, 1)

    // The payload travels as ONE struct so `last(..., ignoreNulls)` picks
    // every field from the SAME right row — per-column lasts would stitch
    // fields from different rows when a payload column is NULL (DuckDB
    // ASOF returns the matched row as-is, NULLs included). Right rows
    // with NULL ts can never satisfy `r.ts <= l.ts` and are dropped.
    // right-side ties need their own ordering columns: left tieCols are
    // NULL on right rows (and vice versa), so each side contributes its
    // own tie struct — together (ts, side, ltie, rtie) is a total order
    // whenever each side's ties are keyed.
    val rPrep = right
      // NULL ts can never satisfy r.ts <= l.ts, and a NULL key must match
      // nothing (SQL join semantics) — window partitioning would otherwise
      // group all NULL keys together and hand left rows a bogus payload.
      .filter(col(ts).isNotNull && col(key).isNotNull)
      .select(col(key), col(ts),
        struct(rightPayload.map(c => col(c).as(c)): _*).as("__r_payload"),
        struct((if (rightTieCols.nonEmpty) rightTieCols else rightPayload)
          .map(c => col(c).as(c)): _*).as("__rtie"))
      .withColumn("__side", lit(rSide))
    val lPrep = left.withColumn("__side", lit(lSide))

    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)

    val ord = (Seq(col(ts).asc_nulls_first, col("__side").asc_nulls_first) ++
      tieCols.map(c => col(c).asc_nulls_first) :+ col("__rtie").asc_nulls_first)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__r_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === lit(lSide))
    rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"r_$c", col(s"__match.$c"))
    }.drop("__side", "__r_payload", "__rtie", "__match")
  }
}
