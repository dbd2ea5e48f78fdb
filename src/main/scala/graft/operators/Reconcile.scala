package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the data-validation primitive for pipeline
  * migrations and replication checks: classify every key of two table
  * snapshots as added / deleted / changed (unchanged rows are dropped —
  * at 100 TB the interesting set is the delta, which is usually tiny,
  * so materializing agreement would dwarf the answer).
  *
  * Scale shape: ONE full-outer shuffle join on the key columns — both
  * sides partition on the same key, so snapshots maintained with
  * [[graft.sources.ParquetIO.writeBucketed]] reconcile with zero
  * exchanges. Column comparison is a null-safe scan-linear projection;
  * no row hashes are materialized (hashing would add a full projection
  * of every compared column just to re-derive what `IS DISTINCT FROM`
  * answers directly, and per-column comparison also yields WHICH
  * columns changed, which a hash cannot).
  */
object Reconcile {

  /** Diff `newDf` against `oldDf` by `keys`, comparing `compare`
    * columns null-safely. Keys must be non-null (null keys can never
    * match a FULL OUTER equi-join, so a null-keyed row would
    * misclassify — same contract as SQL primary keys).
    *
    * Output: key columns + `change` ('added'|'deleted'|'changed') +
    * `changed_cols` (comma-joined names of differing columns; NULL for
    * added/deleted rows, where "difference" is the whole row). */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compare.nonEmpty, "keys and compare must be non-empty")
    val o = oldDf.select((keys ++ compare).map(col): _*).alias("o")
    val n = newDf.select((keys ++ compare).map(col): _*).alias("n")
    val joinCond = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val oPresent = col(s"o.${keys.head}").isNotNull
    val nPresent = col(s"n.${keys.head}").isNotNull
    val colDiffers: Map[String, Column] =
      compare.map(c => c -> !(col(s"o.$c") <=> col(s"n.$c"))).toMap
    val anyDiffers = colDiffers.values.reduce(_ || _)
    val keyCols = keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    o.join(n, joinCond, "full_outer")
      .filter(!oPresent || !nPresent || anyDiffers)
      .select(keyCols ++ Seq(
        when(!oPresent, "added")
          .when(!nPresent, "deleted")
          .otherwise("changed").as("change"),
        // concat_ws skips NULLs on both engines, so absent names vanish;
        // guarded to NULL for added/deleted (concat_ws alone would
        // render '' and imply "present but identical")
        when(oPresent && nPresent,
          concat_ws(",", compare.map(c => when(colDiffers(c), lit(c))): _*))
          .as("changed_cols")): _*)
  }
}
