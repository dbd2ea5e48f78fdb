package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-equi interval join — pairs within `|rightTs - leftTs| <= tol` —
  * WITHOUT an equality key. Spark plans a raw `abs(r - l) <= tol` join
  * as BroadcastNestedLoopJoin / cartesian (O(n·m) comparisons, a
  * scale-killer); this operator composes the scalable form from
  * existing ops (SURVEY preference (a)): each left row is exploded to
  * its tolerance-width bucket and both neighbors, the right side maps
  * to its single bucket, the engine runs a plain distributed EQUI-join
  * on the bucket id, and the exact predicate filters the candidates.
  * Any qualifying pair shares exactly one right bucket ∈ {b-1, b, b+1}
  * of the left row, so no pair is produced twice.
  *
  * Cost: 3× left-side row amplification + one keyed shuffle + per-
  * bucket candidate filtering — Σ|bucket|² work in the worst case,
  * which is proportional to the true output for timestamp-like data.
  * A globally hot bucket (everything in one tolerance window) is
  * inherent to the QUERY's output size, not the plan.
  *
  * Timestamps must be non-negative integers (epoch µs/ns); `div` and
  * `//` agree on floor semantics there, which keeps the paired oracle
  * SQL bit-identical.
  */
object IntervalJoin {

  /** Generic two-sided form: all columns of `left` and `right` for rows
    * with `|right.rTs - left.lTs| <= tol` (column names must not
    * collide; callers project/rename first). */
  def join(
      left: DataFrame,
      right: DataFrame,
      lTs: String,
      rTs: String,
      tol: Long): DataFrame = {
    require(tol > 0, "tolerance must be positive")
    val clashes = left.columns.toSet.intersect(right.columns.toSet)
    require(clashes.isEmpty, s"column collision: ${clashes.mkString(",")}")
    // the operator's working names would be silently clobbered by
    // withColumn (wrong join key, caller's column dropped on output)
    val reserved = Set("__b", "__lb")
    val taken = (left.columns ++ right.columns).filter(reserved).distinct
    require(taken.isEmpty, s"reserved column name in input: ${taken.mkString(",")}")
    val l = left
      .withColumn("__lb", expr(s"`$lTs` div ${tol}L"))
      .withColumn("__b",
        explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)))
      .drop("__lb")
    val r = right.withColumn("__b", expr(s"`$rTs` div ${tol}L"))
    l.join(r, Seq("__b"))
      .filter(abs(col(s"`$rTs`") - col(s"`$lTs`")) <= tol)
      .drop("__b")
  }
}
