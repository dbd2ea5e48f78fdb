package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact-median typed aggregate (SURVEY §2B U2): buffers the group's
  * values, sorts once at finish; even-sized groups average the two
  * middles (matching DuckDB `median` = continuous quantile 0.5).
  *
  * Intended for bounded-cardinality groups (per-user metrics). For
  * 100 TB global medians use `percentile_approx` (A3's sketch path)
  * instead — an exact median fundamentally requires the group's values
  * in one place, so this aggregator's memory is O(group size), which is
  * the honest contract for an *exact* result.
  */
object MedianAggregator extends Aggregator[Double, List[Double], Double] {
  // List prepend keeps reduce/merge O(1) per call (an Array `:+` would
  // copy the whole buffer per row — O(n²) per group)
  def zero: List[Double] = Nil
  def reduce(b: List[Double], a: Double): List[Double] = a :: b
  def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 reverse_::: b2
  def finish(b: List[Double]): Double = {
    if (b.isEmpty) return Double.NaN
    val s = b.toArray
    java.util.Arrays.sort(s)
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
  def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder[List[Double]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
