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
object MedianAggregator extends Aggregator[Double, Array[Double], Double] {
  def zero: Array[Double] = Array.empty
  def reduce(b: Array[Double], a: Double): Array[Double] = b :+ a
  def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = b1 ++ b2
  def finish(b: Array[Double]): Double = {
    if (b.isEmpty) return Double.NaN
    val s = b.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
