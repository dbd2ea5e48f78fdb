package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One candidate for the bounded top-k similarity aggregate: a scored
  * id plus an optional carried attribute (`tag`, e.g. l33's negative
  * label). `sim` is Option so a NULL similarity (ragged / zero-norm
  * vector) stays a real candidate that ranks after every non-null one —
  * the `row_number() OVER (ORDER BY sim DESC NULLS LAST, id ASC)`
  * semantics this aggregate replaces. */
case class TopKCand(sim: Option[Double], id: Long, tag: Option[String])

/** Exact bounded top-k by (sim DESC NULLS LAST, id ASC) — the scale
  * primitive behind brute-force similarity search (SURVEY §2B L2).
  *
  * The window formulation (`row_number` per query) exchanges and sorts
  * the ENTIRE |queries|·|corpus| score stream, and its sort parallelism
  * is bounded by the query count. This aggregate keeps a k-bounded
  * sorted buffer per group instead: the map-side partial does all the
  * row work in place (one ordered insert per qualifying row, O(k)
  * worst-case with k ~ 5), and the exchange carries only
  * |groups|·|partitions| buffers of ≤ k entries — statistics, not the
  * stream. At 100 TB this is the difference between shuffling the
  * score matrix and shuffling a few kilobytes per executor.
  *
  * Exactness: insertion keeps the best k under the same total order at
  * every partial, and the global top-k is a subset of every
  * partial-top-k union, so merge-then-trim is lossless. Output is the
  * ordered candidate list (posexplode to recover ranks 1..k).
  */
class TopKBySim(k: Int) extends Aggregator[TopKCand, List[TopKCand], Seq[TopKCand]]
    with Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  // total order: non-null sim before null; higher sim first; id breaks
  // ties (and orders the all-null tail) ascending
  private def before(a: TopKCand, b: TopKCand): Boolean = (a.sim, b.sim) match {
    case (Some(x), Some(y)) => x > y || (x == y && a.id < b.id)
    case (Some(_), None) => true
    case (None, Some(_)) => false
    case (None, None) => a.id < b.id
  }

  // buffer invariant: sorted by `before`, length <= k
  def zero: List[TopKCand] = Nil

  def reduce(buf: List[TopKCand], a: TopKCand): List[TopKCand] = {
    // fast reject: full buffer and the new candidate ranks after the
    // current worst — the overwhelmingly common case in a scan
    if (buf.lengthCompare(k) >= 0 && !before(a, buf.last)) buf
    else {
      val (pre, post) = buf.span(before(_, a))
      (pre ::: a :: post).take(k)
    }
  }

  def merge(b1: List[TopKCand], b2: List[TopKCand]): List[TopKCand] = {
    val out = List.newBuilder[TopKCand]
    var x = b1; var y = b2; var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  def finish(buf: List[TopKCand]): Seq[TopKCand] = buf

  def bufferEncoder: Encoder[List[TopKCand]] = ExpressionEncoder[List[TopKCand]]()
  def outputEncoder: Encoder[Seq[TopKCand]] = ExpressionEncoder[Seq[TopKCand]]()
}
