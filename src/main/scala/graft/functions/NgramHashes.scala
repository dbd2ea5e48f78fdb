package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct word n-gram KEY array of a
  * text in one pass — 64-bit chained token hashes instead of the
  * string grams `Dedup.ngramRows` used to build with
  * `concat_ws ∘ slice` per gram.
  *
  * Why hashes, not strings: every consumer (dup-fraction, cross-source
  * overlap, decontamination, gram-connected components) treats the
  * gram as an OPAQUE join/aggregation key and never outputs it, so the
  * only thing the key must preserve is equality. An 8-byte long
  * through the gram-keyed exchanges beats a ~25-byte string on every
  * shuffle, sort, and hash probe — and the string build itself
  * (per-gram slice + concat allocations) disappears. A 64-bit
  * collision merges two grams; the corpus-scale collision budget is
  * the same one the banded-LSH family already carries, and the oracle
  * gate (which recomputes with STRING grams in DuckDB) verifies
  * count-exactness on the certified data.
  *
  * Gram construction mirrors `ngramRows`' clamped-slice semantics:
  * tokens = `split(text, " ")` at limit −1 (empty tokens kept); texts
  * with fewer than `n` tokens contribute ONE gram covering all their
  * tokens; otherwise every full window of `n`. Key = seed-42
  * left-fold of per-token xxhash64s. `distinct = true` (the default)
  * keeps first occurrence (ngramRows' `array_distinct` did the same
  * before its explode); `distinct = false` emits ONE hash per window
  * position, index-aligned with the window start — the positional form
  * span-level consumers (exactSubstringSpans) need, where an in-doc
  * repeat is itself duplication and every occurrence's position
  * matters.
  */
case class NgramHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_ngram_hashes"

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    NgramHashes.compute(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NgramHashes.compute($t, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  val name = "graft_ngram_hashes"
  val info = new ExpressionInfo(classOf[NgramHashes].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arityIn(name, Seq(2, 3), children)
    val n = FunctionBuilders.intLit(name, "n", children(1))
    val distinct =
      if (children.length < 3) true
      else FunctionBuilders.boolLit(name, "distinct", children(2))
    NgramHashes(children.head, n, distinct)
  }

  /** Shared eval/codegen body — one scan over the UTF-8 bytes. */
  def compute(s: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var nTokens = 1
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) nTokens += 1
      i += 1
    }
    val th = new Array[Long](nTokens)
    var tok = 0
    var start = 0
    i = 0
    while (i <= nb) {
      if (i == nb ||
        org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        th(tok) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        tok += 1
        start = i + 1
      }
      i += 1
    }
    if (nTokens < n) { // one clamped gram over every token
      var h = 42L
      var j = 0
      while (j < nTokens) { h = XXH64.hashLong(th(j), h); j += 1 }
      return new GenericArrayData(Array(h))
    }
    val m = nTokens - n + 1
    val out = new Array[Long](m)
    val seen =
      if (distinct) new java.util.HashSet[java.lang.Long](math.max(4, m * 2))
      else null
    var k = 0
    var g = 0
    while (g < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(g + j), h); j += 1 }
      if (seen == null || seen.add(h)) { out(k) = h; k += 1 }
      g += 1
    }
    new GenericArrayData(if (k == m) out else java.util.Arrays.copyOf(out, k))
  }
}
