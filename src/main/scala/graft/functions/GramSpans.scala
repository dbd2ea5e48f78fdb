package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): the word
  * n-gram STRING array of a text in one pass — the gram-as-key form
  * consumers need when the gram value itself is output or joined
  * cross-engine (where [[NgramHashes]]' 64-bit keys would trade
  * exactness for speed).
  *
  * Gram i is the single-space join of tokens i..i+n-1 of
  * `split(text, " ")` (limit −1, empty tokens kept) — which is exactly
  * the ORIGINAL BYTE SPAN from the start of token i to the end of
  * token i+n-1, because the separators are the single spaces already
  * in the text. So no per-gram concat is ever built: each gram is a
  * slice of the document's bytes. The Column composition this replaces
  * (`transform(sequence(...), i -> struct/concat_ws(slice(...)))`)
  * runs INTERPRETED per row — Catalyst lambda HOFs don't participate
  * in codegen — and was the dominant per-row cost of the bigram LM
  * pass (l36) at scale. Bit-equality to that composition is pinned in
  * NativeExprPropertySpec; the l36 DuckDB oracle is unchanged.
  *
  * `clamp = true` mirrors [[NgramHashes]]/winnowing semantics: texts
  * with fewer than n tokens contribute ONE gram covering all their
  * tokens. `clamp = false` mirrors the bigram-LM/DuckDB-UNNEST
  * semantics: such texts contribute NO grams. NULL text → NULL.
  */
case class GramSpans(child: Expression, n: Int, clamp: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = GramSpans.name

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    GramSpans.compute(v.asInstanceOf[UTF8String], n, clamp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = GramSpans.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $helper.compute($c, $n, $clamp);""")
  }

  override protected def withNewChildInternal(newChild: Expression): GramSpans =
    copy(child = newChild)
}

object GramSpans {
  val name = "graft_gram_spans"
  val info = new ExpressionInfo(classOf[GramSpans].getName, name)

  /** Static codegen target: one pass over the document bytes. */
  def compute(s: UTF8String, n: Int, clamp: Boolean): GenericArrayData = {
    val bytes = s.getBytes // one copy per DOC; grams are slices of it
    val nb = bytes.length
    var nTokens = 1
    var i = 0
    while (i < nb) { if (bytes(i) == 0x20) nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var tok = 0
    var from = 0
    i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == 0x20) {
        starts(tok) = from; ends(tok) = i; tok += 1; from = i + 1
      }
      i += 1
    }
    val gCount =
      if (nTokens >= n) nTokens - n + 1
      else if (clamp) 1
      else 0
    val out = new Array[Any](gCount)
    i = 0
    while (i < gCount) {
      val a = starts(i)
      val b = ends(math.min(i + n - 1, nTokens - 1))
      out(i) = UTF8String.fromBytes(bytes, a, b - a)
      i += 1
    }
    new GenericArrayData(out)
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 3, children)
    GramSpans(children.head,
      FunctionBuilders.intLit(name, "n", children(1)),
      FunctionBuilders.boolLit(name, "clamp", children(2)))
  }
}
