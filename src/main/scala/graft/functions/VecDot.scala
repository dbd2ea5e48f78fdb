package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY §7.3 preference (b)): the DSIR
  * score fold — for a per-document bucket histogram `counts`
  * (array<int>, [[DsirBuckets]]' output) and a weight vector `weights`
  * (array<long>, the fitted per-bucket micro-nat log-ratios), computes
  * in one codegen'd loop
  *
  *   n   = Σ counts(i)                 (the document's feature count)
  *   dot = Σ counts(i) · weights(i)    (its micro-nat importance weight)
  *
  * exactly the values the l38 score pass previously folded with
  * `aggregate(counts, ...)` + `aggregate(zip_with(counts, weights, ...))`
  * — higher-order functions, which run INTERPRETED per row (Catalyst
  * lambda expressions don't participate in codegen): three 256-element
  * interpreted walks per document was the score pass's dominant cost at
  * scale. Bit-equality to the HOF composition is pinned in
  * NativeExprPropertySpec; the l38 DuckDB oracle is unchanged.
  *
  * Arithmetic is Long overflow-wrapping, identical to the BIGINT
  * arithmetic of the HOF fold it replaces. Either input NULL → NULL;
  * null ELEMENTS cannot occur from the producers (both arrays are
  * containsNull = false), and the fold walks min(len(counts),
  * len(weights)) exactly like zip_with-then-sum ignores nothing — the
  * producers always emit equal-length (256) arrays, pinned by the spec.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      // compute() reads elements with getInt/getLong, which is undefined
      // for null ELEMENTS (the HOF composition this mirrors propagates
      // NULL instead) — reject containsNull inputs at analysis time so a
      // SQL-surface caller gets a type error, not garbage (r11 ADVICE)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int>, array<long>) with non-null " +
          s"elements, got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = VecDot.schema

  override def prettyName: String = VecDot.name

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(c: Any, w: Any): Any =
    VecDot.compute(c.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VecDot.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (c, w) => s"""
      ${ev.value} = $helper.compute($c, $w);""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val name = "graft_vec_dot"
  val info = new ExpressionInfo(classOf[VecDot].getName, name)

  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("dot", LongType, nullable = false)))

  /** Static codegen target: one loop over the histogram. */
  def compute(counts: ArrayData, weights: ArrayData): InternalRow = {
    val n = math.min(counts.numElements(), weights.numElements())
    var s = 0L
    var dot = 0L
    var i = 0
    while (i < n) {
      val c = counts.getInt(i).toLong
      s += c
      dot += c * weights.getLong(i)
      i += 1
    }
    // counts longer than weights: the HOF n-fold summed ALL counts
    // while zip_with truncated — producers always send equal lengths,
    // but match the composition exactly anyway
    val cn = counts.numElements()
    while (i < cn) { s += counts.getInt(i).toLong; i += 1 }
    new GenericInternalRow(Array[Any](s, dot))
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 2, children)
    VecDot(children.head, children(1))
  }
}
