package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Native Catalyst expression (SURVEY §7.3 preference (b)): all i<j
  * element pairs of an array as `array<struct<a,b>>` — the scan-local
  * pair fan-out behind market-basket mining (a19: supplier pairs per
  * order) and the cross-source contamination matrix (l34: source pairs
  * per gram). On a SORTED DISTINCT input array, (a,b) enumerates
  * exactly the self-join's `x.item < y.item` pairs.
  *
  * Replaces the HOF composition
  * `flatten(transform(arr, (x,i) -> transform(slice(arr, i+2, n-i-1),
  * y -> struct(x,y))))`, which allocates an O(n−i) SLICE per element
  * and dispatches two interpreted lambdas per pair — Σ(basket²)
  * allocations in the hot path. Here one generated loop nest copies
  * element references. Bit-identical multiset and order, pinned in
  * NativeExprPropertySpec for long and string elements including null
  * elements (null pairs like the composition pairs them) and n ∈
  * {0, 1, 2}.
  *
  * NULL array → NULL. Arrays past ~46 k elements (→ >2³¹ pairs) throw
  * loudly rather than overflow — Σ(basket²) is the declared algorithm
  * cost and a basket that size needs a df-cap upstream, not a silent
  * wrap.
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array column, got ${other.simpleString}")
  }

  @transient private lazy val elem = child.dataType.asInstanceOf[ArrayType]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elem.elementType, elem.containsNull),
    StructField("b", elem.elementType, elem.containsNull))),
    containsNull = false)

  override def prettyName: String = SortedPairs.name

  override def nullable: Boolean = true

  /** Instance method (not static): needs the element type for generic
    * value extraction. Codegen references this expression object. */
  def compute(arr: ArrayData): ArrayData = {
    val vals = arr.toObjectArray(elem.elementType)
    val n = vals.length
    require(n <= 46340, // n(n-1)/2 must stay an int
      s"$prettyName: $n elements => ${n.toLong * (n - 1) / 2} pairs " +
        "overflows; cap the set upstream (df-cap / rare-prefix filter)")
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](vals(i), vals(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedPairs", this, classOf[SortedPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  val name = "graft_sorted_pairs"
  val info = new ExpressionInfo(classOf[SortedPairs].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    SortedPairs(children.head)
  }
}
