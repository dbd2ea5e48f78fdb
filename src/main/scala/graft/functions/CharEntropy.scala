package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): per-document
  * character-entropy stats — the l29 quality gate, previously a
  * (doc, char) explode + two keyed shuffles that moved ~|corpus bytes|
  * rows through the exchange (VERDICT r5 "What's wrong" #3). Text is one
  * row, so one pass over the string builds the per-codepoint count map
  * and the floor-scaled entropy with NO shuffle at all.
  *
  * Bit-identity contract with the Column composition it replaces (the
  * l3f/l3g/l3h playbook, pinned in NativeExprPropertySpec):
  *   - a "char" is what `split(text, "")` / DuckDB `string_split(text,'')`
  *     emit: one Unicode code point (surrogate pairs stay whole);
  *   - n_chars_seen = total code points, n_distinct_chars = distinct;
  *   - each ln is floor-scaled to integer micro-nats BEFORE summation
  *     (`floor(ln(c)·1e6)` per count, exact BIGINT sum — merge-order
  *     independent), and the final division is integral (both operands
  *     non-negative, so truncation ≡ floor ≡ Spark's `div`):
  *       entropy_micro = floor(ln(n)·1e6) − Σ c·floor(ln(c)·1e6) div n.
  *
  * NULL or empty input yields NULL (the l29 query filters those rows
  * up front; the expression itself stays total for the robustness
  * sweeps).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = CharEntropy.schema

  override def prettyName: String = CharEntropy.name

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CharEntropy.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $helper.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  val name = "graft_char_entropy"
  val info = new ExpressionInfo(classOf[CharEntropy].getName, name)

  val schema: StructType = StructType(Seq(
    StructField("n_chars_seen", LongType),
    StructField("n_distinct_chars", LongType),
    StructField("entropy_micro", LongType)))

  /** Static codegen target. One pass over code points; the count map is
    * bounded by the document's alphabet (≤ |text| entries worst case,
    * tiny for natural language). Returns null for the empty string —
    * mirroring the query's length(text) > 0 pre-filter. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    if (str.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      counts.merge(Integer.valueOf(cp), 1L, (a, b) => a + b)
    }
    var sumTerm = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sumTerm += c * Math.floor(Math.log(c.toDouble) * 1e6).toLong
    }
    val entropy = Math.floor(Math.log(n.toDouble) * 1e6).toLong - sumTerm / n
    new GenericInternalRow(Array[Any](n, counts.size.toLong, entropy))
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    CharEntropy(children.head)
  }
}
