package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): per-document
  * repetition metrics (Gopher-style quality filters), semantics
  * bit-identical to [[graft.operators.TextAnalysis.repetitionMetrics]]'s
  * Column composition — the l3h contract, DuckDB-oracle-checked.
  *
  * The Column form pays split + array_distinct + array_sort + an
  * interpreted HOF fold per row (HOFs don't participate in codegen).
  * Here one scan over the space-delimited tokens feeds a per-row count
  * map: n_words is the token count, n_distinct the map size, and the
  * top-word count the max multiplicity — which equals the longest run
  * in the sorted array that the fold computes, since sorting groups
  * equal words into maximal runs. Ratios round exactly as Spark's
  * `round(x, 6)` does (BigDecimal HALF_UP).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = RepetitionStats.schema

  override def prettyName: String = RepetitionStats.name

  // NULL text yields a NON-null struct whose four fields are NULL,
  // exactly like the Column composition (struct() of null-input
  // computations is itself non-null) — so the expression is never null.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) RepetitionStats.nullFields
    else RepetitionStats.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RepetitionStats.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          ${c.isNull} ? $helper.nullFields() : $helper.compute(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val name = "graft_repetition"
  val info = new ExpressionInfo(classOf[RepetitionStats].getName, name)

  // fields nullable: NULL input produces a struct of NULLs (above)
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType),
    StructField("n_distinct_words", LongType),
    StructField("top_word_ratio", DoubleType),
    StructField("distinct_frac", DoubleType)))

  /** eval/codegen target for the NULL-input branch. */
  def nullFields(): InternalRow =
    new GenericInternalRow(Array[Any](null, null, null, null))

  /** Spark's round(x, 6): decimal HALF_UP, not IEEE rint. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Static codegen target. Tokenizer contract = split(text, " "):
    * single-space delimiter, empty tokens kept (split passes limit -1,
    * so "a  b" has an empty middle token and "" is one empty token). */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[String, Integer]()
    var nWords = 0L
    var top = 0
    var start = 0
    val n = str.length
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        val prev = counts.getOrDefault(tok, Integer.valueOf(0)).intValue()
        val c = prev + 1
        counts.put(tok, Integer.valueOf(c))
        if (c > top) top = c
        nWords += 1
        start = i + 1
      }
      i += 1
    }
    val nDistinct = counts.size.toLong
    new GenericInternalRow(Array[Any](
      nWords, nDistinct,
      round6(top.toDouble / nWords), round6(nDistinct.toDouble / nWords)))
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    RepetitionStats(children.head)
  }
}
