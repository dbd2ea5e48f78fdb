package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType}

/** SQL-surface argument validation for the `graft_*` function builders.
  *
  * Builders run inside the analyzer's function-resolution phase; a
  * `require`/`IllegalArgumentException` thrown there surfaces to the
  * user as an INTERNAL error from the analyzer instead of a plain
  * AnalysisException with a usable message (round-11 ADVICE, GramSpans/
  * WinnowStats). These helpers raise real [[AnalysisException]]s under
  * Spark's public error classes (`WRONG_NUM_ARGS`,
  * `NON_FOLDABLE_ARGUMENT`, `INVALID_PARAMETER_VALUE`), so a bad call
  * like `graft_gram_spans(text, n)` fails the same way a bad call to a
  * built-in does.
  */
private[functions] object FunctionBuilders {

  /** Throw unless the call carries exactly `expected` arguments. */
  def arity(name: String, expected: Int, children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          // the WITHOUT_SUGGESTION template references <docroot>, which
          // only Spark's internal error reader auto-fills
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Throw unless the argument count is one of `expected`. */
  def arityIn(name: String, expected: Seq[Int], children: Seq[Expression]): Unit =
    if (!expected.contains(children.length))
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.mkString(" or "),
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private def nonFoldable(name: String, param: String, tpe: String) =
    new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$name`",
        "paramName" -> s"`$param`",
        "paramType" -> s""""$tpe""""))

  /** Extract an INT literal parameter or raise NON_FOLDABLE_ARGUMENT. */
  def intLit(name: String, param: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw nonFoldable(name, param, "INT")
  }

  /** Extract a BOOLEAN literal parameter or raise NON_FOLDABLE_ARGUMENT. */
  def boolLit(name: String, param: String, e: Expression): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case _ => throw nonFoldable(name, param, "BOOLEAN")
  }

  /** Extract a STRING literal parameter or raise NON_FOLDABLE_ARGUMENT. */
  def stringLit(name: String, param: String, e: Expression): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case _ => throw nonFoldable(name, param, "STRING")
  }

  /** Raise INVALID_PARAMETER_VALUE for a structurally-bad parameter
    * (the PATTERN subclass carries a free-text reason slot). */
  def invalidParam(name: String, param: String, reason: String): Nothing =
    throw new AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
      messageParameters = Map(
        "parameter" -> s"`$param`",
        "functionName" -> s"`$name`",
        "value" -> reason))
}
