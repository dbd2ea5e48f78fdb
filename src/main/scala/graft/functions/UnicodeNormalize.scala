package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b), like
  * [[CosineSimilarity]]): Unicode normalization of a string column to
  * NFC/NFD/NFKC/NFKD.
  *
  * Spark ships no normalization scalar, yet it is the first step of any
  * text-corpus cleanup (the same logical text arrives from crawls as
  * composed é and decomposed e+U+0301; digests, dedup keys, and token
  * counts all diverge until the forms are unified — DuckDB exposes the
  * matching `nfc_normalize`). A Scala UDF would pay
  * serialization + break codegen; this stays inside whole-stage
  * codegen via a static helper and, on the dominant already-normalized
  * (ASCII) path, returns the input buffer untouched —
  * `Normalizer.isNormalized` is a quick-check scan, no allocation.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if UnicodeNormalize.forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.forms.mkString("/")}, got $form")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = UnicodeNormalize.name

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.doNormalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UnicodeNormalize.getClass.getName.stripSuffix("$")
    // form was validated against the enum names in checkInputDataTypes,
    // so embedding it as a code literal is safe
    defineCodeGen(ctx, ev, c => s"""$helper.doNormalize($c, "$form")""")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val name = "graft_normalize"
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
  val info = new ExpressionInfo(classOf[UnicodeNormalize].getName, name)

  /** Static codegen target. Returns the INPUT object unchanged when the
    * text is already in the requested form (the ASCII fast path — a
    * quick-check scan with zero allocation). */
  def doNormalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 2, children)
    UnicodeNormalize(children.head,
      FunctionBuilders.stringLit(name, "form", children(1)))
  }
}
