package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY §7.3 "custom vs built-in",
  * preference (b)): cosine similarity of two float (or double) vectors
  * with full whole-stage-codegen support.
  *
  * Semantically identical to the HOF composition in
  * [[graft.operators.Similarity.cosine]] (same left-to-right double
  * accumulation → bit-identical results), but evaluates as a tight
  * primitive loop in generated Java — no per-element lambda dispatch, no
  * boxing, no intermediate arrays. Mismatched lengths, zero-norm inputs
  * and NULL elements all yield NULL on BOTH paths (never NaN — NaN sorts
  * ABOVE every real similarity under descending order, which would rank
  * a zero vector as everyone's nearest neighbor; mismatched lengths are
  * malformed input, not a comparable pair).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // float AND double element types are accepted (mixed sides too): the
  // driver has regenerated table encodings before (events.ts, r5), and
  // an embeddings drop re-encoded as list<double> must not break the
  // whole similarity surface on a type check. Accumulation is double
  // either way, so widening a float side is value-preserving.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // resolved once per expression instance — the interpreted path calls
  // these per ELEMENT, so re-pattern-matching the DataType there costs a
  // match per float (ADVICE r6)
  @transient private lazy val leftIsFloat = elemIsFloat(left.dataType)
  @transient private lazy val rightIsFloat = elemIsFloat(right.dataType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // NULL element or zero norm → NULL result, matching the HOF path
      // (Spark: null poisons the aggregate; x/0 is NULL, not NaN)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |boolean ${n}_null = $n != $b.numElements();
         |if (!${n}_null) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${n}_null = true; break; }
         |    double $xi = $a.${if (leftIsFloat) "getFloat" else "getDouble"}($i);
         |    double $yi = $b.${if (rightIsFloat) "getFloat" else "getDouble"}($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |}
         |if (${n}_null || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "graft_cosine"
  val info = new ExpressionInfo(classOf[CosineSimilarity].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 2, children)
    CosineSimilarity(children.head, children(1))
  }
}
