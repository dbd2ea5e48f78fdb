package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest centroid of a vector under
  * squared euclidean distance — the k-means / IVF assignment kernel.
  *
  * Semantically identical to the HOF composition it replaces
  * (`aggregate(zip_with(centroids, sequence, ...), minStruct, ...)` over
  * `Similarity.sqDist`): per candidate centroid the squared deltas
  * accumulate left-to-right in double (bit-identical sums), the best
  * candidate wins by STRICT `<` (ties keep the lowest index), a
  * candidate whose distance is null under the HOF rules — mismatched
  * dimension (zip_with null-pads) or a null element on either side —
  * is skipped, and when no candidate qualifies the result is the fold's
  * seed (d2 = Double.MaxValue, cell = -1). The HOF path dispatches an
  * interpreted lambda per element PER CENTROID per row per iteration;
  * this is one generated primitive loop nest.
  *
  * Returns struct(d2 double, cell int); NULL only for a NULL vector
  * (the centroid side is a plan literal).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && centOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val vecIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bestD = Double.MaxValue
    var bestI = -1
    var j = 0
    while (j < cs.numElements()) {
      if (!cs.isNullAt(j)) {
        val c = cs.getArray(j)
        if (c.numElements() == n) {
          var d = 0.0
          var ok = true
          var i = 0
          while (ok && i < n) {
            if (v.isNullAt(i) || c.isNullAt(i)) ok = false
            else {
              val xi = if (vecIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
              val delta = xi - c.getDouble(i)
              d += delta * delta
              i += 1
            }
          }
          if (ok && d < bestD) { bestD = d; bestI = j }
        }
      }
      j += 1
    }
    InternalRow(bestD, bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val ok = ctx.freshName("ok")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val c = ctx.freshName("c")
      val delta = ctx.freshName("delta")
      val getV = if (vecIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $bestD = Double.MAX_VALUE;
         |int $bestI = -1;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if ($b.isNullAt($j)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
         |  if ($c.numElements() != $n) continue;
         |  double $d = 0.0;
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $c.isNullAt($i)) { $ok = false; break; }
         |    double $delta = $getV - $c.getDouble($i);
         |    $d += $delta * $delta;
         |  }
         |  if ($ok && $d < $bestD) { $bestD = $d; $bestI = $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $bestD, $bestI });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  val name = "graft_nearest_centroid"
  val info = new ExpressionInfo(classOf[NearestCentroid].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 2, children)
    NearestCentroid(children.head, children(1))
  }
}
