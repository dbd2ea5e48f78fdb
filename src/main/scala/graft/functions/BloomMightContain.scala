package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate (SURVEY §7.3 preference (b)):
  * `graft_bloom_contains(key, filterBytes)` — probe a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] with a long key inside
  * whole-stage codegen.
  *
  * This is the explicit form of Spark's own runtime bloom filtering
  * (InjectRuntimeFilter): the dim side's key set is compacted into a
  * few-MB filter and shipped to every fact-scan task AS PART OF THE
  * PLAN (a foldable binary literal), so non-matching fact rows die at
  * the scan — before the shuffle — instead of being exchanged and then
  * discarded by the join. At 100 TB fact scale the shuffle saved is the
  * whole game; the exactness lost to false positives is restored by the
  * real join that follows (see [[graft.operators.BloomJoin]]).
  *
  * Contract: the filter argument must be a foldable BinaryType literal
  * (same rule as `graft_minhash`'s literal args — the filter is
  * deserialized ONCE at codegen/first-eval, never per row). NULL keys
  * return false, matching equi-join semantics where NULL never matches.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint key, got ${left.dataType.simpleString}")
    right match {
      case Literal(b, BinaryType) if b != null => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a non-null binary literal serialized filter " +
          "(build one with BloomJoin.serialize)")
    }
  }

  override def prettyName: String = BloomMightContain.name

  override def nullable: Boolean = false

  /** Deserialized once per task (the expression ships serialized; the
    * lazy val re-materializes on first probe on each executor). */
  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val k = left.eval(input)
    k != null && filter.mightContainLong(k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the DESERIALIZED filter: one object shared by the whole
    // generated stage, zero per-row deserialization or branching beyond
    // the null check + two hash probes
    val f = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    ev.copy(
      code = code"""
        ${leftGen.code}
        boolean ${ev.value} = !${leftGen.isNull} &&
          $f.mightContainLong(${leftGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val name = "graft_bloom_contains"
  val info = new ExpressionInfo(classOf[BloomMightContain].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 2, children)
    BloomMightContain(children.head, children(1))
  }
}
