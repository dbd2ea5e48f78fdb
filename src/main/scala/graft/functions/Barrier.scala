package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Zero-cost projection barrier: a pass-through expression whose ONLY
  * job is `deterministic = false`, which stops `CollapseProject` from
  * inlining the (expensive, computed-once) child into a downstream
  * projection where a HOF lambda would re-evaluate it PER ELEMENT with
  * no CSE (the minhash hazard: `sig(sh)` folds 64 lambdas over `sh`, so
  * inlining `sh = shingle_hashes(text)` turns one text pass per row
  * into 64).
  *
  * Before r13 that barrier was a round-robin
  * `repartition(defaultParallelism)` — a full shuffle of the TEXT
  * PAYLOAD whose only load-bearing effect was being a pipeline breaker
  * (guide §2.3: never move heavy bytes to make a planning point; §4.4:
  * non-determinism is the sanctioned "do not duplicate" marker). The
  * value is bit-identical to the child and genuinely deterministic —
  * the flag is a planner fence, not a semantics change, exactly like
  * marking an expensive UDF nondeterministic to stop double evaluation.
  *
  * Trade-off documented in §4.4: other filters no longer push through
  * the fenced projection; every call site filters (isNotNull) BELOW the
  * fence already.
  */
case class Barrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  // the whole point: a planner fence against CollapseProject /
  // filter-reorder duplication. Evaluation is pure passthrough.
  override lazy val deterministic: Boolean = false

  override def prettyName: String = Barrier.name

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Barrier =
    copy(child = newChild)
}

object Barrier {
  val name = "graft_barrier"
  val info = new ExpressionInfo(classOf[Barrier].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    Barrier(children.head)
  }
}
