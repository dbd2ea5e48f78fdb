package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): the
  * distinct 3-token shingle-hash array straight from text in ONE pass —
  * the fused form of [[graft.operators.Dedup.shingleHashes]]'s HOF
  * composition (`split` → per-token `xxhash64` → two `zip_with` hash
  * folds → `array_distinct`), which allocates five intermediate arrays
  * per row and dispatches two lambdas per shingle. This is the hot
  * leading stage of the whole MinHash family (the signature kernel
  * [[MinHashSignature]] consumes its output), i.e. a full-corpus CPU
  * pass at 100 TB.
  *
  * Bit-identical semantics, replicated operation for operation:
  *  - tokens = `split(text, " ")` at Spark's default limit −1: every
  *    single space is a boundary, consecutive/leading/trailing spaces
  *    produce EMPTY tokens which are hashed like any other (the byte
  *    0x20 cannot occur inside a UTF-8 multi-byte sequence, so a byte
  *    scan is exact);
  *  - fewer than 3 tokens → `array(xxhash64(text))` (whole-text hash);
  *  - shingle hash = xxhash64(xxhash64(th_i, th_{i+1}), th_{i+2}) with
  *    Spark's seed-42 left-to-right fold (`hashLong` chaining), where
  *    th_j = xxhash64(token_j) = hashUnsafeBytes(bytes, 42);
  *  - `array_distinct` keeps FIRST occurrence order.
  *
  * NULL text yields NULL (the HOF path's `when` guard sits on the
  * callers' `filter(text.isNotNull)` side, so both paths agree on every
  * row that reaches them). Pinned bit-identical to the HOF composition
  * in NativeExprSpec on real and adversarial text.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  val name = "graft_shingle_hashes"
  val info = new ExpressionInfo(classOf[ShingleHashes].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    ShingleHashes(children.head)
  }

  /** Shared eval/codegen body — one scan over the UTF-8 bytes. */
  def compute(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    // token boundaries: spaces (byte 0x20 is never a UTF-8 continuation)
    var nTokens = 1
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) nTokens += 1
      i += 1
    }
    if (nTokens < 3)
      return new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, n, 42L)))
    val th = new Array[Long](nTokens)
    var tok = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n ||
        org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        th(tok) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        tok += 1
        start = i + 1
      }
      i += 1
    }
    val m = nTokens - 2
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](math.max(4, m * 2))
    var k = 0
    var j = 0
    while (j < m) {
      val h12 = XXH64.hashLong(th(j + 1), XXH64.hashLong(th(j), 42L))
      val h123 = XXH64.hashLong(th(j + 2), XXH64.hashLong(h12, 42L))
      if (seen.add(h123)) { out(k) = h123; k += 1 }
      j += 1
    }
    new GenericArrayData(if (k == m) out else java.util.Arrays.copyOf(out, k))
  }
}
