package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): rolling
  * polynomial fingerprint over space-delimited word tokens, mod 2^31-1,
  * bit-identical to [[graft.operators.TextAnalysis.rollingFingerprint]]'s
  * HOF form `aggregate(split(text," "), 0, (acc,t) ->
  * pmod(acc*1000003 + pmod(xxhash64(t), M), M))` — the l3g contract,
  * pinned by TextAnalysisSpec goldens and a property spec.
  *
  * The HOF form materializes the token array and evaluates the lambda
  * interpreted per element (higher-order functions don't participate in
  * codegen), the l3g bench's dominant cost. Here one scan over the raw
  * UTF-8 bytes hashes each token slice in place with the same XXH64
  * (seed 42) that `xxhash64` uses — a space byte (0x20) never occurs
  * inside a multi-byte UTF-8 sequence, so byte-level splitting is exact
  * — and folds the modular accumulator as it goes: zero allocation,
  * inside whole-stage codegen via a static helper.
  *
  * Tokenizer parity notes: Spark's `split(text, " ")` keeps TRAILING
  * empty tokens (StringSplit passes limit -1) and yields [""] for the
  * empty string; both hash `xxhash64("")` into the fold here too.
  */
case class TokenFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = TokenFingerprint.name

  override protected def nullSafeEval(v: Any): Any =
    TokenFingerprint.fingerprint(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenFingerprint.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.fingerprint($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

object TokenFingerprint {
  val name = "graft_fingerprint"
  val info = new ExpressionInfo(classOf[TokenFingerprint].getName, name)

  private val M = 2147483647L // 2^31 - 1
  private val SEED = 42L      // xxhash64's fixed seed

  /** Static codegen target. */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, SEED)
        // both pmods of the HOF form; the outer operands are
        // non-negative so floorMod == %, and acc*1000003 + hp < 2^52
        // never overflows a long
        acc = (acc * 1000003L + java.lang.Math.floorMod(h, M)) % M
        start = i + 1
      }
      i += 1
    }
    acc
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    TokenFingerprint(children.head)
  }
}
