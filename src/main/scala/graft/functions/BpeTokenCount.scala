package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenizer APPLICATION — the per-row token count of a
  * text under a learned merge sequence, via the priority-merge
  * algorithm production tokenizers use (repeatedly merge the
  * LOWEST-RANK pair present, leftmost occurrence first), which is
  * O(word_len²) per word INDEPENDENT of |merges|.
  *
  * Why it exists: the portable Column form
  * ([[graft.operators.TextAnalysis.applyBpeMerges]]) replays merges as
  * |merges| chained regexp_replace passes — exactly right at the
  * spec's 8 merges, but a real subword vocabulary is 30k–50k merges =
  * tens of thousands of regex passes over every row. Priority
  * application is equivalent to sequential rank-order replay for every
  * WELL-FORMED merge table — one where each merge's operands are base
  * characters or outputs of EARLIER merges, which is what training
  * produces by construction — because a later-rank merge can then
  * never create an occurrence of an earlier-rank pair; leftmost-first
  * greedy tie handling within a rank matches the regex engine's scan.
  * (An ill-formed table — an early rank referencing a symbol only a
  * later rank creates — CAN diverge: the sequential replay has passed
  * the early rank before its operand exists. Trained tables cannot
  * contain such an entry.) The equivalence is pinned against the regex
  * path in BpeApplySpec, including on corpora × merge tables TRAINED
  * by bpeMerges on random text.
  *
  * Semantics mirror applyBpeMerges' counting: words = split(text, " ")
  * at limit −1 (empty words from repeated spaces contribute 0 tokens);
  * token count = Σ over words of the word's post-merge symbol count.
  * NULL text yields NULL.
  */
case class BpeTokenCount(
    child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpe_token_count"

  override def nullable: Boolean = true

  @transient private lazy val table = new BpeApplyTable(merges)

  override protected def nullSafeEval(v: Any): Any =
    table.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeApplyTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.count($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Preprocessed merge table: rank lookup as a nested map (left →
  * right → rank) so the per-pair probe allocates nothing. Serializable
  * — it ships to executors inside the expression. */
class BpeApplyTable(merges: Seq[(String, String)]) extends Serializable {
  @transient private lazy val rank: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.computeIfAbsent(l, _ => new java.util.HashMap[String, Integer]())
        .putIfAbsent(r, Integer.valueOf(i))
    }
    m
  }
  /** Token count of the whole text: Σ over space-split words of the
    * word's symbol count after priority BPE merging. */
  def count(s: UTF8String): Long = {
    val str = s.toString
    var total = 0L
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) total += countWord(str, start, i)
        start = i + 1
      }
      i += 1
    }
    total
  }

  private def countWord(str: String, from: Int, until: Int): Long = {
    val len = until - from
    if (len == 1) return 1L
    // symbols as a growable-free array of strings (chars to start)
    var syms = new Array[String](len)
    var i = 0
    while (i < len) { syms(i) = String.valueOf(str.charAt(from + i)); i += 1 }
    var m = len
    var done = false
    while (!done && m > 1) {
      // find the lowest-rank adjacent pair; leftmost wins ties
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < m - 1) {
        val byL = rank.get(syms(j))
        if (byL != null) {
          val r = byL.get(syms(j + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestPos = j
          }
        }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms(bestPos) = syms(bestPos) + syms(bestPos + 1)
        var k = bestPos + 1
        while (k < m - 1) { syms(k) = syms(k + 1); k += 1 }
        m -= 1
      }
    }
    m.toLong
  }
}

object BpeTokenCount {
  val name = "graft_bpe_token_count"
  val info = new ExpressionInfo(classOf[BpeTokenCount].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 3, children)
    def strings(e: Expression, what: String): Seq[String] = e match {
      case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData, ArrayType(StringType, _)) =>
        v.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString).toSeq
      case _ => FunctionBuilders.invalidParam(name, what,
        "expects an array<string> literal (a trained merge-rule column)")
    }
    val ls = strings(children(1), "lefts")
    val rs = strings(children(2), "rights")
    if (ls.length != rs.length)
      FunctionBuilders.invalidParam(name, "rights",
        s"lefts/rights length mismatch: ${ls.length} vs ${rs.length}")
    BpeTokenCount(children.head, ls.zip(rs))
  }
}
