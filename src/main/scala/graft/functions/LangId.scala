package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): one-pass
  * stopword-heuristic language ID, semantics bit-identical to
  * [[graft.operators.TextAnalysis.languageId]]'s Column composition
  * (the declared l3f contract, mirrored by its DuckDB oracle):
  * argmax over per-language DISTINCT-stopword hits with list-order
  * tie-break, a CJK-character override to "zh", "und" when nothing
  * matches.
  *
  * The Column form pays five `array_intersect` passes over the token
  * array plus a whole-string `regexp_replace` for the CJK probe —
  * O(langs × tokens) with per-row array allocation, the l3f bench's
  * dominant cost. Here one scan over the lowercased text tokenizes
  * in place, flags CJK code units, and marks stopword hits in a single
  * 50-bit bitmap (5 languages × 10 words, so "distinct hits" is free:
  * a bit can only be set once); scores are popcounts per 10-bit lane.
  * Stays inside whole-stage codegen via a static helper.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = LangId.name

  // NULL text classifies as "und", exactly like the Column composition
  // (whose when-chain falls through to otherwise("und") on NULL) and
  // the l3f oracle's ELSE 'und' — so the expression is never null.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LangId.undResult else LangId.detect(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LangId.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          ${c.isNull} ? $helper.undResult() : $helper.detect(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  val name = "graft_langid"
  val info = new ExpressionInfo(classOf[LangId].getName, name)

  /** Same lists, same sorted-key order (= tie-break order) as
    * TextAnalysis.stopwords — read from it directly, and the two
    * surfaces are property-tested equal in NativeExprPropertySpec. */
  private val langs: Array[String] =
    graft.operators.TextAnalysis.stopwords.keys.toArray.sorted
  private val langResults: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  private val ZH = UTF8String.fromString("zh")
  private val UND = UTF8String.fromString("und")
  /** eval/codegen target for the NULL→"und" branch */
  def undResult(): UTF8String = UND

  /** token → bitmask over (lang lane × 10 + word slot) bits. A mask,
    * not a single index: shared function words ("la" is Spanish, French
    * AND Italian; "un"/"de"/"del" also recur) must score every language
    * whose list contains them. */
  private val wordBits: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    langs.zipWithIndex.foreach { case (lang, li) =>
      graft.operators.TextAnalysis.stopwords(lang).zipWithIndex.foreach {
        case (w, wi) =>
          val prev = m.getOrDefault(w, java.lang.Long.valueOf(0L)).longValue()
          m.put(w, java.lang.Long.valueOf(prev | (1L << (li * 10 + wi))))
      }
    }
    m
  }
  private val laneMask: Array[Long] =
    langs.indices.map(li => 0x3ffL << (li * 10)).toArray
  /** longest stopword — longer tokens skip the map probe entirely */
  private val maxLen: Int =
    graft.operators.TextAnalysis.stopwords.valuesIterator
      .flatten.map(_.length).max

  // Java-regex \s (the tokenizer contract of split(lower(text), "\\s+"))
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static codegen target. */
  def detect(s: UTF8String): UTF8String = {
    // toLowerCase first, matching lower(): stopword hits are case-folded
    // and CJK code units are case-stable so the single pass sees both
    val str = s.toLowerCase.toString
    val n = str.length
    var bits = 0L
    var cjk = false
    var i = 0
    while (i < n && !cjk) {
      val c = str.charAt(i)
      if (isWs(c)) i += 1
      else {
        var j = i
        while (j < n && !isWs(str.charAt(j))) {
          val cc = str.charAt(j)
          if (cc >= 0x4e00 && cc <= 0x9fff) cjk = true
          j += 1
        }
        if (j - i <= maxLen) {
          val mask = wordBits.get(str.substring(i, j))
          if (mask != null) bits |= mask.longValue()
        }
        i = j
      }
    }
    if (cjk) ZH
    else {
      var bestScore = 0
      var bestLang = -1
      var k = 0
      while (k < langs.length) {
        val sc = java.lang.Long.bitCount(bits & laneMask(k))
        if (sc > bestScore) { bestScore = sc; bestLang = k } // strict >: ties keep list order
        k += 1
      }
      if (bestScore > 0) langResults(bestLang) else UND
    }
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 1, children)
    LangId(children.head)
  }
}
