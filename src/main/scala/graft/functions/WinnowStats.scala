package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): the ENTIRE
  * per-document winnowing signature summary (l20) in one pass —
  * semantics bit-identical to the Column composition it replaces
  * (kept as `Dedup.winnowedFingerprintsComposed`, equality pinned in
  * NativeExprPropertySpec and by the unchanged DuckDB oracle):
  *
  *   grams(i) = substring(sha2(concat_ws(" ", slice(t, i+1, k)), 256), 1, 16)
  *              for i in 0..greatest(size(t)-k, 0), t = split(text, " ")
  *   wmin(i)  = min(grams(i..i+w-1))           (rows-following window)
  *   keep     = positions 0..greatest(#grams-w, 0)
  *   output   = (n_windows, n_fp = #distinct wmin, fp_min, fp_max)
  *
  * Why native: the composition materializes a gram STRING and a hex
  * digest per position, explodes one row per gram (~#tokens rows per
  * doc), and pays a doc-keyed EXCHANGE + sort for the window min plus a
  * second aggregation exchange for the per-doc stats — all to compute
  * a value that is a pure function of the document. Here the whole
  * query collapses to scan + project: token boundaries are byte
  * offsets into the text (a k-gram joined by single spaces IS the
  * original byte span, including empty tokens from repeated spaces,
  * so no gram string is ever built), the first 16 hex chars of
  * SHA-256 are the first 8 digest bytes kept as a long (lexicographic
  * hex order == unsigned long order, so min/max/distinct agree), and
  * the w-window min + distinct-count + extremes fold in document
  * order. The oracle-mandated SHA-256 per gram — the adjudicated
  * FLOORS.md cost — is unchanged; everything around it disappears.
  *
  * NULL text → NULL (callers filter nulls ahead, as before).
  */
case class WinnowStats(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if k > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs k > 0 and w > 0, got k=$k w=$w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = WinnowStats.schema

  override def prettyName: String = WinnowStats.name

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    WinnowStats.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WinnowStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $helper.compute($c, $k, $w);""")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

object WinnowStats {
  val name = "graft_winnow_stats"
  val info = new ExpressionInfo(classOf[WinnowStats].getName, name)

  val schema: StructType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_min", StringType, nullable = false),
    StructField("fp_max", StringType, nullable = false)))

  private val md = new ThreadLocal[(MessageDigest, Array[Byte])] {
    override def initialValue(): (MessageDigest, Array[Byte]) =
      (MessageDigest.getInstance("SHA-256"), new Array[Byte](32))
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def toHex16(v: Long): UTF8String = {
    val cs = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      cs(i) = HEX(((v >>> ((15 - i) << 2)) & 0xF).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  /** Static codegen target: one pass over the document bytes. */
  def compute(s: UTF8String, k: Int, w: Int): InternalRow = {
    val bytes = s.getBytes // one copy per DOC, not per gram
    val nb = bytes.length
    // token boundaries: split(text, " ") at limit -1 keeps empty tokens,
    // so boundaries are exactly the 0x20 byte positions
    var nTokens = 1
    var i = 0
    while (i < nb) { if (bytes(i) == 0x20) nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var tok = 0
    var from = 0
    i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == 0x20) {
        starts(tok) = from; ends(tok) = i; tok += 1; from = i + 1
      }
      i += 1
    }
    // gram i spans tokens i..min(i+k-1, last): the byte range between
    // their boundaries IS concat_ws(" ", slice(t, i+1, k)) because the
    // separators are the single spaces already in the text
    val gCount = math.max(nTokens - k, 0) + 1
    val fps = new Array[Long](gCount)
    val (digest, out) = md.get()
    i = 0
    while (i < gCount) {
      val a = starts(i)
      val b = ends(math.min(i + k - 1, nTokens - 1))
      digest.update(bytes, a, b - a)
      digest.digest(out, 0, 32) // resets; writes into the reused buffer
      // first 16 hex chars == first 8 digest bytes; unsigned long order
      // == lexicographic order of the zero-padded lowercase hex
      fps(i) = ((out(0) & 0xFFL) << 56) | ((out(1) & 0xFFL) << 48) |
        ((out(2) & 0xFFL) << 40) | ((out(3) & 0xFFL) << 32) |
        ((out(4) & 0xFFL) << 24) | ((out(5) & 0xFFL) << 16) |
        ((out(6) & 0xFFL) << 8) | (out(7) & 0xFFL)
      i += 1
    }
    val keep = math.max(gCount - w, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](math.max(4, keep * 2))
    var minFp = 0L
    var maxFp = 0L
    var first = true
    var pos = 0
    while (pos < keep) {
      val end = math.min(pos + w - 1, gCount - 1)
      var m = fps(pos)
      var j = pos + 1
      while (j <= end) {
        if (java.lang.Long.compareUnsigned(fps(j), m) < 0) m = fps(j)
        j += 1
      }
      seen.add(m)
      if (first || java.lang.Long.compareUnsigned(m, minFp) < 0) minFp = m
      if (first || java.lang.Long.compareUnsigned(m, maxFp) > 0) maxFp = m
      first = false
      pos += 1
    }
    new GenericInternalRow(Array[Any](
      keep.toLong, seen.size.toLong, toHex16(minFp), toHex16(maxFp)))
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 3, children)
    WinnowStats(children.head,
      FunctionBuilders.intLit(name, "k", children(1)),
      FunctionBuilders.intLit(name, "w", children(2)))
  }
}
