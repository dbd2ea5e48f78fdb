package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY §7.3 preference (b)): per-document
  * hashed-ngram bucket histogram — the DSIR (l38) feature kernel. For a
  * token array `ws` it counts, into 256 buckets, every unigram and every
  * adjacent "a b" bigram, where the bucket is the FIRST BYTE of
  * md5(utf8(gram)) — exactly the value the portable Column composition
  * computes as `(instr(hex, substring(md5(g),1,1))-1)*16 +
  * (instr(hex, substring(md5(g),2,1))-1)` (hex chars 1–2 ARE the first
  * digest byte). Pinned bit-identical to that composition in
  * NativeExprPropertySpec.
  *
  * Why native: the composition materializes every bigram STRING, hex
  * -encodes every digest, and explodes ~2 rows per token just to throw
  * them into a count — per-gram allocations in the corpus-scan hot
  * path. Here the digest runs over the token's existing UTF-8 bytes
  * (bigrams hash token-bytes + 0x20 + token-bytes, no concatenated
  * string is ever built), and the whole document collapses to one
  * 256-int row — so the DSIR score pass needs NO explode and NO
  * exchange at all.
  *
  * NULL array → NULL. NULL ELEMENTS cannot occur from `split` (the only
  * producer in this repo); for totality they are skipped, along with the
  * two bigrams they would participate in.
  *
  * `xxh = true` is the l38b PRODUCTION twin's bucket hash: the first
  * byte of xxhash64(gram bytes, seed 42) — Spark's own codegen'd hash —
  * instead of md5. DSIR needs A uniform hashed-ngram bucketing, not
  * md5 specifically (Xie et al. hash grams into a fixed bucket count);
  * md5 is what the one-shot portable ORACLE can express, and its
  * intrinsic digest is l38's measured 1.9×-at-sf10 floor (BASELINE.md
  * r11d(5): a hand-rolled MD5 LOSES to the intrinsic — the algorithm,
  * not the call overhead, is the cost). The twin keeps l38 oracle-exact
  * and ships the same selection pipeline on the cheap hash;
  * distribution equivalence (same n_feat per doc, same histogram mass,
  * comparable bucket spread) is pinned in OperatorsSpec.
  */
case class DsirBuckets(child: Expression, xxh: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = DsirBuckets.name

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    if (xxh) DsirBuckets.computeXxh(input.asInstanceOf[ArrayData])
    else DsirBuckets.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DsirBuckets.getClass.getName.stripSuffix("$")
    val fn = if (xxh) "computeXxh" else "compute"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $helper.$fn($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)

  override def sql: String =
    s"${prettyName}(${child.sql}${if (xxh) ", true" else ""})"
}

object DsirBuckets {
  val name = "graft_dsir_buckets"
  val info = new ExpressionInfo(classOf[DsirBuckets].getName, name)

  private val SPACE = Array[Byte](' ')

  private val md = new ThreadLocal[(MessageDigest, Array[Byte])] {
    override def initialValue(): (MessageDigest, Array[Byte]) =
      (MessageDigest.getInstance("MD5"), new Array[Byte](16))
  }

  /** Static codegen target: one pass over the token array. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new Array[Int](256)
    val (digest, out) = md.get()
    def bucketOf(a: UTF8String, b: UTF8String): Int = {
      digest.update(a.getBytes)
      if (b != null) { digest.update(SPACE); digest.update(b.getBytes) }
      digest.digest(out, 0, 16) // resets; writes into the reused buffer
      // first digest byte == the composition's two leading hex chars
      out(0) & 0xFF
    }
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        counts(bucketOf(tok, null)) += 1
        if (i + 1 < n && !arr.isNullAt(i + 1))
          counts(bucketOf(tok, arr.getUTF8String(i + 1))) += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(counts)
  }

  /** xxhash64 bucket twin of [[compute]]: same gram walk (unigrams +
    * adjacent bigrams over "a b" bytes), bucket = low byte of
    * xxhash64(bytes, seed 42) — seed 42 matches the SQL xxhash64()
    * default, so the value is independently checkable from SQL. The
    * bigram's token+space+token bytes are staged in a reused
    * thread-local buffer (XXH64 here is one-shot over a contiguous
    * region; the copy is cheap next to any digest). */
  def computeXxh(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new Array[Int](256)
    var buf = xxhBuf.get()
    def bucket(s: UTF8String): Int =
      (org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L) & 0xFF).toInt
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        counts(bucket(tok)) += 1
        if (i + 1 < n && !arr.isNullAt(i + 1)) {
          val nxt = arr.getUTF8String(i + 1)
          val la = tok.numBytes(); val lb = nxt.numBytes()
          val len = la + 1 + lb
          if (buf.length < len) {
            buf = new Array[Byte](Integer.highestOneBit(len) * 2)
            xxhBuf.set(buf)
          }
          tok.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET)
          buf(la) = ' '
          nxt.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + la + 1)
          counts((org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
            & 0xFF).toInt) += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(counts)
  }

  private val xxhBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arityIn(name, Seq(1, 2), children)
    val xxh =
      if (children.length < 2) false
      else FunctionBuilders.boolLit(name, "xxh", children(1))
    DsirBuckets(children.head, xxh)
  }
}
