package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY §7.3 preference (b), like
  * [[CosineSimilarity]]): the full MinHash signature in ONE pass over
  * the shingle-hash array.
  *
  * Bit-identical to the HOF composition in
  * `graft.operators.Dedup.minHashSignatureFromHashes` on every
  * NON-DEGENERATE input (`sig[h] = min over x of xxhash64(x, h)`, where
  * xxhash64 folds seed 42 → long x → int h), but with the loop order
  * inverted: one traversal of the data array updating all `numHashes`
  * minima, no per-plane intermediate arrays, no lambda dispatch. NULL
  * elements contribute the seed-only fold exactly like Spark's xxhash64
  * (null children leave the running hash unchanged). Degenerate inputs
  * DIVERGE deliberately: a NULL or empty hashes array yields NULL here,
  * where the HOF composition yields an array of `numHashes` NULL
  * elements (its outer transform runs over the plane sequence) — a
  * whole-signature NULL is the saner "no shingles" answer and cheaper
  * to filter on.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs numHashes > 0, got $numHashes")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> shingle hashes, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // xxhash64(x, h) = fold(seed 42 → long x → int h); a NULL x is
      // skipped by Spark's hash fold, leaving the seed
      val base = if (arr.isNullAt(i)) 42L else XXH64.hashLong(arr.getLong(i), 42L)
      var h = 0
      while (h < numHashes) {
        val hv = XXH64.hashInt(h, base)
        if (hv < sig(h)) sig(h) = hv
        h += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val hv = ctx.freshName("hv")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $base = $a.isNullAt($i) ? 42L : $xxh.hashLong($a.getLong($i), 42L);
         |    for (int $h = 0; $h < $numHashes; $h++) {
         |      long $hv = $xxh.hashInt($h, $base);
         |      if ($hv < $sig[$h]) $sig[$h] = $hv;
         |    }
         |  }
         |  ${ev.value} = new $gad($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val name = "graft_minhash"
  val info = new ExpressionInfo(classOf[MinHashSignature].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    FunctionBuilders.arity(name, 2, children)
    MinHashSignature(children.head,
      FunctionBuilders.intLit(name, "numHashes", children(1)))
  }
}
