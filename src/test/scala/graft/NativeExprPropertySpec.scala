package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Similarity}

/** Property tests for the two native Catalyst expressions: on generated
  * inputs the codegen'd one-pass forms must be bit-identical to their
  * HOF compositions (raw ScalaCheck generators with fixed seeds — the
  * scalatest↔scalacheck bridge isn't in the offline cache). */
class NativeExprPropertySpec extends SparkSpec {
  import spark.implicits._

  test("graft_minhash == HOF composition on generated shingle-hash arrays") {
    val arrGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.take(200))
    val rows = (1 to 60).map(seed =>
      Tuple1(arrGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))))
    val df = rows.toDF("hashes")
    for (k <- Seq(1, 16, 64)) {
      val both = df.select(
        Dedup.minHashSignatureFromHashes(col("hashes"), k).as("hof"),
        graft.GraftFunctions.minhashNative(spark, col("hashes"), k).as("native"))
      // null-symmetric compare: `hof =!= native` is NULL (filtered out)
      // when either side is NULL, which would hide a one-sided NULL
      val diff = both.filter(
        (col("hof").isNull =!= col("native").isNull) ||
          (col("hof").isNotNull && col("hof") =!= col("native"))).count()
      assert(diff == 0, s"k=$k")
      assert(both.filter(col("native").isNull).count() == 0)
    }
  }

  test("graft_cosine == HOF composition on generated same-length float vectors") {
    val vecGen = for {
      n <- Gen.chooseNum(1, 128)
      a <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
      b <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
    } yield (a, b)
    val rows = (1 to 80).map(seed =>
      vecGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      graft.GraftFunctions.cosineNative(spark, col("a"), col("b")).as("native"))
    // bit-identical doubles or both NULL (zero-norm guard)
    val diff = both.filter(
      (col("hof").isNull =!= col("native").isNull) ||
        (col("hof").isNotNull && col("hof") =!= col("native"))).count()
    assert(diff == 0)
  }
}
