package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom-prefiltered semi-join (operators.BloomJoin +
  * functions.BloomMightContain): exactness vs the plain semi-join, the
  * no-false-negative guarantee, selectivity of the prefilter, and SQL
  * registration of the native predicate.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain left-semi join exactly") {
    val fact = spark.read.parquet(sf("lineitem"))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
    val dim = spark.read.parquet(sf("part")).filter($"p_size" > 40)

    val viaBloom = BloomJoin.bloomSemiJoin(fact, dim, "l_partkey", "p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
    val plain = fact.join(
      dim.select($"p_partkey"), $"l_partkey" === $"p_partkey", "left_semi")

    assert(viaBloom.count() === plain.count())
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("filter has no false negatives and stays near its fpp") {
    val keys = (0L until 2000L by 2).toDF("k") // evens only
    val bloom = BloomJoin.buildFilter(keys, "k", expectedItems = 2000, fpp = 0.01)
    val bytes = BloomJoin.serialize(bloom)

    val probe = (0L until 2000L).toDF("k")
      .withColumn("hit", BloomJoin.mightContain($"k", bytes))
    // every inserted key must hit (bloom contract: zero false negatives)
    assert(probe.filter($"k" % 2 === 0 && !$"hit").count() === 0)
    // absent keys (odds) hit only at ~fpp — allow generous slack
    val falsePos = probe.filter($"k" % 2 === 1 && $"hit").count()
    assert(falsePos <= 100, s"false-positive count $falsePos way over fpp")
  }

  test("NULL keys never pass the prefilter") {
    val bloom = BloomJoin.buildFilter(Seq(1L, 2L).toDF("k"), "k", 100, 0.01)
    val bytes = BloomJoin.serialize(bloom)
    val df = Seq(Some(1L), None, Some(99L)).toDF("k")
      .filter(BloomJoin.mightContain($"k", bytes))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("graft_bloom_contains registers for SQL and rejects non-literal filters") {
    GraftFunctions.ensureRegistered(spark)
    val bytes = BloomJoin.serialize(
      BloomJoin.buildFilter(Seq(7L).toDF("k"), "k", 10, 0.01))
    val hex = bytes.map("%02x".format(_)).mkString
    val hit = spark.sql(
      s"SELECT graft_bloom_contains(7L, x'$hex') AS h").head().getBoolean(0)
    assert(hit)
    // a non-literal filter argument must be rejected at analysis
    val err = intercept[Exception] {
      Seq((1L, bytes)).toDF("k", "f")
        .selectExpr("graft_bloom_contains(k, f)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("interpreted eval matches codegen") {
    // predicate inside a CASE WHEN forces interpreted fallback coverage
    // via eval(); direct filter goes through doGenCode — both paths must
    // agree on hits, misses, and NULL
    val bytes = BloomJoin.serialize(
      BloomJoin.buildFilter((0L until 100L).toDF("k"), "k", 100, 0.01))
    val df = Seq(Some(5L), Some(5000L), None).toDF("k")
    val viaFilter = df.filter(BloomJoin.mightContain($"k", bytes)).count()
    val viaEval = df.select(BloomJoin.mightContain($"k", bytes).as("h"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaFilter === viaEval.count(identity))
    assert(viaEval(1) === false && viaEval(2) === false)
  }
}
