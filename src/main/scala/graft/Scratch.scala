package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad for the current optimization target. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeT(name: String, reps: Int = 5)(f: => DataFrame): Double = {
      noop(f)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-48s min=${ts.min}%.3f")
      ts.min
    }

    import operators.Dedup
    val d = Tables(spark, sfDir, "documents")

    def clusters(stringKey: Boolean): DataFrame = {
      val sig = d.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text")).as("sh"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("id"),
          GraftFunctions.minhashNative(spark, col("sh"), 64).as("sig"))
      val key =
        if (stringKey) concat_ws(":", col("pos"), col("col"))
        else xxhash64(col("col"), col("pos"))
      val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(15)), b =>
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), lit(42)))))
        .select(col("id"), key.as("bucket"))
      val labels = Dedup.propagateMinLabels(banded, 20)
      labels.groupBy(col("label")).agg(count(lit(1)).as("n_docs"))
    }
    timeT("l1g string bucket key") { clusters(true) }
    timeT("l1g long bucket key") { clusters(false) }
    timeT("l1g string bucket key (2)") { clusters(true) }
    timeT("l1g long bucket key (2)") { clusters(false) }
    spark.stop()
  }
}
