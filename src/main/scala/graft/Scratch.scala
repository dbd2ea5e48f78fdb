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

    def timeN(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s (rows=$n)")
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val e = emb.crossJoin(spark.range(16).toDF("__rep"))
      .withColumn("vec_id", col("vec_id") * 16 + col("__rep"))
      .drop("__rep").cache()
    e.count()
    val vecs = e.select(col("vec_id").as("id"), col("embedding").as("v"))
      .filter(col("v").isNotNull)

    for (k <- Seq(128, 1024)) {
      val seeds: Array[(Long, Array[Double])] = vecs
        .orderBy(col("id").asc_nulls_first).limit(k).collect()
        .map(r => (r.getAs[Number](0).longValue,
          r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toArray))
      // dense assignment only
      val centLit = array(seeds.map(s => typedlit(s._2).cast("array<double>")): _*)
      val cidLit = typedlit(seeds.map(_._1))
      timeN(s"assign-only dense k=$k") {
        val sims = transform(centLit,
          c => round(GraftFunctions.cosineNative(spark, col("v"), c), 6))
        vecs.withColumn("__sims", sims)
          .withColumn("cluster",
            coalesce(element_at(cidLit,
              array_position(col("__sims"), array_max(col("__sims"))).cast("int")),
              lit(seeds.map(_._1).min)))
          .groupBy(col("cluster")).count().count()
      }
      // ann assignment only (via the operator with tau below any cosine:
      // every pair >= tau... no: tau = -3 means EVERY pair is a dup ->
      // semi-join short-circuits on the FIRST candidate = cheap) —
      // isolates assignment + O(1) join work
      timeN(s"full ann  tau=-3 k=$k") {
        operators.Similarity.semDedupAnn(e, "vec_id", "embedding",
          k = k, tau = -3.0).count()
      }
      timeN(s"full dense tau=-3 k=$k") {
        operators.Similarity.semDedup(e, "vec_id", "embedding",
          k = k, tau = -3.0).count()
      }
    }
    spark.stop()
  }
}
