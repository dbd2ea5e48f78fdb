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
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Double = {
      noop(df)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-52s min=${ts.min}%.3f")
      ts.min
    }

    // l38: is the shared (id,tgt,b) pre-agg exchange actually reused?
    val q = SparkEntry.queries("l38_dsir_select")(spark, sfDir)
    time("l38 current") { SparkEntry.queries("l38_dsir_select")(spark, sfDir) }

    // the md5 floor alone: one pass, hash every gram, count
    val docs = Tables(spark, sfDir, "documents")
    time("gram md5 floor (one pass)") {
      docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
        .select(col("id"), explode(concat(
          col("ws"),
          when(size(col("ws")) >= 2,
            transform(sequence(lit(1), size(col("ws")) - 1),
              i => concat_ws(" ",
                element_at(col("ws"), i), element_at(col("ws"), i + 1))))
            .otherwise(typedlit(Array.empty[String])))).as("g"))
        .withColumn("b", expr(
          "(instr('0123456789abcdef', substring(md5(g), 1, 1)) - 1) * 16" +
            " + (instr('0123456789abcdef', substring(md5(g), 2, 1)) - 1)"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
    }

    spark.stop()
  }
}
