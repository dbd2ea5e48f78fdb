package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR. Prints the full per-query JSON line, then a short
  * parse-safe summary line last (the driver tail-captures stdout).
  *
  * Method: one warmup execution of the flagship query (JIT + codegen
  * caches), then each query executed once against a `noop` sink — full
  * materialization of every operator with zero sink cost, so the number
  * is the query, not the write. Session mirrors Engine.session: AQE on,
  * shuffle partitions sized to cores (not 200 — at sf0.1 oversized
  * shuffles are pure scheduling overhead; on a real cluster this knob
  * scales with executor count).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: flagship + one write-path query (JIT, codegen, FS caches)
    runOnce("a1_agg_q1")

    val names = SparkEntry.all.map(_.name)
    val results = names.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // The driver captures only a tail window of stdout, so a single ~2 KB
    // line gets its head truncated and fails to parse. Full per-query
    // detail goes to a file; the LAST stdout line is a short JSON summary
    // with the slowest 5 queries inlined.
    val detail = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // best-effort: an unwritable CWD must not lose the stdout lines the
    // driver parses after the whole benchmark already ran
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"), detail.getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] detail file not written: $e") }
    val top5 = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(detail)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${names.size},"slowest":$top5,"detail":"bench_detail.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
