package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for a named list of queries, one file per
  * query, into a directory — the per-round optimization evidence trail
  * (plans/r13/<query>_before.txt / _after.txt). Usage:
  *
  *   sbt "runMain graft.PlanDirDump <outDir> <suffix> <q1,q2,...>"
  *
  * e.g. `runMain graft.PlanDirDump plans/r13 after j7_star_join,a2_distinct_agg`.
  * Plan shapes are SF-independent; dumps at sf0.001 like PlanDump.
  */
object PlanDirDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDirDump <outDir> <suffix> <q1,q2,...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Exception =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
