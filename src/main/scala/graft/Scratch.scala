package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Timing scratchpad — round 11c. The completed sf10 matrix left the
  * per-row text kernels (l36 7.0×, l38 6.6×, l20 5.3×) as the largest
  * flat residual class, with l36/l38 growing ~1.4× over linear from
  * sf1→sf10 on the Spark side. Hypothesis: the exploded token streams
  * (100M+ rows at sf10) aggregate through shuffle.partitions=32 and
  * spill; on a cluster partitions scale with cores, so locally the A/B
  * is partitions 32 vs 128 in OWN sessions (the knob is static per
  * session — two sequential sessions, same JVM, alternating order to
  * cancel JIT warm-up bias). The g1/g14 sf10 probe set this replaces
  * lives in git history.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())

    def session(parts: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def time(s: SparkSession, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val qs = Seq("l36_bigram_lm_score", "l38_dsir_select", "l20_winnowing")
    val bests = scala.collection.mutable.Map[(String, Int), Double]()
      .withDefaultValue(1e9)
    // newSession shares the SparkContext but carries its own SQL conf —
    // shuffle.partitions is a runtime conf, so per-session values work
    val s32 = session(32)
    val s128 = s32.newSession()
    s128.conf.set("spark.sql.shuffle.partitions", 128)
    for (q <- qs) { time(s32, q); time(s128, q) } // warmup both paths
    for (rep <- 1 to 3; (tag, s) <- Seq((32, s32), (128, s128)); q <- qs) {
      val t = time(s, q)
      bests((q, tag)) = math.min(bests((q, tag)), t)
    }
    for (q <- qs)
      println(f"$q%-22s p32=${bests((q, 32))}%.2f  p128=${bests((q, 128))}%.2f")
    s32.stop()
  }
}
