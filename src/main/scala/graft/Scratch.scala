package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing scratchpad — round 11d (final state). A/B harness for the
  * text-kernel rewrites: the pre-rewrite l36/l38 shapes inlined
  * verbatim from git history, the shipped shapes, and the sf10
  * decomposition probes (l36 broadcast-vs-shuffle; l38 hist vs
  * unfused fit). Results, all recorded in BASELINE.md r11d with rows
  * verified identical before timing: l36 old 6.2–7.2 → 3.5–3.8 s at
  * sf1, then 53.1 → 11.1 s at sf10 with the model broadcast (shipped
  * as the stats-gated QDef); l38 6.0–6.1 → 1.4 s at sf1 (hist
  * checkpoint + vec_dot), the unfused fit re-measuring 31.4 vs 13.7 s
  * at sf10; the l36 gram-stream checkpoint variant (l36Chk) measured
  * WORSE (4.78 vs 4.03) — the rescan-beats-materialize negative. The
  * l20 native-vs-composed probe lives one Scratch revision back
  * (5.398 → 0.475 s at sf1).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = Tables(spark, dir, "documents")

    // ---- l36 old shape (pre-r11d, verbatim) ----
    def l36Old(): DataFrame = {
      val toks = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
      val bigrams = toks.filter(size(col("ws")) >= 2)
        .select(col("id"), explode(transform(
          sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("prev"),
            element_at(col("ws"), i + 1).as("cur")))).as("b"))
        .select(col("id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
      val uni = toks.select(explode(col("ws")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      val total = uni.agg(sum(col("cu")).as("n"))
      val big = bigrams.groupBy(col("prev"), col("cur"))
        .agg(count(lit(1)).as("cb"))
      val scored = big
        .join(uni.select(col("w").as("prev"), col("cu").as("cup")), Seq("prev"))
        .join(uni.select(col("w").as("cur"), col("cu").as("cuc")), Seq("cur"))
        .crossJoin(broadcast(total))
        .select(col("prev"), col("cur"),
          floor(log(
            lit(0.75) * col("cb").cast("double") / col("cup") +
              lit(0.25) * col("cuc").cast("double") / col("n")) * 1e6)
            .as("lp"))
      bigrams
        .join(scored, Seq("prev", "cur"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"),
          floor(sum(col("lp")).cast("double") / count(lit(1)))
            .as("lm2_score_micro"))
        .withColumnRenamed("id", "doc_id")
    }
    def l36New(): DataFrame =
      operators.TextAnalysis.bigramLmScore(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")

    // variant B: gram stream checkpointed (the l41 gramStream precedent)
    def l36Chk(): DataFrame = {
      val base = docs.filter(col("text").isNotNull)
      val bigrams = base.select(col("doc_id").as("id"),
        explode(graft.GraftFunctions
          .gramSpansNative(spark, col("text"), 2, clamp = false)).as("g"))
        .localCheckpoint(false)
      val uni = base.select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      val total = uni.agg(sum(col("cu")).as("n"))
      val big = bigrams.groupBy(col("g")).agg(count(lit(1)).as("cb"))
      val scored = big
        .withColumn("prev", substring_index(col("g"), " ", 1))
        .withColumn("cur", expr("substring(g, instr(g, ' ') + 1)"))
        .join(uni.select(col("w").as("prev"), col("cu").as("cup")), Seq("prev"))
        .join(uni.select(col("w").as("cur"), col("cu").as("cuc")), Seq("cur"))
        .crossJoin(broadcast(total))
        .select(col("g"),
          floor(log(
            lit(0.75) * col("cb").cast("double") / col("cup") +
              lit(0.25) * col("cuc").cast("double") / col("n")) * 1e6)
            .as("lp"))
      bigrams
        .join(scored, Seq("g"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"),
          floor(sum(col("lp")).cast("double") / count(lit(1)))
            .as("lm2_score_micro"))
        .withColumnRenamed("id", "doc_id")
    }

    // ---- l38 old shape (pre-r11d, verbatim) ----
    def l38Old(): DataFrame = {
      val isTarget = col("lang") === "en"
      def hist(withTgt: Boolean): DataFrame = {
        val lead = Seq(col("doc_id").as("id")) ++
          (if (withTgt) Seq(isTarget.as("tgt")) else Nil)
        docs.filter(col("text").isNotNull)
          .select(lead :+ graft.GraftFunctions
            .dsirBucketsNative(spark, split(col("text"), " ")).as("counts"): _*)
      }
      val statsRows = hist(withTgt = true)
        .select(col("tgt"), posexplode(col("counts")).as(Seq("b", "c")))
        .filter(col("c") > 0)
        .groupBy(col("b"))
        .agg(sum(col("c")).as("cs"),
          sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val ns = statsRows.map(_._2).sum
      val nt = statsRows.map(_._3).sum
      val dlogm = new Array[Long](256)
      statsRows.foreach { case (b, cs, ct) =>
        dlogm(b) =
          math.floor(math.log((ct + 1).toDouble / (nt + 256).toDouble) * 1e6).toLong -
            math.floor(math.log((cs + 1).toDouble / (ns + 256).toDouble) * 1e6).toLong
      }
      val u = (pmod(col("id") * 48271L + 11L, lit(2147483647L)) + 1L)
        .cast("double") / 2147483648.0
      hist(withTgt = false)
        .select(col("id"),
          aggregate(col("counts"), lit(0L),
            (acc, c) => acc + c).as("n_feat"),
          aggregate(zip_with(col("counts"), typedlit(dlogm.toSeq),
              (c, d) => c.cast("long") * d),
            lit(0L), (acc, x) => acc + x).as("weight_micro"))
        .withColumn("gkey_micro",
          col("weight_micro") +
            floor(-log(-log(u)) * 1e6).cast("long"))
        .orderBy(col("gkey_micro").desc, col("id").asc)
        .limit(200)
        .withColumnRenamed("id", "doc_id")
    }
    def l38New(): DataFrame =
      operators.TextAnalysis.dsirWeights(
        docs, "doc_id", "text", col("lang") === "en", topK = 200)
        .withColumnRenamed("id", "doc_id")

    def rowDiff(a: DataFrame, b: DataFrame, cols: Seq[String]): Long = {
      val bb = b.withColumnsRenamed(cols.map(c => c -> s"__$c").toMap)
      a.join(bb, Seq("doc_id"), "full_outer")
        .filter(cols.map(c => !(col(c) <=> col(s"__$c"))).reduce(_ || _))
        .count()
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val b1t = {
      val t0 = System.nanoTime()
      spark.sql("select 1").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // sf10 decomposition probes
    def l36Bcast(): DataFrame = {
      val base = docs.filter(col("text").isNotNull)
      def bigrams = base.select(col("doc_id").as("id"),
        explode(graft.GraftFunctions
          .gramSpansNative(spark, col("text"), 2, clamp = false)).as("g"))
      val uni = base.select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      val total = uni.agg(sum(col("cu")).as("n"))
      val big = bigrams.groupBy(col("g")).agg(count(lit(1)).as("cb"))
      val scored = big
        .withColumn("prev", substring_index(col("g"), " ", 1))
        .withColumn("cur", expr("substring(g, instr(g, ' ') + 1)"))
        .join(uni.select(col("w").as("prev"), col("cu").as("cup")), Seq("prev"))
        .join(uni.select(col("w").as("cur"), col("cu").as("cuc")), Seq("cur"))
        .crossJoin(broadcast(total))
        .select(col("g"),
          floor(log(
            lit(0.75) * col("cb").cast("double") / col("cup") +
              lit(0.25) * col("cuc").cast("double") / col("n")) * 1e6)
            .as("lp"))
      bigrams
        .join(broadcast(scored), Seq("g"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"),
          floor(sum(col("lp")).cast("double") / count(lit(1)))
            .as("lm2_score_micro"))
        .withColumnRenamed("id", "doc_id")
    }
    // l38 pieces: histogram build alone, fit aggregation alone
    def l38Hist(): DataFrame =
      docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), (col("lang") === "en").as("tgt"),
          graft.GraftFunctions
            .dsirBucketsNative(spark, split(col("text"), " ")).as("counts"))
    def l38Fit(): DataFrame =
      l38Hist()
        .select(col("tgt"), posexplode(col("counts")).as(Seq("b", "c")))
        .filter(col("c") > 0)
        .groupBy(col("b"))
        .agg(sum(col("c")).as("cs"),
          sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"))
    println("l36bcast row-diff (must be 0): " +
      rowDiff(l36Bcast(), l36New(), Seq("n_bigrams", "lm2_score_micro")))
    for ((tag, nf, of) <- Seq(
        ("l36bcast_vs_new", () => l36Bcast(), () => l36New()),
        ("l38hist_vs_fit", () => l38Hist(), () => l38Fit()),
        ("l38", () => l38New(), () => l38Old()))) {
      time(nf); time(of) // warmup both paths
      var bn = 1e9; var bo = 1e9
      for (_ <- 1 to 3) {
        bn = math.min(bn, time(nf))
        bo = math.min(bo, time(of))
      }
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      println(f"$tag%-4s new=$bn%.3f  old=$bo%.3f  (b1=$b1t%.3f load=$load%.2f sf=$dir)")
    }
    spark.stop()
  }
}
