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
    def timeT(name: String, reps: Int = 3)(f: => DataFrame): Double = {
      noop(f)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-52s min=${ts.min}%.3f")
      ts.min
    }

    import operators.Dedup

    def grams = Dedup.ngramRows(
      Tables(spark, sfDir, "documents").filter(col("doc_id") < 300),
      idCol = "doc_id", textCol = "text", n = 4)

    // exchange-lean withMins: ONE explicit repartition on u; the
    // groupBy and the join both ride it (subset-clustering rule)
    def withMinsLean(e: DataFrame): DataFrame = {
      val s = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val mins = s.groupBy(col("u")).agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      s.join(mins, "u")
    }
    def largeStar(wm: DataFrame => DataFrame)(e: DataFrame): DataFrame =
      wm(e).filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    def smallStar(wmf: DataFrame => DataFrame)(e: DataFrame): DataFrame = {
      val wm = wmf(e)
      wm.filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(wm.select(col("u"), col("m").as("v")).distinct())
        .filter(col("u") =!= col("v")).distinct()
    }
    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        graft.queries.QShared.splitSum(xxhash64(col("u"), col("v")), Seq(21, 42))).head()
      (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }

    def ccVariant(
        df: DataFrame,
        wm: DataFrame => DataFrame,
        probeEvery: Int): DataFrame = {
      val inc = df.select(col("id"), col("gram").as("bucket"))
        .localCheckpoint(true)
      val kmin = inc.groupBy(col("bucket")).agg(min(col("id")).as("m"))
      var edges = inc.join(kmin, "bucket").filter(col("id") =!= col("m"))
        .select(col("id").as("u"), col("m").as("v"))
        .distinct().localCheckpoint(false)
      var prev = checksum(edges)
      var converged = false
      var round = 0
      while (!converged && round < 50) {
        round += 1
        val ls = largeStar(wm)(edges).localCheckpoint(true)
        val next = smallStar(wm)(ls).localCheckpoint(round % probeEvery != 0)
        if (round % probeEvery == 0) {
          val sum = checksum(next)
          converged = sum == prev
          prev = sum
        }
        Dedup.unpersistCheckpoint(ls)
        Dedup.unpersistCheckpoint(edges)
        edges = next
      }
      println(s"[scratch]   rounds=$round")
      inc.select(col("id")).distinct()
        .join(edges.select(col("u").as("id"), col("v").as("label")), Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    }

    // one job per round: large-star inlined into the small-star plan
    // (ReuseExchange dedupes the shared wm subtree), lazy checkpoint
    // materialized by the checksum probe
    def ccFused1(df: DataFrame, wm: DataFrame => DataFrame): DataFrame = {
      val inc = df.select(col("id"), col("gram").as("bucket"))
        .localCheckpoint(true)
      val kmin = inc.groupBy(col("bucket")).agg(min(col("id")).as("m"))
      var edges = inc.join(kmin, "bucket").filter(col("id") =!= col("m"))
        .select(col("id").as("u"), col("m").as("v"))
        .distinct().localCheckpoint(false)
      var prev = checksum(edges)
      var converged = false
      var round = 0
      while (!converged && round < 50) {
        round += 1
        val next = smallStar(wm)(largeStar(wm)(edges)).localCheckpoint(false)
        val sum = checksum(next)
        converged = sum == prev
        prev = sum
        Dedup.unpersistCheckpoint(edges)
        edges = next
      }
      println(s"[scratch]   rounds=$round")
      inc.select(col("id")).distinct()
        .join(edges.select(col("u").as("id"), col("v").as("label")), Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    }

    def hashOf(df: DataFrame): String = {
      val r = df.agg(graft.queries.QShared.splitSum(
        xxhash64(col("id"), col("label")), Seq(21, 42))).head()
      s"${r.get(0)}"
    }

    println("[scratch] === l25 componentsByKey variants ===")
    val refHash = hashOf(Dedup.componentsByKey(grams, "id", "gram"))
    println(s"[scratch] ref hash=$refHash")

    timeT("cc current (Dedup.componentsByKey)") {
      Dedup.componentsByKey(grams, "id", "gram")
    }
    println(s"[scratch] lean s1 ok=${hashOf(ccVariant(grams, withMinsLean, 1)) == refHash}")
    timeT("cc lean-withMins probe1") { ccVariant(grams, withMinsLean, 1) }
    println(s"[scratch] lean s2 ok=${hashOf(ccVariant(grams, withMinsLean, 2)) == refHash}")
    timeT("cc lean-withMins probe2") { ccVariant(grams, withMinsLean, 2) }
    println(s"[scratch] fused1 ok=${hashOf(ccFused1(grams, withMinsLean)) == refHash}")
    timeT("cc fused1 (lean wm, 1 job/round)") { ccFused1(grams, withMinsLean) }

    println("[scratch] === l1g decomposition ===")
    val d = Tables(spark, sfDir, "documents")
    timeT("l1g full current") {
      Dedup.minHashLshClusters(d, "doc_id", "text")
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
    }
    timeT("l1g sig only") {
      d.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text")).as("sh"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("id"),
          GraftFunctions.minhashNative(spark, col("sh"), 64).as("sig"))
    }
    timeT("l1g sig+banding") {
      val sig = d.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text")).as("sh"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("id"),
          GraftFunctions.minhashNative(spark, col("sh"), 64).as("sig"))
      sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(15)), b =>
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), lit(42)))))
        .select(col("id"), concat_ws(":", col("pos"), col("col")).as("bucket"))
    }
    spark.stop()
  }
}
