package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators (SURVEY §2B G1–G5): windowed and
  * session aggregations with watermarks, stateful dedup, arbitrary
  * per-key state. Batch-mode equivalents of G1/G2 are oracle-checked in
  * EventsTime; the time/late-data semantics here are asserted with
  * MemoryStream harnesses in StreamingSpec.
  *
  * Scale notes: every operator keys state by `user_id`-grade keys
  * (hash-partitioned state store, no global state); watermarks bound
  * state size; no collect/driver loops.
  */
object Streams {

  /** G1+G3: tumbling-window counts with a watermark — late rows beyond
    * the watermark are dropped; append mode emits only closed windows.
    * Input needs an event-time column `ts` (TimestampType). */
  def tumblingCounts(events: DataFrame, window_ : String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))

  /** G2: session windows (gap-merged) with watermark. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"), col("user_id"), col("n"))

  /** G4: stateful dedup by id within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** G6: stream-stream inner join (impression→click attribution shape).
    * BOTH the watermarks and the event-time range bound are load-bearing
    * at scale: they are what lets Spark age out buffered join state —
    * without the `clk_ts BETWEEN imp_ts AND imp_ts + horizon` constraint
    * the state store buffers both streams forever. Output columns:
    * impression + click ids and the click delay in seconds. */
  def clickAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      horizon: String = "15 minutes",
      impWatermark: String = "10 minutes",
      clkWatermark: String = "20 minutes",
      joinType: String = "inner"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", impWatermark)
    val clk = clicks.withWatermark("clk_ts", clkWatermark)
    // leftOuter: unmatched impressions emit null-padded ONLY once the
    // watermark proves no in-horizon click can still arrive — the
    // streaming-correct version of "count unconverted impressions"
    imp.join(clk,
      expr(s"""imp_user = clk_user
              |AND clk_ts >= imp_ts
              |AND clk_ts <= imp_ts + interval $horizon""".stripMargin),
      joinType)
      .select(col("imp_id"), col("clk_id"), col("imp_user").as("user_id"),
        (unix_timestamp(col("clk_ts")) - unix_timestamp(col("imp_ts"))).as("delay_s"))
  }

  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  case class UserCounter(user_id: Long, n_events: Long, total_value: Double)

  /** G5: arbitrary per-key running state via flatMapGroupsWithState —
    * emits the updated counter on every batch (Update mode).
    *
    * State for this operator has no event-time horizon (it's a lifetime
    * counter), so boundedness must come from a processing-time TTL: pass
    * `idleTtl=Some(...)` to evict keys idle longer than that (for
    * unbounded key populations this is mandatory — one state entry per
    * ever-seen user otherwise grows the store forever). `None` keeps
    * state for the life of the query (bounded key domains only); it is
    * the default because processing-time timers keep scheduling batches,
    * which test harnesses using `processAllAvailable` never see settle. */
  def runningUserCounters(
      events: Dataset[UserEvent],
      idleTtl: Option[String] = None): Dataset[UserCounter] = {
    implicit val counterEnc = Encoders.product[UserCounter]
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserCounter, UserCounter](
        OutputMode.Update(), timeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserCounter]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserCounter(userId, 0L, 0.0))
            var n = prev.n_events
            var tot = prev.total_value
            rows.foreach { e => n += 1; tot += e.value }
            val next = UserCounter(userId, n, tot)
            state.update(next)
            idleTtl.foreach(state.setTimeoutDuration)
            Iterator(next)
          }
      }
  }

  /** Streaming corpus ingest with incremental dedup against a durable
    * parquet history — the production LLM-ingest pattern. foreachBatch
    * rather than dropDuplicates-with-state because the state must (a)
    * survive restarts WITHOUT replay, (b) be readable by batch jobs
    * mid-stream, and (c) scale as a table (the engine's stream-state
    * store keys live in executor/RocksDB memory; a 100 TB corpus's
    * digest set does not).
    *
    * The history is NOT rescanned per batch. Dedup state is two
    * incrementally-maintained structures:
    *  - a driver-side bloom over digest hashes, seeded ONCE at stream
    *    start (size it with `expectedHistoryItems` — an undersized
    *    filter only costs extra exact checks, never correctness) and
    *    extended in place with each batch's novel digests;
    *  - a digest-only parquet SIDECAR (`historyDir + "_digests"`,
    *    created from one history pass if absent) that the exact
    *    anti-join probes — a pruned single-column scan, and only for
    *    the bloom-positive slice; a batch with no maybe-seen rows
    *    touches no history files at all.
    * In-batch duplicates collapse to their min id before the checks.
    *
    * Delivery: at-least-once. foreachBatch replays an epoch after a
    * crash, and the history/sidecar appends are not atomic — a failure
    * between them can re-append that batch's rows on recovery.
    * Exactly-once needs a transactional table format under the sink.
    *
    * The returned query must be stopped by the caller. `historyDir`
    * must exist with at least the schema written once (seed it with an
    * empty write if starting cold). */
  def dedupIngest(
      docs: DataFrame,
      historyDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      expectedHistoryItems: Long = 1L << 20,
      fpp: Double = 0.02): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.BloomJoin
    val sidecarDir = historyDir + "_digests"
    def digestOf(c: Column): Column = sha2(coalesce(c, lit("")), 256)
    val spark0 = docs.sparkSession
    graft.GraftFunctions.ensureRegistered(spark0)
    // one-time sidecar bootstrap: the only full history pass in the op
    val fs = new org.apache.hadoop.fs.Path(sidecarDir)
      .getFileSystem(spark0.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(sidecarDir)))
      spark0.read.parquet(historyDir)
        .select(digestOf(col(textCol)).as("digest")).distinct()
        .write.mode("overwrite").parquet(sidecarDir)
    // normalized to the canonical (expectedHistoryItems, fpp) geometry:
    // buildFilter substitutes a TINY match-nothing filter for an empty
    // history, which the per-batch executor-side bloom merge below
    // could not OR into (incompatible bitset geometry)
    val filter = org.apache.spark.util.sketch.BloomFilter
      .create(expectedHistoryItems, fpp)
    try filter.mergeInPlace(BloomJoin.buildFilter(
      spark0.read.parquet(sidecarDir)
        .select(xxhash64(col("digest")).as("k")),
      "k", expectedHistoryItems, fpp))
    catch {
      // the empty-history substitute: nothing to carry over
      case _: org.apache.spark.util.sketch.IncompatibleMergeException => ()
    }

    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val keyed = batch.withColumn("digest", digestOf(col(textCol)))
          .groupBy(col("digest")).agg(min(col(idCol)).as(idCol))
          .localCheckpoint(true) // tiny; reused by 2 filters + 2 joins
        val bloomBytes = BloomJoin.serialize(filter)
        val probe = BloomJoin.mightContain(xxhash64(col("digest")), bloomBytes)
        val maybeSeen = keyed.filter(probe)
        // bloom-positive slice pays the exact check; skip even the
        // pruned sidecar scan when the slice is empty
        val checked =
          if (maybeSeen.isEmpty) maybeSeen
          else maybeSeen.join(sp.read.parquet(sidecarDir), Seq("digest"), "left_anti")
        val novelKeys = keyed.filter(!probe).unionByName(checked)
          .localCheckpoint(true)
        if (!novelKeys.isEmpty) {
          // min-id row per novel digest, original schema
          batch.withColumn("digest", digestOf(col(textCol)))
            .join(novelKeys.select(col(idCol), col("digest")),
              Seq(idCol, "digest"), "left_semi")
            .drop("digest")
            .write.mode("append").parquet(historyDir)
          novelKeys.select(col("digest"))
            .write.mode("append").parquet(sidecarDir)
          // extend the driver-side bloom in place — same xxhash64 the
          // probe uses, so next batch's fast path sees these digests.
          // r13 (verdict #9): the extension builds per-partition blooms
          // EXECUTOR-side (same (n, fpp) geometry as `filter`, so the
          // bitsets are OR-compatible) and tree-merges them, so the
          // only driver-bound payload is one fixed-size bitset —
          // bounded by bloom geometry, not batch novelty (the old
          // collect() shipped one long per novel doc; a high-novelty
          // 100 TB batch would have made the driver the choke point).
          // Correctness never depended on this: the sidecar anti-join
          // above is the exact check, the bloom only prunes it.
          val novelBloom = novelKeys
            .select(xxhash64(col("digest")).as("k"))
            .rdd.mapPartitions { it =>
              val bf = org.apache.spark.util.sketch.BloomFilter
                .create(expectedHistoryItems, fpp)
              it.foreach(r => bf.putLong(r.getLong(0)))
              Iterator(bf)
            }.treeReduce({ (a, b) => a.mergeInPlace(b); a }, depth = 2)
          filter.mergeInPlace(novelBloom)
          ()
        }
      }
      .start()
  }
}
