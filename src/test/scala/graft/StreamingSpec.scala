package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** G3–G5 time-semantics tests (SURVEY §2B): watermark late-data drop,
  * stateful dedup within watermark, arbitrary running state — the
  * behaviors DuckDB cannot oracle. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class Imp(imp_id: Long, imp_user: Long, imp_ts: Timestamp)
  case class Clk(clk_id: Long, clk_user: Long, clk_ts: Timestamp)
  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "click", v: Double = 1.0) =
    Ev(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user, typ, v)

  test("G3: watermark drops late rows from closed windows (append mode)") {
    val in = MemoryStream[Ev](spark, 1)
    val q = Streams.tumblingCounts(in.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("g3").outputMode("append").start()
    try {
      in.addData(ev(1, 1), ev(2, 5))      // window [00:00,00:10)
      q.processAllAvailable()
      in.addData(ev(3, 25))               // watermark → 00:15, closes window 0
      q.processAllAvailable()
      in.addData(ev(4, 2))                // LATE: before watermark → dropped
      q.processAllAvailable()
      in.addData(ev(5, 45))               // close window [00:20,00:30) too
      q.processAllAvailable()
      val rows = spark.table("g3").collect()
      val w0 = rows.filter(_.getAs[Timestamp]("wstart").toString.contains("00:00:00"))
      assert(w0.length == 1)
      assert(w0.head.getAs[Long]("n") == 2, "late event must not be counted")
    } finally q.stop()
  }

  test("G4: dropDuplicatesWithinWatermark dedups by id") {
    val in = MemoryStream[Ev](spark, 1)
    val q = Streams.dedupWithinWatermark(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("g4").outputMode("append").start()
    try {
      in.addData(ev(1, 1), ev(1, 2), ev(2, 3)) // id 1 duplicated
      q.processAllAvailable()
      in.addData(ev(1, 4), ev(3, 5))           // id 1 again within watermark
      q.processAllAvailable()
      val ids = spark.table("g4").select($"event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("G5: flatMapGroupsWithState keeps running per-user counters") {
    val in = MemoryStream[Streams.UserEvent](spark, 1)
    val q = Streams.runningUserCounters(in.toDS())
      .writeStream.format("memory").queryName("g5").outputMode("update").start()
    try {
      in.addData(Streams.UserEvent(1, 1, 10.0), Streams.UserEvent(1, 2, 5.0),
        Streams.UserEvent(2, 3, 7.0))
      q.processAllAvailable()
      in.addData(Streams.UserEvent(1, 4, 1.0))
      q.processAllAvailable()
      // memory sink in update mode appends each update; take the last per user
      val last = spark.table("g5").collect()
        .map(r => (r.getAs[Long]("user_id"), (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(last(1L) == ((3L, 16.0)))
      assert(last(2L) == ((1L, 7.0)))
    } finally q.stop()
  }

  test("file-source stream: parquet dir → windowed agg → memory sink") {
    // end-to-end with a real file source (not MemoryStream): files
    // dropped into a directory are discovered, windowed, and aggregated
    val srcDir = tmpDir("graft-stream-src")
    val ckpt = tmpDir("graft-stream-ckpt")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def writeBatch(path: String, evs: Ev*): Unit =
      spark.createDataFrame(
        java.util.Arrays.asList(evs.map(e =>
          org.apache.spark.sql.Row(e.event_id, e.ts, e.user_id, e.event_type, e.value)): _*),
        schema).repartition(1).write.mode("overwrite").parquet(path)

    writeBatch(s"$srcDir/b1", ev(1, 1), ev(2, 5))
    val stream = spark.readStream.schema(schema).parquet(s"$srcDir/*")
    val q = Streams.tumblingCounts(stream, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("gfile").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      writeBatch(s"$srcDir/b2", ev(3, 25), ev(4, 45))
      q.processAllAvailable()
      writeBatch(s"$srcDir/b3", ev(5, 59))
      q.processAllAvailable()
      val rows = spark.table("gfile").collect()
      val w0 = rows.filter(_.getAs[Timestamp]("wstart").toString.contains("00:00:00"))
      assert(w0.length == 1 && w0.head.getAs[Long]("n") == 2)
    } finally q.stop()
  }

  test("parquet sink: windowed agg streams to files exactly-once via checkpoint") {
    // the durable end of the pipeline: append-mode windowed aggregate →
    // parquet files with a checkpoint; restartable exactly-once sink
    val sinkDir = tmpDir("graft-stream-sink")
    val ckpt = tmpDir("graft-stream-sink-ckpt")
    val in = MemoryStream[Ev](spark, 1)
    val q = Streams.tumblingCounts(in.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("parquet").outputMode("append")
      .option("path", sinkDir).option("checkpointLocation", ckpt).start()
    try {
      in.addData(ev(1, 1), ev(2, 5))   // window [00:00,00:10)
      q.processAllAvailable()
      in.addData(ev(3, 25))            // watermark → closes window 0
      q.processAllAvailable()
      in.addData(ev(4, 45))            // closes [00:20,00:30)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(sinkDir)
      .collect().map(r => (r.getAs[Timestamp]("wstart").toString, r.getAs[Long]("n")))
    assert(out.exists { case (w, n) => w.contains("00:00:00") && n == 2 },
      s"closed window must be durably written, got ${out.toSeq}")
    // append mode: only CLOSED windows are in the files
    assert(!out.exists(_._1.contains("00:40:00")), "open window must not be flushed")
  }

  test("G5b: transformWithState (Spark 4 arbitrary-state API) running counters") {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    class Counter extends StatefulProcessor[Long, Streams.UserEvent, Streams.UserCounter] {
      @transient private var state: ValueState[Streams.UserCounter] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[Streams.UserCounter](
          "counter", Encoders.product[Streams.UserCounter], TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[Streams.UserEvent],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Streams.UserCounter] = {
        val prev = Option(state.get()).getOrElse(Streams.UserCounter(key, 0L, 0.0))
        var n = prev.n_events
        var tot = prev.total_value
        rows.foreach { e => n += 1; tot += e.value }
        val next = Streams.UserCounter(key, n, tot)
        state.update(next)
        Iterator(next)
      }
    }

    // transformWithState needs the RocksDB state store (column families)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Streams.UserEvent](spark, 1)
    val out = in.toDS()
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Counter, org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())(Encoders.product[Streams.UserCounter])
    val q = out.writeStream.format("memory").queryName("g5b").outputMode("update").start()
    try {
      in.addData(Streams.UserEvent(1, 1, 10.0), Streams.UserEvent(1, 2, 5.0))
      q.processAllAvailable()
      in.addData(Streams.UserEvent(1, 3, 1.0))
      q.processAllAvailable()
      val last = spark.table("g5b").collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).maxBy(_._1)
      assert(last == ((3L, 16.0)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-static join: streaming events enriched with a static dimension") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val in = MemoryStream[Ev](spark, 1)
    val joined = in.toDF()
      .join(dim, Seq("user_id"), "left_outer") // static side broadcast per micro-batch
      .groupBy($"segment")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = joined.writeStream.format("memory").queryName("gdim")
      .outputMode("complete").start()
    try {
      in.addData(ev(1, 1, user = 1), ev(2, 2, user = 1), ev(3, 3, user = 2), ev(4, 4, user = 99))
      q.processAllAvailable()
      val m = spark.table("gdim").collect()
        .map(r => Option(r.getString(0)).getOrElse("none") -> r.getLong(1)).toMap
      assert(m == Map("gold" -> 2L, "silver" -> 1L, "none" -> 1L))
    } finally q.stop()
  }

  test("G6: stream-stream join attributes clicks within the horizon only") {
    def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    val imps = MemoryStream[Imp](spark, 1)
    val clks = MemoryStream[Clk](spark, 1)
    val q = Streams.clickAttribution(imps.toDF(), clks.toDF())
      .writeStream.format("memory").queryName("g6").outputMode("append").start()
    try {
      imps.addData(Imp(1, 1, t(0)), Imp(2, 2, t(1)))
      clks.addData(
        Clk(10, 1, t(5)),  // user 1: within 15 min → attributed
        Clk(11, 2, t(30)), // user 2: past the horizon → no match
        Clk(12, 3, t(6)))  // user 3: no impression → no match
      q.processAllAvailable()
      // advance both watermarks so joinable state closes and results emit
      // (distinct users so the advancing rows cannot join each other)
      imps.addData(Imp(99, 8, t(50)))
      clks.addData(Clk(99, 9, t(50)))
      q.processAllAvailable()
      val rows = spark.table("g6").collect()
        .map(r => (r.getAs[Long]("imp_id"), r.getAs[Long]("clk_id"), r.getAs[Long]("delay_s")))
      assert(rows.toSet == Set((1L, 10L, 300L)),
        s"only the in-horizon click attributes, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("G6b: outer stream-stream join emits unmatched impressions after watermark") {
    def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    val imps = MemoryStream[Imp](spark, 1)
    val clks = MemoryStream[Clk](spark, 1)
    val q = Streams.clickAttribution(imps.toDF(), clks.toDF(), joinType = "leftOuter")
      .writeStream.format("memory").queryName("g6b").outputMode("append").start()
    try {
      imps.addData(Imp(1, 1, t(0)), Imp(2, 2, t(1)))
      clks.addData(Clk(10, 1, t(5))) // user 1 converts; user 2 never does
      q.processAllAvailable()
      // push both watermarks far past imp 2's horizon so its state expires
      imps.addData(Imp(99, 8, t(55)))
      clks.addData(Clk(99, 9, t(55)))
      q.processAllAvailable()
      imps.addData(Imp(98, 8, t(59)))
      clks.addData(Clk(98, 9, t(59)))
      q.processAllAvailable()
      val rows = spark.table("g6b").collect()
        .map(r => (r.getAs[Long]("imp_id"), Option(r.getAs[java.lang.Long]("clk_id"))))
        .toSet
      assert(rows.contains((1L, Some(10L))), s"matched pair missing: $rows")
      assert(rows.contains((2L, None)),
        s"unmatched impression must emit null-padded after watermark: $rows")
    } finally q.stop()
  }

  test("G2 streaming session windows merge within gap") {
    val in = MemoryStream[Ev](spark, 1)
    val q = Streams.sessionCounts(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("g2s").outputMode("append").start()
    try {
      in.addData(ev(1, 1), ev(2, 5), ev(3, 30)) // (1,2) merge; 3 separate
      q.processAllAvailable()
      in.addData(ev(4, 59))                     // advance watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table("g2s").orderBy($"sstart").collect()
      assert(rows.length >= 2)
      assert(rows.head.getAs[Long]("n") == 2, "first session spans events 1+2")
    } finally q.stop()
  }

  test("streaming ingest dedups each micro-batch against the durable history") {
    val base = tmpDir("ingest")
    val hist = base + "/history"
    val ckpt = base + "/ckpt"
    // seed: history holds doc 1
    Seq((1L, "the original document")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(hist)
    val in = MemoryStream[(Long, String)](spark, 1)
    val q = Streams.dedupIngest(
      in.toDF().toDF("doc_id", "text"), hist, ckpt)
    try {
      // batch 1: a dup of the seeded doc + one novel doc
      in.addData((2L, "the original document"), (3L, "a brand new document"))
      q.processAllAvailable()
      // batch 2: a dup of batch 1's novel doc + one more novel doc +
      // an IN-BATCH dup pair (5/6) that must collapse to its min id
      in.addData((4L, "a brand new document"), (5L, "another novel one"),
        (6L, "another novel one"))
      q.processAllAvailable()
      val ids = spark.read.parquet(hist).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L),
        s"history must hold seed + first-seen of each content: $ids")
    } finally q.stop()
    // RESTART: a fresh query on the same dirs must re-seed its dedup
    // state from the digest sidecar — dups of pre-restart content stay
    // out, novel content still lands
    val in2 = MemoryStream[(Long, String)](spark, 1)
    val q2 = Streams.dedupIngest(
      in2.toDF().toDF("doc_id", "text"), hist, base + "/ckpt2")
    try {
      in2.addData((7L, "another novel one"), (8L, "post restart content"))
      q2.processAllAvailable()
      val ids2 = spark.read.parquet(hist).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids2 == Set(1L, 3L, 5L, 8L),
        s"restart must keep pre-restart digests deduped: $ids2")
    } finally q2.stop()
  }
}
