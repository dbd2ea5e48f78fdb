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
}
