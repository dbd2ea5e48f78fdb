package graft

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the Tables contract the driver has already broken once: after
  * `Tables(spark, dir, "events")`, `ts` is LongType epoch NANOSECONDS
  * no matter which physical encoding the driver's generator used.
  *
  * Round-5 incident: `events.parquet` silently moved from
  * TIMESTAMP(NANOS) (→ LongType under nanosAsLong) to TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (→ TimestampNTZType), and every `ts div N`
  * expression failed analysis. Fixtures below cover the three loadable
  * encodings; if a fourth appears, Tables throws with a pointer here
  * instead of letting 12 queries fail downstream.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01T00:00:07.179575Z — first ts of the driver's generator.
  private val micros  = 1704067207179575L
  private val nanos   = micros * 1000L

  private def roundTrip(write: String => Unit): (DataType, Long) = {
    val dir = tmpDir("graft-tables")
    write(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    val dt = df.schema("ts").dataType
    val v  = df.orderBy("event_id").select("ts").as[Long].head()
    (dt, v)
  }

  test("long (nanos) ts passes through unchanged") {
    val (dt, v) = roundTrip { path =>
      Seq((1L, nanos)).toDF("event_id", "ts").write.parquet(path)
    }
    assert(dt == LongType)
    assert(v == nanos)
  }

  test("timestamp_ntz (micros, isAdjustedToUTC=false) ts normalizes to nano-longs") {
    val ldt = LocalDateTime.ofEpochSecond(micros / 1000000L, ((micros % 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val (dt, v) = roundTrip { path =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
      spark.createDataFrame(
        java.util.List.of(Row(1L, ldt)), schema).write.parquet(path)
    }
    assert(dt == LongType)
    assert(v == nanos)
  }

  test("timestamp (micros, tz-adjusted) ts normalizes to nano-longs") {
    val inst = Instant.ofEpochSecond(micros / 1000000L, (micros % 1000000L) * 1000L)
    val (dt, v) = roundTrip { path =>
      Seq((1L, inst)).toDF("event_id", "ts").write.parquet(path)
    }
    assert(dt == LongType)
    assert(v == nanos)
  }

  test("the driver's actual events.parquet loads as nano-longs") {
    val df = Tables(spark, testdataRoot, "events")
    assert(df.schema("ts").dataType == LongType)
    // generator epoch starts 2024-01-01; sanity-band the first value
    val first = df.select("ts").as[Long].head()
    assert(first > 1700000000000000000L && first < 1900000000000000000L)
  }

  test("every testdata table loads and its critical arithmetic columns are usable") {
    // front-line drift alarm: a driver re-encode should fail HERE with
    // one clear message, not as dozens of downstream query failures
    for (name <- Tables.names) {
      val df = Tables(spark, testdataRoot, name)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.limit(1).collect().nonEmpty, s"$name is empty")
    }
    val emb = Tables(spark, testdataRoot, "embeddings")
    emb.schema("embedding").dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => // ok
      case other => fail(
        s"embeddings.embedding loaded as $other — the similarity surface " +
          "accepts array<float|double>; extend it (see CosineSimilarity)")
    }
    val ev = Tables(spark, testdataRoot, "events")
    for (c <- Seq("event_type", "props"))
      assert(ev.schema(c).dataType == StringType,
        s"events.$c drifted from string")
    for (c <- Seq("user_id", "value"))
      assert(ev.schema(c).dataType.isInstanceOf[NumericType],
        s"events.$c must stay numeric")
  }
}
