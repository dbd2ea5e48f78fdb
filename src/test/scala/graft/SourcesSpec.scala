package graft

import org.apache.spark.sql.functions._
import graft.sources.{AvroIO, ParquetIO, ParquetMeta}

class ParquetIOSpec extends SparkSpec {
  import spark.implicits._

  test("write modes: errorifexists throws on rewrite, overwrite succeeds, append doubles") {
    val dir = tmpDir("graft-modes") + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    ParquetIO.write(df, dir) // errorifexists default (reference R8 Mode.CREATE)
    intercept[Exception] { ParquetIO.write(df, dir) }
    ParquetIO.write(df, dir, mode = "overwrite")
    assert(spark.read.parquet(dir).count() == 2)
    ParquetIO.write(df, dir, mode = "append")
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("compression codecs round-trip") {
    for (codec <- Seq("snappy", "gzip", "zstd", "lz4", "none")) {
      val dir = tmpDir(s"graft-$codec") + "/t"
      val df = spark.read.parquet(sf("nation"))
      ParquetIO.write(df, dir, compression = codec)
      assert(spark.read.parquet(dir).count() == df.count(), codec)
    }
  }

  test("partitioned write prunes on read") {
    val dir = tmpDir("graft-part") + "/t"
    ParquetIO.write(spark.read.parquet(sf("orders")), dir,
      partitionCols = Seq("o_orderstatus"))
    val pruned = spark.read.parquet(dir).filter($"o_orderstatus" === "F")
    val expected = spark.read.parquet(sf("orders")).filter($"o_orderstatus" === "F").count()
    assert(pruned.count() == expected)
    // physical plan must show partition filters, not data filters only
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"))
  }

  test("footer metadata: row counts and row-group stats") {
    assert(ParquetMeta.rowCount(sf("lineitem")) == 6000)
    val stats = ParquetMeta.rowGroupStats(sf("lineitem"))
    assert(stats.map(_._1).sum == 6000)
    assert(stats.forall(_._3 >= 4)) // data starts after the PAR1 magic
    assert(ParquetMeta.createdBy(sf("lineitem")).exists(_.nonEmpty))
    // split → row-group mapping covers all groups exactly once
    val all = ParquetMeta.rowGroupsForSplit(sf("lineitem"), 0, Long.MaxValue / 2)
    assert(all == stats.indices.toSeq)
  }

  test("corrupt-date rescue: on/off/auto") {
    import java.sql.Date
    val dir = tmpDir("graft-dates") + "/t"
    // simulate a Drill-corrupted file: dates shifted forward 2×2440588 days
    val good = Seq((1, Date.valueOf("1995-06-17")), (2, Date.valueOf("2001-01-01")))
      .toDF("id", "d")
    val corrupted = good.withColumn("d",
      date_add($"d", ParquetIO.CorrectCorruptDateShiftDays))
    corrupted.write.parquet(dir)

    val fixed = ParquetIO.readCorruptDateAware(spark, dir, "on")
      .orderBy($"id").collect().map(_.getDate(1).toString)
    assert(fixed.toSeq == Seq("1995-06-17", "2001-01-01"))

    val off = ParquetIO.readCorruptDateAware(spark, dir, "off")
      .orderBy($"id").collect().map(_.getDate(1).toString)
    assert(off.head != "1995-06-17")

    // auto: stats probe sees year-7000ish dates from a parquet-mr writer → fix
    val auto = ParquetIO.readCorruptDateAware(spark, dir, "auto")
      .orderBy($"id").collect().map(_.getDate(1).toString)
    assert(auto.toSeq == Seq("1995-06-17", "2001-01-01"))

    // auto on a sane file: untouched
    val sane = tmpDir("graft-dates2") + "/t"
    good.write.parquet(sane)
    val kept = ParquetIO.readCorruptDateAware(spark, sane, "auto")
      .orderBy($"id").collect().map(_.getDate(1).toString)
    assert(kept.toSeq == Seq("1995-06-17", "2001-01-01"))
  }
}

class AvroIOSpec extends SparkSpec {

  test("reads the reference Avro fixture (R7)") {
    val df = AvroIO.read(spark, s"$refDir/3records.1.AVRO")
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "id2"))
    val rows = df.orderBy(col("id")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2", "3"))
    assert(rows.map(_.getSeq[String](1)).toSeq == Seq(Seq("1"), Seq("2"), Seq("3")))
  }

  test("avro → parquet round-trip matches the reference golden pair (R8)") {
    val avro = AvroIO.read(spark, s"$refDir/3records.1.AVRO")
    val out = tmpDir("graft-avro") + "/t"
    ParquetIO.write(avro, out) // snappy, errorifexists — LoadParquet.java:84-85
    val back = spark.read.parquet(out).orderBy(col("id")).collect()
    val golden = spark.read.parquet(s"$refDir/yolo.parquet").orderBy(col("id")).collect()
    assert(back.map(_.toString).toSeq == golden.map(_.toString).toSeq)
  }

  test("distributed avro read decodes on executors") {
    val df = AvroIO.readDistributed(spark, s"$refDir/3records.1.AVRO")
    assert(df.count() == 3)
    assert(df.select(col("id")).orderBy(col("id")).collect().map(_.getString(0)).toSeq ==
      Seq("1", "2", "3"))
  }
}
