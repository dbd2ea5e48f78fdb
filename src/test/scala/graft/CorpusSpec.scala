package graft

import org.apache.spark.sql.functions._

/** Corpus compatibility suite (SURVEY §5.2 item 1): every readable file
  * in the reference's parquet-testing corpus reads with the expected
  * row count; broken files fail gracefully; encrypted files read with
  * the published keys and fail without them. */
class CorpusSpec extends SparkSpec {

  private val expectedRows = Seq(
    "alltypes_plain.parquet" -> 8L,
    "alltypes_plain.snappy.parquet" -> 2L,
    "alltypes_dictionary.parquet" -> 2L,
    "int32_decimal.parquet" -> 24L,
    "int64_decimal.parquet" -> 24L,
    "fixed_length_decimal.parquet" -> 24L,
    "fixed_length_decimal_legacy.parquet" -> 24L,
    "binary.parquet" -> 12L,
    "single_nan.parquet" -> 1L,
    "nulls.snappy.parquet" -> 8L,
    "list_columns.parquet" -> 3L,
    "nested_lists.snappy.parquet" -> 3L,
    "nested_maps.snappy.parquet" -> 6L,
    "nested_structs.rust.parquet" -> 1L,
    "nonnullable.impala.parquet" -> 1L,
    "nullable.impala.parquet" -> 7L,
    "datapage_v2.snappy.parquet" -> 5L,
    "hadoop_lz4_compressed.parquet" -> 4L,
    "hadoop_lz4_compressed_larger.parquet" -> 10000L,
    "dict-page-offset-zero.parquet" -> 39L,
    "yolo.parquet" -> 3L,
    "parquet-variety/arrays.parquet" -> 8L,
    "parquet-variety/custom.parquet" -> 75L)

  for ((file, n) <- expectedRows) {
    test(s"reads $file ($n rows)") {
      val df = spark.read.parquet(s"$refDir/$file")
      assert(df.count() == n)
      if (n > 0) assert(df.limit(1).collect().nonEmpty)
    }
  }

  test("BINARY-backed decimal reads via the row-wise reader") {
    // Spark's vectorized reader rejects DECIMAL on plain BINARY; the
    // parquet-mr row path (same library the reference uses) handles it.
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    try {
      val df = spark.read.parquet(s"$refDir/byte_array_decimal.parquet")
      assert(df.count() == 24)
      assert(df.schema("value").dataType.simpleString == "decimal(4,2)")
    } finally spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
  }

  test("repeated_no_annotation: legacy unannotated repeated groups read (6 rows)") {
    // pyarrow reports 0 rows for this fixture (its legacy-repeated
    // handling); the footer says 6 and Spark reads all 6 with data.
    val df = spark.read.parquet(s"$refDir/repeated_no_annotation.parquet")
    assert(df.count() == 6)
    assert(graft.sources.ParquetMeta.rowCount(s"$refDir/repeated_no_annotation.parquet") == 6L)
    assert(df.schema.fieldNames.toSeq == Seq("id", "phoneNumbers"))
  }

  test("raw-frame (non-hadoop) LZ4 fails gracefully — parquet-mr parity") {
    // parquet-cpp writes LZ4 raw frames the java LZ4 codec cannot decode;
    // the reference (also parquet-mr) has the same limitation. Contract:
    // clean error, not a crash or wrong data.
    intercept[Throwable] {
      spark.read.parquet(s"$refDir/non_hadoop_lz4_compressed.parquet").collect()
    }
  }

  test("alltypes_plain: exact primitive values (pyarrow golden)") {
    val r = spark.read.parquet(s"$refDir/alltypes_plain.parquet")
      .select(col("id"), col("bool_col"), col("int_col"), col("double_col"),
        col("date_string_col").cast("string"))
      .orderBy(col("id")).collect()
    assert(r.length == 8)
    assert((r(0).getInt(0), r(0).getBoolean(1), r(0).getInt(2), r(0).getDouble(3),
      r(0).getString(4)) == ((0, true, 0, 0.0, "01/01/09")))
    val four = r.find(_.getInt(0) == 4).get
    assert((four.getBoolean(1), four.getInt(2), four.getDouble(3), four.getString(4)) ==
      ((true, 0, 0.0, "03/01/09")))
    val five = r.find(_.getInt(0) == 5).get
    assert((five.getBoolean(1), five.getInt(2), five.getDouble(3)) == ((false, 1, 10.1)))
  }

  test("INT96 impala timestamps decode to TimestampType") {
    val df = spark.read.parquet(s"$refDir/alltypes_plain.parquet")
    assert(df.schema("timestamp_col").dataType.typeName == "timestamp")
    val ts = df.select(date_format(min(col("timestamp_col")), "yyyy-MM-dd")).collect()(0).getString(0)
    assert(ts.startsWith("2009"))
  }

  test("uint64 maps to Decimal(20,0)") {
    val df = spark.read.parquet(s"$refDir/nested_structs.rust.parquet")
    val countField = df.schema.fields.flatMap { f =>
      f.dataType match {
        case st: org.apache.spark.sql.types.StructType => st.fields.find(_.name == "count")
        case _ => None
      }
    }.head
    assert(countField.dataType.simpleString == "decimal(20,0)")
  }

  test("NaN is a value, not NULL") {
    val r = spark.read.parquet(s"$refDir/single_nan.parquet").collect()
    assert(r.length == 1)
    // the fixture's one row holds a NULL (pyarrow agrees); assert we
    // don't turn it into NaN
    assert(r(0).isNullAt(0) || r(0).getDouble(0).isNaN)
  }

  test("corrupt footer fails gracefully (PARQUET-1481)") {
    val e = intercept[Exception] {
      spark.read.parquet(s"$refDir/parquet-files-testing_bad_data_PARQUET-1481.parquet").collect()
    }
    assert(e.getMessage != null)
  }

  test("malformed dictionary fails gracefully, not with a crash") {
    intercept[Throwable] {
      spark.read.parquet(s"$refDir/nation.dict-malformed.parquet").collect()
    }
  }

  test("encrypted file without keys fails") {
    intercept[Throwable] {
      spark.read.parquet(s"$refDir/uniform_encryption.parquet.encrypted").collect()
    }
  }

  test("encrypted corpus files read with published keys") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("parquet.crypto.factory.class", "graft.sources.CorpusCryptoFactory")
    try {
      for (f <- Seq(
        "uniform_encryption.parquet.encrypted",
        "encrypt_columns_and_footer.parquet.encrypted",
        "encrypt_columns_and_footer_ctr.parquet.encrypted",
        "encrypt_columns_and_footer_aad.parquet.encrypted",
        "encrypt_columns_and_footer_disable_aad_storage.parquet.encrypted",
        "encrypt_columns_plaintext_footer.parquet.encrypted")) {
        // explicit schema: the fixtures carry a TIME(MILLIS,utc-adjusted)
        // column Spark's schema converter rejects; requested-schema
        // pruning keeps it out of the scan entirely.
        val df = spark.read.schema("double_field DOUBLE, float_field FLOAT")
          .parquet(s"$refDir/$f")
        assert(df.count() > 0, f)
        val v = df.agg(sum(col("double_field"))).collect()(0).getDouble(0)
        assert(!v.isNaN, f)
      }
    } finally conf.unset("parquet.crypto.factory.class")
  }

  test("encrypted write + read-back round-trip with corpus keys") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = tmpDir("graft-enc") + "/t"
    conf.set("parquet.crypto.factory.class", "graft.sources.CorpusCryptoFactory")
    try {
      val df = Seq((1.5, 2.5f, "x"), (3.5, 4.5f, "y")).toDF("double_field", "float_field", "tag")
      df.write.parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == 2)
      assert(back.agg(sum($"double_field")).collect()(0).getDouble(0) == 5.0)
    } finally conf.unset("parquet.crypto.factory.class")
    // and without the factory, the written file must NOT be readable
    intercept[Throwable] { spark.read.parquet(dir).collect() }
  }
}
