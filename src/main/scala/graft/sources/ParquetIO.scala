package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StructType}

import scala.jdk.CollectionConverters._

/** Parquet read/write façade (SURVEY §2A R1, R8–R11, §2B S1–S6) plus the
  * corrupt-date rescue read option (R18–R20, DRILL-4203 semantics).
  *
  * Thin by design: Spark's vectorized reader + Catalyst pushdown already
  * dominate the reference's row-at-a-time scan; this object only fixes
  * the policy surface (modes, compression, schema, mergeSchema) and adds
  * the one read-time normalization Spark lacks.
  */
object ParquetIO {

  def read(
      spark: SparkSession,
      paths: Seq[String],
      schema: Option[StructType] = None,
      mergeSchema: Boolean = false): DataFrame = {
    var r = spark.read
    schema.foreach(st => r = r.schema(st))
    if (mergeSchema) r = r.option("mergeSchema", "true")
    r.parquet(paths: _*)
  }

  /** R8/R10 semantics: default errorifexists + snappy. */
  def write(
      df: DataFrame,
      path: String,
      mode: String = "errorifexists",
      compression: String = "snappy",
      partitionCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode(mode).option("compression", compression)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.parquet(path)
  }

  /** Bucketed table write: pre-shuffles once at write time so every
    * future equi-join/aggregation on `keys` is exchange-free (the
    * co-located-join strategy for repeatedly-joined 100 TB fact tables;
    * bucket counts should match across tables joined together). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("compression", "snappy")
      .saveAsTable(table)

  /** Drill's corrupt-date shift: 2 × 2440588 days
    * (ParquetReaderUtility.java:39). */
  val CorrectCorruptDateShiftDays: Int = 2 * 2440588

  /** Dates written by bad Drill versions land ~year 12000+; the probe
    * threshold is ~year 5000 in days-since-epoch
    * (ParquetReaderUtility.java:46-47). */
  val CorruptThresholdDays: Int = 1106685

  /** R18–R20: read with `corruptDateRebase` ∈ auto|on|off.
    *  - on:   unconditionally shift all DATE columns back
    *  - off:  plain read
    *  - auto: footer sniff — created_by mentioning drill, or
    *    `is.date.correct`/`parquet-writer.version` absent while DATE
    *    column stats exceed the year-5000 threshold ⇒ shift.
    * The fix itself is a conditional `date_sub` projection — scan-speed,
    * no shuffle. Every part footer is sniffed in auto mode; a directory
    * mixing corrupt and sane writers is rejected loudly. */
  def readCorruptDateAware(
      spark: SparkSession,
      path: String,
      corruptDateRebase: String = "auto"): DataFrame = {
    val df = spark.read.parquet(path)
    val dateCols = df.schema.fields.filter(_.dataType == DateType).map(_.name)
    if (dateCols.isEmpty || corruptDateRebase == "off") return df

    val needsFix = corruptDateRebase match {
      case "on" => true
      case "auto" =>
        // sniff EVERY part footer: applying one file's verdict to a
        // mixed-provenance directory would silently shift correct dates
        // by ~13k years (or leave corrupt ones unfixed). Uniform verdict
        // → apply; mixed → refuse loudly.
        val verdicts = ParquetMeta.footers(path).map { ft =>
          val created = Option(ft.getFileMetaData.getCreatedBy).getOrElse("").toLowerCase
          val kv = ft.getFileMetaData.getKeyValueMetaData.asScala
          val declaredCorrect = kv.get("is.date.correct").contains("true") ||
            kv.contains("parquet-writer.version")
          val drillish = created.contains("drill")
          if (declaredCorrect) false
          else if (!drillish && created.nonEmpty && !created.contains("parquet-mr")) false
          else statsProbeCorrupt(ft, dateCols.toSet)
        }
        if (verdicts.distinct.size > 1)
          throw new IllegalStateException(
            s"$path mixes corrupt-date and sane-date files; split the read " +
              "or pass corruptDateRebase=on/off per file group")
        verdicts.head
      case other =>
        throw new IllegalArgumentException(s"corruptDateRebase=$other")
    }
    if (!needsFix) df
    else dateCols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_sub(col(s"`$c`"), CorrectCorruptDateShiftDays)))
  }

  /** R19: min/max stats of DATE columns beyond the year-5000 threshold. */
  private def statsProbeCorrupt(
      ft: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      dateCols: Set[String]): Boolean = {
    val blocks = ft.getBlocks.asScala
    if (blocks.isEmpty) return false
    blocks.head.getColumns.asScala.exists { cc =>
      dateCols.contains(cc.getPath.toDotString) && {
        val st = cc.getStatistics
        st != null && st.hasNonNullValue && (st.genericGetMax match {
          case i: java.lang.Integer => i > CorruptThresholdDays
          case _ => false
        })
      }
    }
  }
}
