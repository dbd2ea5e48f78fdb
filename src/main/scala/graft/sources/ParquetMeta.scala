package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.jdk.CollectionConverters._

/** Footer/metadata utilities (SURVEY §2A R13–R15, R18–R22 analogs):
  * row counts, row-group stats, writer identification — driver-side
  * footer reads only (a footer is KBs; no data pages are touched), used
  * for planning decisions like the corrupt-date rescue.
  */
object ParquetMeta {

  /** Footer of `path`; a directory (Spark write output) resolves to its
    * first part file. */
  def footer(path: String, conf: Configuration = new Configuration()): ParquetMetadata = {
    val f = new java.io.File(path)
    val target =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .headOption.map(_.getPath)
          .getOrElse(throw new IllegalArgumentException(s"no parquet files in $path"))
      else path
    val in = HadoopInputFile.fromPath(new Path(target), conf)
    val r = ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  /** R15: row count from footer only. */
  def rowCount(path: String): Long =
    footer(path).getBlocks.asScala.map(_.getRowCount).sum

  /** R13 analog: per-row-group (rows, totalByteSize, starting offset). */
  def rowGroupStats(path: String): Seq[(Long, Long, Long)] =
    footer(path).getBlocks.asScala.toSeq.map(b =>
      (b.getRowCount, b.getTotalByteSize, b.getStartingPos))

  def createdBy(path: String): Option[String] =
    Option(footer(path).getFileMetaData.getCreatedBy)

  def keyValueMeta(path: String): Map[String, String] =
    footer(path).getFileMetaData.getKeyValueMetaData.asScala.toMap

  /** R21 analog: row-group indexes whose start offset falls in
    * [splitStart, splitStart+len) — Hive/Drill split semantics. */
  def rowGroupsForSplit(path: String, splitStart: Long, splitLen: Long): Seq[Int] =
    footer(path).getBlocks.asScala.toSeq.zipWithIndex.collect {
      case (b, i) if b.getStartingPos >= splitStart &&
        b.getStartingPos < splitStart + splitLen => i
    }
}
