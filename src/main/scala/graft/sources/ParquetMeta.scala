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

  /** The parquet part files under `path` (itself, if a plain file) — via
    * the Hadoop FileSystem API so URI-style and remote paths (file:/,
    * hdfs://, s3a://) resolve like local ones. Recurses into
    * subdirectories (skipping _temporary/_SUCCESS/hidden entries) so
    * partitioned layouts (`p=.../part-*.parquet`) resolve too. */
  def partFiles(path: String, conf: Configuration = new Configuration()): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(d: Path): Seq[Path] = fs.listStatus(d).toSeq
      .filterNot(st => hidden(st.getPath.getName))
      .flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    if (fs.getFileStatus(p).isDirectory) {
      val parts = walk(p).sortBy(_.toString)
      if (parts.isEmpty) throw new IllegalArgumentException(s"no parquet files in $path")
      parts
    } else Seq(p)
  }

  private def footerOf(p: Path, conf: Configuration): ParquetMetadata = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try r.getFooter finally r.close()
  }

  /** Footer of `path`; a directory (Spark write output) resolves to its
    * first part file. Use [[footers]] when per-file provenance matters. */
  def footer(path: String, conf: Configuration = new Configuration()): ParquetMetadata =
    footerOf(partFiles(path, conf).head, conf)

  /** All part-file footers of a file-or-directory path. */
  def footers(path: String, conf: Configuration = new Configuration()): Seq[ParquetMetadata] =
    partFiles(path, conf).map(footerOf(_, conf))

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

  /** Columns that carry a bloom filter in any row group (reference
    * corpus artifact `bloom_filter.bin`: a footer-referenced SBBF). */
  def bloomFilterColumns(path: String, conf: Configuration = new Configuration()): Seq[String] =
    footer(path, conf).getBlocks.asScala
      .flatMap(_.getColumns.asScala)
      .filter(_.getBloomFilterOffset >= 0)
      .map(_.getPath.toDotString)
      .distinct.toSeq

  /** (part-file path, row-group index) pairs whose bloom filter for
    * `column` might contain `value` — the skip primitive a reader uses
    * on equality predicates: a pair absent from the result is PROVABLY
    * value-free and its pages are never fetched. Walks EVERY part file
    * of a directory. A row group is kept (must-read) when it has no
    * filter, the filter can't be decoded, or the probe value can't be
    * coerced to the column's parquet PHYSICAL type — the filter hashed
    * physical encodings at write time, so probing with the wrong width
    * (e.g. a Long against an INT32 column) would silently miss every
    * file; coercion, not runtime-class dispatch, keeps that sound. */
  def bloomCandidateRowGroups(path: String, column: String, value: Any,
      conf: Configuration = new Configuration()): Seq[(String, Int)] =
    partFiles(path, conf).flatMap { file =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        r.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap { case (block, i) =>
          val keep = block.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case Some(cc) if cc.getBloomFilterOffset >= 0 =>
              // readBloomFilter returns null when the filter can't be
              // decoded (IO error, encrypted column) → must read
              Option(r.getBloomFilterDataReader(block).readBloomFilter(cc)) match {
                case Some(bloom) =>
                  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
                  val hash: Option[Long] = cc.getPrimitiveType.getPrimitiveTypeName match {
                    case INT64 => value match {
                      case l: Long => Some(bloom.hash(l))
                      case iv: Int => Some(bloom.hash(iv.toLong))
                      case _ => None
                    }
                    case INT32 => value match {
                      case iv: Int => Some(bloom.hash(iv))
                      case l: Long if l.isValidInt => Some(bloom.hash(l.toInt))
                      case _ => None
                    }
                    case DOUBLE => value match {
                      case d: Double => Some(bloom.hash(d))
                      case f: Float => Some(bloom.hash(f.toDouble))
                      case _ => None
                    }
                    case FLOAT => value match {
                      case f: Float => Some(bloom.hash(f))
                      case _ => None
                    }
                    case BINARY => value match {
                      case s: String =>
                        Some(bloom.hash(org.apache.parquet.io.api.Binary.fromString(s)))
                      case b: Array[Byte] =>
                        Some(bloom.hash(org.apache.parquet.io.api.Binary.fromConstantByteArray(b)))
                      case _ => None
                    }
                    case _ => None
                  }
                  hash.forall(bloom.findHash)
                case None => true
              }
            case _ => true // no filter → must read
          }
          if (keep) Some(file.toString -> i) else None
        }
      } finally r.close()
    }
}
